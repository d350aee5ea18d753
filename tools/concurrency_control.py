"""The controlled experiment that separates PLAN from BOX for the
scaling gate (round-4 VERDICT, next-round #1).

Two mutually-exclusive explanations were on record for the measured
sub-0.8 local[2]->local[8] efficiency:

- round 3: fixed per-stage latency (driver rounds, AQE barriers) that
  amortizes with n — falsified when 4M rows measured 0.555;
- round 4: a shared-DRAM substrate ceiling — plausible (uniform
  2.1-2.3x per-stage speedups) but unproven by shuffle counters, which
  count shuffle bytes, not total memory traffic.

Discriminator: run TWO INDEPENDENT linkage jobs, each spark-submit
local[2], on DISJOINT inputs (different seeds => different synthetic
corpora), first sequentially, then concurrently. The jobs share no
driver, no scheduler, no barrier — the only shared thing is the box.

- If concurrent aggregate throughput ~doubles (ratio -> 2.0), the
  substrate has spare capacity and the in-job inefficiency is the
  plan's (coordination/idle cores) — the substrate claim dies.
- If it stays ~flat (ratio -> 1.0), two coordination-free jobs can't
  use the extra cores either: the ceiling is physical (memory
  bandwidth / SMT contention), the in-job plan is exonerated, and the
  on-box >=0.8 gate is unreachable by ANY plan — the bounded
  conclusion BASELINE.md then states.

Metrics reported per phase: each job's own pipeline_seconds (the
in-job timed region; JVM startup overlaps and is excluded) and the
phase wall. Efficiency := sum(seq pipeline_s) / max(conc pipeline_s)
— in [1, 2]; /2 gives the 2-job independent-scaling efficiency that
is directly comparable to the in-job 2->4-core half of the gate.

Usage: python tools/concurrency_control.py [rows_per_job] [jobs] [cores_per_job]

cores_per_job moves the operating point: 2 jobs x local[2] probes the
substrate at 4 active cores; 2 jobs x local[4] probes it at 8 — the
same total core count as the single-job local[8] gate leg, which is
the comparison that decides plan-vs-box at the gate's operating point.
Appends a '## Round-N analysis'-style section payload to stdout as
JSON; the narrative lands in BENCH-SCALING.md by hand (the numbers
are one-shot controlled measurements, not a regenerable table).

NOTE: quiet box required, same as scaling_bench.py.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from scaling_bench import build_zip, submit_command  # noqa: E402


def job_command(rows: int, seed: int, cores: int = 2) -> list[str]:
    cmd = submit_command(cores, rows)
    return cmd + ["--seed", str(seed)]


def run_phase(rows: int, seeds: list[int], concurrent: bool,
              cores: int = 2) -> dict:
    env = dict(os.environ,
               PYSPARK_PYTHON=sys.executable,
               PYSPARK_DRIVER_PYTHON=sys.executable)
    env.pop("PYTHONPATH", None)
    os.makedirs("/tmp/clk-eventlog", exist_ok=True)

    phase_t0 = time.time()
    results = []
    if concurrent:
        # File-backed output, NOT pipes: Spark writes megabytes of
        # stderr; an undrained 64 KB pipe buffer would block the other
        # job and silently serialize the "concurrent" phase.
        procs = []
        for seed in seeds:
            out_f = open(f"/tmp/conc-job-{seed}.out", "w+")
            err_f = open(f"/tmp/conc-job-{seed}.err", "w+")
            procs.append((
                subprocess.Popen(
                    job_command(rows, seed, cores), cwd="/tmp",
                    stdout=out_f, stderr=err_f, text=True, env=env,
                ),
                out_f, err_f, seed,
            ))
        deadline = time.time() + 10800
        for proc, out_f, err_f, seed in procs:
            proc.wait(timeout=max(60, deadline - time.time()))
            out_f.seek(0)
            stdout = out_f.read()
            out_f.close()
            err_f.seek(0)
            stderr = err_f.read()
            err_f.close()
            if proc.returncode != 0:
                raise RuntimeError(
                    f"concurrent job seed={seed} failed:"
                    f"\n{stderr[-3000:]}"
                )
            results.append(_last_json(stdout))
    else:
        for seed in seeds:
            out = subprocess.run(
                job_command(rows, seed, cores), cwd="/tmp",
                capture_output=True, text=True, timeout=10800, env=env,
            )
            if out.returncode != 0:
                raise RuntimeError(
                    f"sequential job seed={seed} failed:"
                    f"\n{out.stderr[-3000:]}"
                )
            results.append(_last_json(out.stdout))
    wall = time.time() - phase_t0

    return {
        "concurrent": concurrent,
        "phase_wall_seconds": round(wall, 1),
        "jobs": [
            {
                "seed": seed,
                "pipeline_seconds": r["pipeline_seconds"],
                "encode_seconds": r["encode_seconds"],
                "pipeline_rows_per_sec": r["pipeline_rows_per_sec"],
                "stage_seconds": r.get("stage_seconds", {}),
                "occupancy_by_stage": r.get("occupancy_by_stage", {}),
            }
            for seed, r in zip(seeds, results)
        ],
    }


def _last_json(stdout: str) -> dict:
    lines = [ln for ln in stdout.strip().splitlines()
             if ln.startswith("{")]
    return json.loads(lines[-1])


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_jobs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    seeds = [101 + 101 * i for i in range(n_jobs)]

    build_zip()
    seq = run_phase(rows, seeds, concurrent=False, cores=cores)
    conc = run_phase(rows, seeds, concurrent=True, cores=cores)

    seq_sum = sum(j["pipeline_seconds"] for j in seq["jobs"])
    conc_max = max(j["pipeline_seconds"] for j in conc["jobs"])
    ratio = round(seq_sum / conc_max, 3)
    summary = {
        "experiment": "concurrent_independent_jobs_control",
        "rows_per_job": rows,
        "n_jobs": n_jobs,
        "cores_per_job": cores,
        "sequential": seq,
        "concurrent": conc,
        # sum of sequential in-job walls / longest concurrent in-job
        # wall: n_jobs.0 = perfect spare capacity, 1.0 = fully
        # serialized substrate.
        "throughput_ratio_conc_vs_seq": ratio,
        "independent_jobs_scaling_efficiency": round(ratio / n_jobs, 3),
        # per-job slowdown when a twin runs beside it (direct substrate
        # contention signal, per job)
        "per_job_slowdown_concurrent": [
            round(c["pipeline_seconds"] / s["pipeline_seconds"], 3)
            for s, c in zip(seq["jobs"], conc["jobs"])
        ],
    }
    print(json.dumps(summary))
    out_path = os.path.join(REPO, f"concurrency_control_c{cores}.json")
    with open(out_path, "w") as fp:
        json.dump(summary, fp, indent=1)


if __name__ == "__main__":
    main()
