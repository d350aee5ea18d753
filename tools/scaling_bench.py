"""Scaling-efficiency evidence: the same job at two parallelism levels.

The north rule's two-cluster-size criterion can't use a real cluster in
this sandbox, so (per the driver instruction) we run the identical
workload on the same input at local[N] and local[4N] and report
throughput at both plus scaling efficiency:

    efficiency = (throughput_4N / throughput_N) / 4

Each level runs in a fresh subprocess (a JVM can't change its master);
the workload is the CLK encode stage (the dominant compute) plus the full
linkage pipeline on the deterministic fixture.

Usage: python tools/scaling_bench.py [rows] [small_cores] [factor]
Writes/updates BENCH-SCALING.md and prints a JSON summary.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from clkhash_spark.session import build_session
from clkhash_spark.sources.webpages import synthetic_webpages
from clkhash_spark.operators.encode import encode_clks
from clkhash_spark.pipeline import (LinkageConfig, run_linkage,
                                    tuned_blocking, webpages_schema)

cores = %(cores)d
rows = %(rows)d
spark = build_session(app_name=f"scaling-{cores}", cores=cores)
spark.sparkContext.setLogLevel("ERROR")

pages = synthetic_webpages(spark, rows, seed=42).select("url", "text")
pages = pages.repartition(4 * cores).persist()
pages.count()  # materialize input outside the timed region

clks = encode_clks(pages, webpages_schema(), "scaling-secret",
                   key_cols=("url",))
# Warm-up pass: spin up + import-load every Python worker once, so the
# timed region measures steady-state throughput (what a long job sees),
# not per-worker cold start.
clks.write.format("noop").mode("overwrite").save()

t0 = time.time()
clks.write.format("noop").mode("overwrite").save()
encode_s = time.time() - t0

tuned = tuned_blocking(rows, target_candidates_per_row=5.0)
t0 = time.time()
result = run_linkage(spark, pages,
                     LinkageConfig(schema=webpages_schema(),
                                   secret="scaling-secret",
                                   num_bands=tuned["num_bands"],
                                   bits_per_band=tuned["bits_per_band"],
                                   min_band_matches=tuned["min_band_matches"]))
result.clusters.write.format("noop").mode("overwrite").save()
pipeline_s = time.time() - t0

stage_seconds = {k: v for k, v in result.metrics.items()
                 if k.endswith("_seconds")}
print(json.dumps({
    "cores": cores, "rows": rows,
    "encode_seconds": round(encode_s, 2),
    "encode_rows_per_sec": round(rows / encode_s, 1),
    "pipeline_seconds": round(pipeline_s, 2),
    "pipeline_rows_per_sec": round(rows / pipeline_s, 1),
    "stage_seconds": stage_seconds,
}))
spark.stop()
"""


def run_level(cores: int, rows: int) -> dict:
    script = WORKER % {"repo": REPO, "cores": cores, "rows": rows}
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=1800,
    )
    if out.returncode != 0:
        raise RuntimeError(f"level {cores} failed:\n{out.stderr[-3000:]}")
    last = out.stdout.strip().splitlines()[-1]
    return json.loads(last)


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    small = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    big = small * factor

    low = run_level(small, rows)
    high = run_level(big, rows)

    def eff(metric: str) -> float:
        return round(
            (high[metric] / low[metric]) / factor, 3
        )

    summary = {
        "rows": rows,
        "levels": [low, high],
        "encode_scaling_efficiency": eff("encode_rows_per_sec"),
        "pipeline_scaling_efficiency": eff("pipeline_rows_per_sec"),
    }
    print(json.dumps(summary))

    lines = [
        "# BENCH-SCALING — throughput at two parallelism levels",
        "",
        f"Same job, same input ({rows:,} synthetic web pages), "
        f"local[{small}] vs local[{big}] "
        "(sandbox stand-in for N vs 4N executors).",
        "",
        "| stage | local[{s}] rows/s | local[{b}] rows/s | speedup | "
        "efficiency |".format(s=small, b=big),
        "|---|---|---|---|---|",
        "| CLK encode | {:.0f} | {:.0f} | {:.2f}x | {:.3f} |".format(
            low["encode_rows_per_sec"], high["encode_rows_per_sec"],
            high["encode_rows_per_sec"] / low["encode_rows_per_sec"],
            summary["encode_scaling_efficiency"],
        ),
        "| full pipeline | {:.0f} | {:.0f} | {:.2f}x | {:.3f} |".format(
            low["pipeline_rows_per_sec"], high["pipeline_rows_per_sec"],
            high["pipeline_rows_per_sec"] / low["pipeline_rows_per_sec"],
            summary["pipeline_scaling_efficiency"],
        ),
        "",
        "Efficiency = (throughput_4N / throughput_N) / 4. Target ≥ 0.8 "
        "(BASELINE.json north rule).",
        "",
        f"Raw: `{json.dumps(summary)}`",
        "",
    ]
    with open(os.path.join(REPO, "BENCH-SCALING.md"), "w") as fp:
        fp.write("\n".join(lines))


if __name__ == "__main__":
    main()
