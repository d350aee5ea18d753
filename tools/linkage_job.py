"""spark-submit entry point for the end-to-end CLK linkage job.

This is the cluster-faithful way to run the pipeline (BASELINE.json
north rule: "run via spark-submit --py-files ... at N and 4N
executors"):

    spark-submit --master local[8] \
        --py-files dist/clkhash_spark.zip \
        --conf spark.sql.shuffle.partitions=16 \
        tools/linkage_job.py --rows 600000

Nothing here touches sys.path: ``clkhash_spark`` must come from the
``--py-files`` archive (built by ``tools/scaling_bench.py`` or
``python -m zipfile -c dist/clkhash_spark.zip clkhash_spark``), exactly
as it would on a real multi-executor cluster. All tuning confs are
passed on the submit line; the job itself only calls
``SparkSession.builder.getOrCreate()``.

The job generates the deterministic synthetic web-page fixture
(url/warc_ts/html/text/lang — the BASELINE.json input shape), times the
CLK encode stage and the full encode→block→score→cluster linkage
pipeline, and prints one JSON line with throughput and per-stage
seconds.
"""

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--rows", type=int, default=100_000,
                        help="synthetic web pages to link (two-party "
                             "mode: total rows across both parties)")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--secret", default="scaling-secret")
    parser.add_argument("--two-party", action="store_true",
                        help="run the cross-party linkage pipeline over "
                             "two overlapping synthetic parties instead "
                             "of single-table dedup")
    # Default matches LinkageConfig (20/row). Round 3 ran the scaling
    # bench at 5/row for a lighter pair join, but the deeper r the
    # tighter budget forces (28 vs 24 bits at 600k) costs marginal-tail
    # recall: measured F1 0.9878 at 5/row vs 0.9950 at 20/row (b=64,
    # 600k). Quality gates the throughput numbers, so the bench now
    # runs the same budget the library defaults to.
    parser.add_argument("--target-candidates", type=float, default=20.0,
                        help="scored-candidate budget per row for the "
                             "banding law (join volume bounded at 3x)")
    parser.add_argument("--num-bands", type=int, default=None,
                        help="pin the band count (default: the law "
                             "searches the volume-minimal count)")
    parser.add_argument("--quality", action="store_true",
                        help="also compute pairwise P/R/F1 vs the "
                             "fixture ground truth (outside the timed "
                             "region)")
    parser.add_argument("--json-out", default=None,
                        help="also write the JSON summary to this path")
    args = parser.parse_args()

    spark = SparkSession.builder.appName("clk-linkage-job").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    # Imported after getOrCreate and resolved from --py-files, as on a
    # real cluster.
    from clkhash_spark.operators.encode import encode_clks
    from clkhash_spark.pipeline import (LinkageConfig, run_linkage,
                                        webpages_schema)
    from clkhash_spark.sources.webpages import synthetic_webpages

    if args.two_party:
        run_two_party(spark, args, cores)
        return

    pages = synthetic_webpages(spark, args.rows, seed=args.seed)
    pages = pages.select("url", "text").repartition(4 * cores).persist()
    pages.count()  # materialize input outside the timed region

    clks = encode_clks(pages, webpages_schema(), args.secret,
                       key_cols=("url",))
    # Warm-up pass: spin up + import-load every Python worker once so the
    # timed region measures steady-state throughput (what a long job
    # sees), not per-worker cold start.
    clks.write.format("noop").mode("overwrite").save()

    t0 = time.time()
    clks.write.format("noop").mode("overwrite").save()
    encode_s = time.time() - t0

    # Auto banding: run_linkage resolves the geometry from the
    # materialized row count AND the measured unrelated-bit agreement
    # (the calibrated law; the textbook 0.57 prior under-sized r by 5
    # bits at 600k rows → 10x the budgeted join volume).
    t0 = time.time()
    result = run_linkage(
        spark, pages,
        LinkageConfig(schema=webpages_schema(), secret=args.secret,
                      num_bands=args.num_bands,
                      target_candidates_per_row=args.target_candidates))
    result.clusters.write.format("noop").mode("overwrite").save()
    pipeline_s = time.time() - t0

    summary = {
        "cores": cores,
        "rows": args.rows,
        "encode_seconds": round(encode_s, 2),
        "encode_rows_per_sec": round(args.rows / encode_s, 1),
        "pipeline_seconds": round(pipeline_s, 2),
        "pipeline_rows_per_sec": round(args.rows / pipeline_s, 1),
        "stage_seconds": {k: v for k, v in result.metrics.items()
                          if k.endswith("_seconds")},
        "banding": result.metrics.get("banding"),
    }

    if args.quality:
        # P/R/F1 vs the fixture's entity ground truth — outside the
        # timed region (the A/B evidence that band-geometry changes
        # leave quality unchanged).
        from clkhash_spark.operators.evaluate import (cluster_pairs,
                                                      pairwise_metrics,
                                                      truth_pairs)
        from clkhash_spark.sources.webpages import webpages_truth

        truth = webpages_truth(
            synthetic_webpages(spark, args.rows, seed=args.seed)
        )
        m = pairwise_metrics(
            cluster_pairs(result.clusters, key_col="url"),
            truth_pairs(truth),
        )
        summary["quality"] = {k: round(v, 6) if isinstance(v, float) else v
                              for k, v in m.items()}

    # Per-stage shuffle counters: _StageRunner tags every job with a
    # "clk:<stage>" group; with the event log enabled we can attribute
    # shuffle bytes/records to pipeline stages after the app stops (the
    # log is finalized by stop()).
    event_dir = None
    app_id = spark.sparkContext.applicationId
    try:
        if spark.conf.get("spark.eventLog.enabled", "false") == "true":
            event_dir = spark.conf.get("spark.eventLog.dir")
    except Exception:
        event_dir = None
    spark.stop()
    if event_dir:
        summary["shuffle_by_stage"] = parse_shuffle_metrics(
            event_dir, app_id
        )
        summary["occupancy_by_stage"] = parse_stage_occupancy(
            event_dir, app_id, cores
        )

    line = json.dumps(summary)
    print(line)
    if args.json_out:
        with open(args.json_out, "w") as fp:
            fp.write(line + "\n")


def run_two_party(spark, args, cores: int) -> None:
    """Two-party cross-linkage over overlapping synthetic parties: the
    headline workload of a linkage engine at scale (the single-table
    path deduplicates; this one matches A against B under one secret).

    ``--rows`` is the TOTAL encoded rows: rows/2 entities per party,
    50% overlap (rows/4 true cross-party matches, each a near-duplicate
    variant pair — never byte-identical)."""
    import time as _time

    from pyspark.sql import functions as F

    from clkhash_spark.pipeline import (LinkageConfig,
                                        run_linkage_two_party,
                                        webpages_schema)
    from clkhash_spark.sources.webpages import synthetic_webpage_parties

    entities = args.rows // 2
    party_a, party_b, truth = synthetic_webpage_parties(
        spark, entities, overlap=0.5, seed=args.seed
    )
    party_a = party_a.repartition(2 * cores).persist()
    party_b = party_b.repartition(2 * cores).persist()
    # Entity ground truth rides outside the timed pipeline input.
    ent_a = party_a.select(F.col("key").alias("key_a"),
                           F.col("entity_id").alias("_ent_a")).persist()
    ent_b = party_b.select(F.col("key").alias("key_b"),
                           F.col("entity_id").alias("_ent_b")).persist()
    for df in (party_a, party_b, ent_a, ent_b):
        df.count()  # materialize input outside the timed region

    # Warm every Python worker before timing (same discipline as the
    # single-table job: first pandas-UDF pass costs ~15 s across
    # workers).
    def _touch(batches):
        import numpy  # noqa: F401

        for batch in batches:
            yield batch

    spark.range(0, 4 * cores, 1, 4 * cores).mapInPandas(
        _touch, "id long"
    ).write.format("noop").mode("overwrite").save()

    config = LinkageConfig(
        schema=webpages_schema(), secret=args.secret, key_col="key",
        target_candidates_per_row=args.target_candidates,
    )
    t0 = _time.time()
    result = run_linkage_two_party(
        spark,
        party_a.select("key", "text"),
        party_b.select("key", "text"),
        config,
    )
    result.pairs.persist()
    n_matched = result.pairs.count()
    pipeline_s = _time.time() - t0

    correct = (
        result.pairs.join(ent_a, on="key_a").join(ent_b, on="key_b")
        .where(F.col("_ent_a") == F.col("_ent_b"))
        .count()
    )
    summary = {
        "mode": "two_party",
        "cores": cores,
        "rows": args.rows,
        "rows_per_party": entities,
        "truth_matches": truth,
        "matched_pairs": n_matched,
        "precision": round(correct / n_matched, 6) if n_matched else None,
        "recall": round(correct / truth, 6) if truth else None,
        "pipeline_seconds": round(pipeline_s, 2),
        "pipeline_rows_per_sec": round(args.rows / pipeline_s, 1),
        "stage_seconds": {k: v for k, v in result.metrics.items()
                          if k.endswith("_seconds")},
        "banding": result.metrics.get("banding"),
    }

    event_dir = None
    app_id = spark.sparkContext.applicationId
    try:
        if spark.conf.get("spark.eventLog.enabled", "false") == "true":
            event_dir = spark.conf.get("spark.eventLog.dir")
    except Exception:
        event_dir = None
    spark.stop()
    if event_dir:
        summary["shuffle_by_stage"] = parse_shuffle_metrics(
            event_dir, app_id
        )
        summary["occupancy_by_stage"] = parse_stage_occupancy(
            event_dir, app_id, cores
        )

    line = json.dumps(summary)
    print(line)
    if args.json_out:
        with open(args.json_out, "w") as fp:
            fp.write(line + "\n")


def parse_stage_occupancy(event_dir: str, app_id: str, cores: int) -> dict:
    """Scheduler occupancy per job group from the event log:
    ``sum(task finish - task launch) / (group wall span x cores)``.

    Low occupancy means cores sat idle inside the stage's wall window —
    fixed driver rounds, AQE barriers, Python-worker waves — while high
    occupancy with a sub-linear speedup means the cores were busy but
    each task ran slower (a shared-substrate ceiling: DRAM bandwidth /
    SMT contention). This is the discriminator the round-4 scaling
    debate needed: the two explanations predict opposite occupancy
    signatures at the bigger core count.
    """
    import os

    path = event_dir
    for prefix in ("file://", "file:"):
        if path.startswith(prefix):
            path = path[len(prefix):]
            break
    log_path = os.path.join(path, app_id)
    if not os.path.exists(log_path):
        if os.path.exists(log_path + ".inprogress"):
            log_path += ".inprogress"
        else:
            return {}

    stage_group: dict = {}
    spans: dict = {}
    with open(log_path) as fp:
        for raw in fp:
            try:
                event = json.loads(raw)
            except json.JSONDecodeError:
                continue
            kind = event.get("Event")
            if kind == "SparkListenerJobStart":
                group = (event.get("Properties") or {}).get(
                    "spark.jobGroup.id"
                )
                for info in event.get("Stage Infos", []):
                    stage_group.setdefault(info["Stage ID"], group)
            elif kind == "SparkListenerTaskEnd":
                info = event.get("Task Info") or {}
                group = stage_group.get(event.get("Stage ID"))
                if group is None:
                    continue
                launch = info.get("Launch Time")
                finish = info.get("Finish Time")
                if not launch or not finish:
                    continue
                entry = spans.setdefault(
                    group,
                    {"task_ms": 0, "first_launch": launch,
                     "last_finish": finish},
                )
                entry["task_ms"] += finish - launch
                entry["first_launch"] = min(entry["first_launch"], launch)
                entry["last_finish"] = max(entry["last_finish"], finish)

    out = {}
    for group, entry in spans.items():
        wall_s = (entry["last_finish"] - entry["first_launch"]) / 1000.0
        task_s = entry["task_ms"] / 1000.0
        out[group] = {
            "task_seconds": round(task_s, 2),
            "wall_seconds": round(wall_s, 2),
            "occupancy": round(task_s / (wall_s * cores), 3)
            if wall_s > 0 else None,
        }
    return out


def parse_shuffle_metrics(event_dir: str, app_id: str) -> dict:
    """Aggregate shuffle read/write bytes+records per job group from the
    Spark event log (pure JSON-lines scan; no UI/REST dependency)."""
    import os

    path = event_dir
    for prefix in ("file://", "file:"):
        if path.startswith(prefix):
            path = path[len(prefix):]
            break
    log_path = os.path.join(path, app_id)
    if not os.path.exists(log_path):
        if os.path.exists(log_path + ".inprogress"):
            log_path += ".inprogress"
        else:
            return {}

    stage_group: dict = {}
    agg: dict = {}
    with open(log_path) as fp:
        for raw in fp:
            try:
                event = json.loads(raw)
            except json.JSONDecodeError:
                continue
            kind = event.get("Event")
            if kind == "SparkListenerJobStart":
                group = (event.get("Properties") or {}).get(
                    "spark.jobGroup.id"
                )
                for info in event.get("Stage Infos", []):
                    stage_group.setdefault(info["Stage ID"], group)
            elif kind == "SparkListenerTaskEnd":
                metrics = event.get("Task Metrics")
                if not metrics:
                    continue
                group = stage_group.get(event.get("Stage ID"))
                if group is None:
                    continue
                entry = agg.setdefault(group, {
                    "write_bytes": 0, "write_records": 0,
                    "read_bytes": 0, "read_records": 0,
                })
                sw = metrics.get("Shuffle Write Metrics") or {}
                sr = metrics.get("Shuffle Read Metrics") or {}
                entry["write_bytes"] += sw.get("Shuffle Bytes Written", 0)
                entry["write_records"] += sw.get(
                    "Shuffle Records Written", 0
                )
                entry["read_bytes"] += (
                    sr.get("Local Bytes Read", 0)
                    + sr.get("Remote Bytes Read", 0)
                )
                entry["read_records"] += sr.get("Total Records Read", 0)
    return agg


if __name__ == "__main__":
    main()
