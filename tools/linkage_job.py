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
                        help="synthetic web pages to link")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--secret", default="scaling-secret")
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
                                        tuned_blocking, webpages_schema)
    from clkhash_spark.sources.webpages import synthetic_webpages

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

    tuned = tuned_blocking(args.rows, target_candidates_per_row=5.0)
    t0 = time.time()
    result = run_linkage(
        spark, pages,
        LinkageConfig(schema=webpages_schema(), secret=args.secret,
                      num_bands=tuned["num_bands"],
                      bits_per_band=tuned["bits_per_band"],
                      min_band_matches=tuned["min_band_matches"]))
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
    }
    line = json.dumps(summary)
    print(line)
    if args.json_out:
        with open(args.json_out, "w") as fp:
            fp.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
