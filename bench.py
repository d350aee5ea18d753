"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line with per-query seconds
plus throughput counters (CLKs/sec, pairs/sec).

Protocol (round 5): best-of-N. The whole suite runs
$SPARK_GRAFT_BENCH_REPEATS times (default 2), each repeat in a FRESH
SparkSession (so persisted intermediates can't leak a warm second
pass), and the recorded per-query time is the min across repeats.
This box shows ~2x run-to-run VM noise within a single window
(documented in BENCH-SCALING.md), so a single-shot number is hostage
to the window; best-of-2 bounds that from above. Throughput counters
are recomputed from the min timings. Result-shaped extras (pair
counts, F1) are deterministic and asserted identical across repeats.

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (32), SPARK_GRAFT_PIPELINE_ROWS (100000),
SPARK_GRAFT_TWO_PARTY_ROWS (100000; rounded down to an even count —
each party gets rows//2), SPARK_GRAFT_BENCH_REPEATS (2).

Run: python bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PIPELINE_ROWS = int(os.environ.get("SPARK_GRAFT_PIPELINE_ROWS", "100000"))
REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))


def force(df) -> int:
    """Materialize a DataFrame fully (noop sink keeps executors busy,
    avoids driver collect)."""
    df.write.format("noop").mode("overwrite").save()
    return -1


def run_suite(repeat: int) -> tuple[dict, dict]:
    """One full pass over the headline queries in a fresh session.

    Returns (timings, extras); the session is stopped before return so
    the next repeat starts cold (no persisted RDDs, no warm caches
    beyond the OS page cache, which a real re-run would share too).
    """
    from pyspark.sql import functions as F

    from clkhash_spark.entry_queries import (
        q_doc_dedup_groups,
        q_doc_exact_dedup,
        q_doc_minhash_pairs,
        q_doc_quality_scores,
        q_emb_topk,
        q_local_supplier_revenue,
    )
    from clkhash_spark.operators.encode import encode_clks
    from clkhash_spark.operators.evaluate import (
        cluster_pairs,
        pairwise_metrics,
        truth_pairs,
    )
    from clkhash_spark.pipeline import (
        LinkageConfig,
        run_linkage,
        run_linkage_two_party,
        webpages_schema,
    )
    from clkhash_spark.session import build_session
    from clkhash_spark.sources.webpages import (
        synthetic_webpage_parties,
        synthetic_webpages,
        webpages_truth,
    )

    spark = build_session(
        app_name=f"clkhash-spark-bench-r{repeat}", cores=CPUS
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Warm every Python worker once (fork + numpy/module imports cost
    # ~15 s across 32 workers the first time a pandas UDF runs) so the
    # timed queries measure steady-state throughput — the same
    # documented warm-up linkage_job.py uses, and what a long-running
    # job sees. Touches all cores: one tiny Arrow batch per partition.
    def _touch(batches):
        import numpy  # noqa: F401 — pay the worker import cost now

        for batch in batches:
            yield batch

    spark.range(0, 4 * CPUS, 1, 4 * CPUS).mapInPandas(
        _touch, "id long"
    ).write.format("noop").mode("overwrite").save()

    timings: dict = {}
    extras: dict = {}

    def timed(name, fn):
        start = time.time()
        out = fn()
        timings[name] = round(time.time() - start, 3)
        return out

    # q1: CLK encode over the documents table (CLKs/sec headline).
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    docs_count = docs.count()
    pages = docs.select(F.col("doc_id").cast("string").alias("url"), "text")
    timed(
        "clk_encode",
        lambda: force(
            encode_clks(pages, webpages_schema(), "bench-secret",
                        key_cols=("url",))
        ),
    )
    extras["encode_rows"] = docs_count

    # q2: full linkage pipeline on the synthetic web-pages fixture.
    fixture = synthetic_webpages(spark, PIPELINE_ROWS, seed=42)
    fixture = fixture.persist()
    fixture.count()
    config = LinkageConfig(schema=webpages_schema(), secret="bench-secret")

    def run_pipeline():
        result = run_linkage(spark, fixture.select("url", "text"), config)
        result.pairs.persist()
        n_pairs = result.pairs.count()
        result.clusters.persist()
        result.clusters.count()
        extras["pipeline_pairs"] = n_pairs
        return result

    result = timed("clk_pipeline", run_pipeline)
    extras["pipeline_rows"] = PIPELINE_ROWS

    # quality check rides along (not timed separately).
    metrics = pairwise_metrics(
        cluster_pairs(result.clusters, key_col="url"),
        truth_pairs(webpages_truth(fixture)),
    )
    extras["pipeline_f1"] = round(metrics["f1"], 6)

    # q3: two-party cross-linkage — the headline workload of a linkage
    # engine (encode A + B under one secret → joint blocks → cross-party
    # pairs → mutual-best 1-1 matching → clusters). 50% entity overlap;
    # every true match is a near-duplicate variant pair.
    two_party_rows = int(
        os.environ.get("SPARK_GRAFT_TWO_PARTY_ROWS", "100000")
    )
    # each party gets rows//2, so the workload actually run is
    # 2*(rows//2) rows — report THAT, not the env request (an odd
    # request would otherwise overstate rows/sec).
    actual_two_party_rows = 2 * (two_party_rows // 2)
    pa, pb, truth = synthetic_webpage_parties(
        spark, two_party_rows // 2, overlap=0.5, seed=42
    )
    pa = pa.select("key", "text").persist()
    pb = pb.select("key", "text").persist()
    pa.count(), pb.count()
    tp_config = LinkageConfig(
        schema=webpages_schema(), secret="bench-secret", key_col="key",
    )

    def run_two_party():
        result = run_linkage_two_party(spark, pa, pb, tp_config)
        result.pairs.persist()
        extras["two_party_matched"] = result.pairs.count()
        return result

    timed("clk_two_party", run_two_party)
    extras["two_party_rows"] = actual_two_party_rows
    extras["two_party_truth"] = truth

    # q4+: dedup / text / similarity operators at sf.
    timed("doc_exact_dedup", lambda: force(q_doc_exact_dedup(spark, SF_DIR)))
    timed(
        "doc_minhash_pairs",
        lambda: force(q_doc_minhash_pairs(spark, SF_DIR)),
    )
    timed(
        "doc_dedup_groups",
        lambda: force(q_doc_dedup_groups(spark, SF_DIR)),
    )
    timed(
        "doc_quality_scores",
        lambda: force(q_doc_quality_scores(spark, SF_DIR)),
    )
    timed("emb_topk", lambda: force(q_emb_topk(spark, SF_DIR)))
    timed(
        "local_supplier_revenue",
        lambda: force(q_local_supplier_revenue(spark, SF_DIR)),
    )

    spark.stop()
    return timings, extras


def main() -> None:
    all_timings: list[dict] = []
    extras: dict = {}
    for repeat in range(max(1, REPEATS)):
        timings, run_extras = run_suite(repeat)
        all_timings.append(timings)
        # result-shaped extras are deterministic; assert they agree
        # across repeats rather than silently keeping one.
        for key in ("pipeline_pairs", "pipeline_f1", "two_party_matched"):
            if key in extras and extras[key] != run_extras.get(key):
                raise AssertionError(
                    f"non-deterministic bench result {key}: "
                    f"{extras[key]} != {run_extras.get(key)}"
                )
        extras.update(run_extras)

    best = {
        name: min(t[name] for t in all_timings) for name in all_timings[0]
    }
    # throughputs from the best-of-N timings.
    extras["clks_per_sec"] = round(
        extras["encode_rows"] / best["clk_encode"], 1
    )
    extras["pipeline_rows_per_sec"] = round(
        extras["pipeline_rows"] / best["clk_pipeline"], 1
    )
    extras["pairs_per_sec"] = round(
        extras["pipeline_pairs"] / best["clk_pipeline"], 1
    )
    extras["two_party_rows_per_sec"] = round(
        extras["two_party_rows"] / best["clk_two_party"], 1
    )

    total = round(sum(best.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_bench_seconds",
                "value": total,
                "unit": "sec",
                "queries": best,
                "sf": SF_DIR,
                "cpus": CPUS,
                "bench_repeats": max(1, REPEATS),
                "per_repeat_totals": [
                    round(sum(t.values()), 3) for t in all_timings
                ],
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
