"""Dump .explain("formatted") plans of the bench queries to
plans/r06/<query>_<tag>.txt (tag = before/after) — the optimization
round's plan evidence.

For the two pipeline queries the interesting DataFrames are the pairs
and clusters stage outputs; both are dumped. The pipeline is run at a
reduced row count (plan shape is row-count independent; banding
resolution needs materialized CLKs, so a run is required).

Usage: python tools/dump_r06_plans.py <tag> [query ...]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(REPO, "plans", "r06")


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    os.makedirs(OUT_DIR, exist_ok=True)

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
    )

    spark = build_session(app_name="dump-r06-plans", cores=8)
    spark.sparkContext.setLogLevel("ERROR")

    def dump(name: str, df) -> None:
        if only and name not in only:
            return
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fp:
            fp.write(plan_of(df))
        print("wrote", path)

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    pages = docs.select(F.col("doc_id").cast("string").alias("url"), "text")
    dump(
        "clk_encode",
        encode_clks(pages, webpages_schema(), "bench-secret",
                    key_cols=("url",)),
    )

    dump("doc_exact_dedup", q_doc_exact_dedup(spark, SF_DIR))
    dump("doc_minhash_pairs", q_doc_minhash_pairs(spark, SF_DIR))
    dump("doc_dedup_groups", q_doc_dedup_groups(spark, SF_DIR))
    dump("doc_quality_scores", q_doc_quality_scores(spark, SF_DIR))
    dump("emb_topk", q_emb_topk(spark, SF_DIR))
    dump("local_supplier_revenue", q_local_supplier_revenue(spark, SF_DIR))

    if not only or {
        "clk_pipeline_pairs", "clk_pipeline_clusters",
        "clk_pipeline_pairs_stage",
    } & only:
        fixture = synthetic_webpages(spark, 20000, seed=42).persist()
        fixture.count()
        config = LinkageConfig(schema=webpages_schema(),
                               secret="bench-secret")
        result = run_linkage(spark, fixture.select("url", "text"), config)
        dump("clk_pipeline_pairs", result.pairs)
        dump("clk_pipeline_clusters", result.clusters)
        # The committed pairs/clusters outputs are materialized stage
        # snapshots (LogicalRDD scans after the round-6 lineage
        # truncation), so ALSO dump the pairs-stage INTERNAL plan —
        # rebuilt over the materialized blocks/clks exactly as
        # build_pairs composes it — to evidence the single-exchange
        # self-join shape over the checkpointed banded rows.
        from clkhash_spark.operators.scoring import (
            candidate_pairs,
            score_candidates,
        )

        clks_k = result.clks.withColumn(
            "_kid", F.xxhash64(F.col("url"))
        )
        stage = score_candidates(
            candidate_pairs(
                result.blocks, key_col="_kid", repartition=None,
                min_band_matches=config.min_band_matches,
            ),
            clks_k, threshold=config.threshold, key_col="_kid",
        )
        dump("clk_pipeline_pairs_stage", stage)

    if not only or {"clk_two_party_pairs", "clk_two_party_clusters"} & only:
        pa, pb, _ = synthetic_webpage_parties(
            spark, 10000, overlap=0.5, seed=42
        )
        pa = pa.select("key", "text").persist()
        pb = pb.select("key", "text").persist()
        pa.count(), pb.count()
        tp_config = LinkageConfig(
            schema=webpages_schema(), secret="bench-secret", key_col="key",
        )
        result = run_linkage_two_party(spark, pa, pb, tp_config)
        dump("clk_two_party_pairs", result.pairs)
        dump("clk_two_party_clusters", result.clusters)

    spark.stop()


if __name__ == "__main__":
    main()
