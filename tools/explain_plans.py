"""Dump formatted physical plans of the key operators to PLANS.md —
evidence that column pruning, filter pushdown, broadcast joins, and AQE
land where intended. Run after operator changes; review the diff.

Usage: python tools/explain_plans.py [sf_dir]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    from pyspark.sql import functions as F

    from clkhash_spark.entry_queries import (
        q_doc_minhash_pairs,
        q_emb_ivf_cells,
        q_emb_topk,
        q_local_supplier_revenue,
        q_orders_by_segment,
    )
    from clkhash_spark.operators.blocking import block_keys
    from clkhash_spark.operators.encode import encode_clks
    from clkhash_spark.operators.scoring import (
        candidate_pairs,
        score_candidates,
    )
    from clkhash_spark.pipeline import webpages_schema
    from clkhash_spark.session import build_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = build_session(app_name="explain", cores=4, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    sections = []

    # 1. encode over a wide table — the heavy `html` binary column must be
    # pruned from the scan (ReadSchema shows only url+text).
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    wide = docs.select(
        F.col("doc_id").cast("string").alias("url"),
        "text",
        F.encode(F.col("text"), "utf-8").alias("html"),  # stand-in heavy col
        "lang",
    )
    clks = encode_clks(wide, webpages_schema(), "s", key_cols=("url",))
    sections.append(("encode_clks (column pruning: html/lang dropped "
                     "before Python)", plan_of(clks)))

    # 2. blocking + candidate pairs — skinny shuffle on block_key.
    clks_p = clks.persist()
    clks_p.count()
    blocks = block_keys(clks_p, l=1024, num_bands=8, bits_per_band=22,
                        key_cols=("url",))
    pairs = candidate_pairs(blocks, key_col="url")
    sections.append(("candidate_pairs (self-join on block_key, distinct "
                     "before payload attach)", plan_of(pairs)))

    # 3. pair scoring — CLK payload joins should be broadcast (small side)
    scored = score_candidates(pairs, clks_p, threshold=0.75, key_col="url")
    sections.append(("score_candidates (broadcast of CLK payload when "
                     "small; Arrow-batched dice UDF)", plan_of(scored)))

    # 4. relational: orders x customer — explicit broadcast hint.
    sections.append(
        ("orders_by_segment (broadcast hash join)",
         plan_of(q_orders_by_segment(spark, sf_dir)))
    )

    # 5. minhash pairs + topk over parquet — pushdown / pruning visible.
    sections.append(
        ("doc_minhash_pairs", plan_of(q_doc_minhash_pairs(spark, sf_dir)))
    )
    sections.append(("emb_topk (broadcast queries, window top-k)",
                     plan_of(q_emb_topk(spark, sf_dir))))

    # 6. Q5-shape 6-table join — date filter pushed to the orders scan,
    # every true dimension broadcast, lineitem columns pruned.
    sections.append(
        ("local_supplier_revenue (TPC-H Q5 shape: pushdown + broadcasts)",
         plan_of(q_local_supplier_revenue(spark, sf_dir)))
    )

    # 7. IVF cell occupancy — whole-stage-codegen integer dots, one agg.
    sections.append(
        ("emb_ivf_cells (fixed-quantizer assignment, JVM-side)",
         plan_of(q_emb_ivf_cells(spark, sf_dir)))
    )

    # 8. multi-table LSH top-k — one ArrowEvalPython computes every
    # table's signature; candidates dedup as skinny ids BEFORE the
    # embedding payload joins back on.
    from clkhash_spark.operators.similarity import lsh_topk

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    sections.append(
        ("lsh_topk num_tables=4 (Arrow signature matmul, skinny "
         "candidate dedup, payload joined after distinct)",
         plan_of(lsh_topk(emb, queries, k=10, num_planes=6,
                          num_tables=4)))
    )

    # 9. two-party pairs in the int64 kid domain: party in the kid sign
    # bit, banding + skew cap over the union, cross-party join selects
    # by sign — the shuffle moves (long, long) rows only.
    from clkhash_spark.operators.blocking import cap_block_size
    from clkhash_spark.sources.webpages import synthetic_webpages

    def party(seed: int, is_b: bool) -> "DataFrame":
        pages = synthetic_webpages(spark, 200, seed=seed).select(
            "url", "text"
        )
        clk = encode_clks(pages, webpages_schema(), "s", key_cols=("url",))
        kid = F.shiftrightunsigned(F.xxhash64(F.col("url")), 1)
        if is_b:
            kid = kid.bitwiseOR(F.lit(-(1 << 63)))
        return clk.withColumn("_kid", kid)

    bands_a = block_keys(party(1, False), l=1024, num_bands=8,
                         bits_per_band=22, key_cols=("_kid",))
    bands_b = block_keys(party(2, True), l=1024, num_bands=8,
                         bits_per_band=22, key_cols=("_kid",))
    capped, _ = cap_block_size(
        bands_a.unionByName(bands_b), 2000, key_cols=("_kid",)
    )
    two_party_pairs = candidate_pairs(
        capped.where(F.col("_kid") >= 0),
        other=capped.where(F.col("_kid") < 0),
        key_col="_kid", min_band_matches=2,
    )
    sections.append(
        ("two-party candidate_pairs (kid domain, sign-bit party split, "
         "capped union)", plan_of(two_party_pairs))
    )

    # 10. IVF probe top-k — cell assignment is a pure projection (no
    # join back to the source), probes explode to skinny (cell, query)
    # rows broadcast into the cell join, integer-dot window ranking.
    from clkhash_spark.operators.similarity import ivf_topk_fixed

    sections.append(
        ("ivf_topk_fixed (projection-only cell assign, broadcast "
         "probes, co-cell scoring)",
         plan_of(ivf_topk_fixed(emb, queries, k=10, num_centroids=8,
                                nprobe=2)))
    )

    # 10b. two-level IVF top-k — same plan shape as the flat path but
    # assignment is one Arrow UDF projection against the broadcast
    # quantizer closure (O(c1 + branch) dots/vector, the >65k-cell
    # growth path); probes still explode to skinny broadcast rows.
    from clkhash_spark.operators.similarity import (
        fixed_two_level_quantizer,
        ivf_topk_two_level,
    )

    sections.append(
        ("ivf_topk_two_level (Arrow assign projection, broadcast "
         "probe explode, co-cell scoring)",
         plan_of(ivf_topk_two_level(
             emb, queries, fixed_two_level_quantizer(4, 4, dim=64,
                                                     seed=43),
             k=10, nprobe=2)))
    )

    # 11. integer-exact near-dup — norms computed once per vector
    # BEFORE the bucket self-join; the threshold test is decimal(38)
    # arithmetic, no float comparison anywhere.
    from clkhash_spark.operators.similarity import (
        embedding_near_duplicates_exact,
    )

    sections.append(
        ("embedding_near_duplicates_exact (per-vector norms before "
         "the bucket self-join, decimal(38) threshold)",
         plan_of(embedding_near_duplicates_exact(emb)))
    )

    # 12. repetition scores — explode shuffles one row per DISTINCT
    # (doc, word) thanks to map-side partial aggregation; the bigram
    # ratio never leaves the row (array_distinct is O(tokens)).
    from clkhash_spark.operators.text import repetition_scores

    sections.append(
        ("repetition_scores (explode -> two-level partial agg; "
         "per-row bigram ratio)",
         plan_of(repetition_scores(docs)))
    )

    lines = [
        "# PLANS — formatted physical plans of the key operators",
        "",
        "Generated by `python tools/explain_plans.py`. Things to check:",
        "`ReadSchema` (column pruning), `PushedFilters`, "
        "`BroadcastHashJoin` vs `SortMergeJoin`, `Exchange` placement, "
        "WholeStageCodegen spans, `ArrowEvalPython`/`MapInPandas` "
        "boundaries.",
        "",
    ]
    for title, plan in sections:
        lines += [f"## {title}", "", "```", plan.strip(), "```", ""]
    with open(os.path.join(REPO, "PLANS.md"), "w") as fp:
        fp.write("\n".join(lines))
    print(f"wrote PLANS.md ({len(sections)} plans)")


if __name__ == "__main__":
    main()
