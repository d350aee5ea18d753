"""Round-4 regression tests: VERDICT/ADVICE items from round 3.

- Agreement estimator: empty-input guard, degenerate-corpus warning +
  graceful p25 value (not silent clamp behavior).
- Hybrid CC: Arrow-collected vectorized driver path parity, strict
  ``small_graph_edges=0`` contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clkhash_spark.sources.webpages import synthetic_webpages

pytestmark = pytest.mark.spark


class TestAgreementEstimatorTail:
    def test_empty_input_returns_prior(self, spark):
        """Zero rows must hit the guard, not np.frombuffer(b'')."""
        from clkhash_spark.pipeline import estimate_bit_agreement

        empty = spark.createDataFrame([], "url string, clk binary")
        assert estimate_bit_agreement(empty) == 0.57

    def test_tiny_input_returns_prior(self, spark):
        from clkhash_spark.pipeline import estimate_bit_agreement

        tiny = spark.createDataFrame(
            [(f"u{i}", bytes(128)) for i in range(10)],
            "url string, clk binary",
        )
        assert estimate_bit_agreement(tiny) == 0.57

    def test_majority_duplicated_corpus_warns_and_degrades(self, spark):
        """A corpus that is >50% one duplicate cluster swamps the
        median; the estimator must WARN and return the 25th-percentile
        (unrelated-tail) agreement instead of silently pinning at the
        0.90 clamp."""
        from clkhash_spark.operators.encode import encode_clks
        from clkhash_spark.pipeline import (
            estimate_bit_agreement,
            webpages_schema,
        )

        pages = synthetic_webpages(spark, 400, seed=7).select("url", "text")
        boiler = spark.range(1600).select(
            F.concat(F.lit("https://b-"), F.col("id")).alias("url"),
            F.lit(" ".join(["menu nav footer copyright terms"] * 10)
                  ).alias("text"),
        )
        clks = encode_clks(
            pages.unionByName(boiler), webpages_schema(), "s",
            key_cols=("url",),
        )
        with pytest.warns(RuntimeWarning, match="duplicate regime"):
            a = estimate_bit_agreement(clks)
        # ~80% duplicates: ~64% of random pairs are dup-dup, so the
        # median is ~1.0 — but the 25th percentile must still find the
        # unrelated tail (~36% of pairs involve a real page).
        assert a < 0.95, a


class TestSyntheticParties:
    def test_shapes_overlap_and_near_duplication(self, spark):
        from clkhash_spark.sources.webpages import synthetic_webpage_parties

        pa, pb, shared = synthetic_webpage_parties(
            spark, 200, overlap=0.5, seed=42
        )
        assert shared == 100
        assert pa.count() == 200 and pb.count() == 200
        # Keys globally distinct across parties (a:/b: prefixes).
        keys_a = {r["key"] for r in pa.select("key").collect()}
        keys_b = {r["key"] for r in pb.select("key").collect()}
        assert not keys_a & keys_b
        ents_a = {r["entity_id"] for r in pa.select("entity_id").collect()}
        ents_b = {r["entity_id"] for r in pb.select("entity_id").collect()}
        assert len(ents_a & ents_b) == shared
        # Overlapping entities are near-duplicate VARIANTS — different
        # texts in (almost) every case, so cross-party linkage is real
        # approximate matching, not an exact join. (A variant whose
        # hash-picked perturbation positions all miss is possible at
        # ~(11/12)^n_words per entity, hence the 90% bound, not 100%.)
        joined = pa.select("entity_id", F.col("text").alias("ta")).join(
            pb.select("entity_id", F.col("text").alias("tb")),
            on="entity_id",
        )
        n_same = joined.where(F.col("ta") == F.col("tb")).count()
        assert n_same <= shared // 10, n_same

    def test_two_party_linkage_quality(self, spark):
        from clkhash_spark.pipeline import (
            LinkageConfig,
            run_linkage_two_party,
            webpages_schema,
        )
        from clkhash_spark.sources.webpages import synthetic_webpage_parties

        pa, pb, shared = synthetic_webpage_parties(
            spark, 500, overlap=0.5, seed=11
        )
        result = run_linkage_two_party(
            spark,
            pa.select("key", "text"),
            pb.select("key", "text"),
            LinkageConfig(
                schema=webpages_schema(), secret="s", key_col="key",
            ),
        )
        ent = lambda df, k: df.select(  # noqa: E731
            F.col("key").alias(k), "entity_id"
        )
        matched = result.pairs.join(
            ent(pa, "key_a").withColumnRenamed("entity_id", "ea"),
            on="key_a",
        ).join(
            ent(pb, "key_b").withColumnRenamed("entity_id", "eb"),
            on="key_b",
        )
        n_matched = matched.count()
        n_correct = matched.where(F.col("ea") == F.col("eb")).count()
        assert n_matched and n_correct / n_matched >= 0.99  # precision
        assert n_correct / shared >= 0.98  # recall


class TestIvfRound4:
    def test_nprobe_one_topk(self, spark):
        """nprobe=1 must use the scalar-assign UDF (regression: explode
        of a non-array column failed analysis)."""
        import os

        from clkhash_spark.operators import similarity as S

        sf = os.environ.get("SPARK_GRAFT_SMOKE_SF",
                            "/root/testdata/sf0.001")
        emb = spark.read.parquet(
            os.path.join(sf, "embeddings.parquet")
        ).cache()
        cents = S.kmeans_centroids(emb, num_centroids=8)
        queries = emb.where("vec_id < 3").selectExpr(
            "vec_id as query_id", "embedding"
        )
        out = S.ivf_topk(emb, queries, cents, k=5, nprobe=1)
        assert out.count() > 0

    def test_auto_centroids_quarter_scan_recall_floor(self, spark):
        """The round-4 quality gate: auto-sized cells (n/8) probing a
        quarter of them reach recall@10 >= 0.8 while scanning <= ~1/4
        of the corpus (measured 0.862 at scan 0.252 on sf0.1; fully
        deterministic, see COVERAGE.md for the whole curve)."""
        from pyspark.sql import functions as F2

        from clkhash_spark.operators import similarity as S

        sf = "/root/testdata/sf0.1"
        import os

        if not os.path.isdir(sf):
            pytest.skip("sf0.1 testdata not available")
        emb = spark.read.parquet(
            os.path.join(sf, "embeddings.parquet")
        ).cache()
        n = emb.count()
        cents = S.kmeans_centroids(emb, num_centroids=None)
        assert 16 <= len(cents) <= max(16, n // 8)
        nprobe = max(1, len(cents) // 4)
        queries = emb.where("vec_id < 50").selectExpr(
            "vec_id as query_id", "embedding"
        )
        brute = {
            (r["query_id"], r["vec_id"])
            for r in S.brute_force_topk(emb, queries, k=10).collect()
        }
        approx = {
            (r["query_id"], r["vec_id"])
            for r in S.ivf_topk(
                emb, queries, cents, k=10, nprobe=nprobe
            ).collect()
        }
        recall = len(approx & brute) / len(brute)
        assert recall >= 0.8, recall
        # Scan-fraction bound: probed cell sizes summed per query.
        assigned = S.ivf_assign(emb, cents)
        sizes = {
            r["centroid_id"]: r["c"]
            for r in assigned.groupBy("centroid_id")
            .agg(F2.count("*").alias("c"))
            .collect()
        }
        probe = S._nearest_centroids_udf(cents, nprobe=nprobe)
        per_q: dict = {}
        for r in queries.select(
            "query_id", F2.explode(probe(F2.col("embedding"))).alias("c")
        ).collect():
            per_q[r["query_id"]] = per_q.get(r["query_id"], 0) + sizes.get(
                r["c"], 0
            )
        frac = sum(per_q.values()) / (len(per_q) * n)
        assert frac <= 0.28, frac


class TestHybridCcRound4:
    def test_force_distributed_contract_is_strict(self, spark):
        """``small_graph_edges=0`` must never take the driver path, even
        for graphs at/below any gate — the convergence-guard tests rely
        on the literal contract."""
        from clkhash_spark.operators.cluster import connected_components

        pairs = spark.createDataFrame(
            [("a", "b"), ("b", "c")], ["key_a", "key_b"]
        )
        out = {
            (r["key"], r["cluster_id"])
            for r in connected_components(
                pairs, small_graph_edges=0
            ).collect()
        }
        fast = {
            (r["key"], r["cluster_id"])
            for r in connected_components(pairs).collect()
        }
        assert out == fast and len(out) == 3

    def test_empty_edges_with_zero_gate(self, spark):
        from clkhash_spark.operators.cluster import connected_components

        empty = spark.createDataFrame([], "key_a string, key_b string")
        assert connected_components(empty, small_graph_edges=0).count() == 0

    def test_vectorized_union_find_shapes(self):
        """Pure-numpy check: chain, star, two components, self-dups."""
        import numpy as np

        from clkhash_spark.operators.cluster import _union_find_labels

        # chain 10-11-...-19 plus separate triangle 3-4-5
        u = np.array(list(range(10, 19)) + [3, 4, 5])
        v = np.array(list(range(11, 20)) + [4, 5, 3])
        out = _union_find_labels(u, v)
        lab = dict(zip(out["id"], out["label"]))
        assert all(lab[i] == 10 for i in range(10, 20))
        assert all(lab[i] == 3 for i in (3, 4, 5))

    def test_vectorized_union_find_worst_case_chain_reversed(self):
        """Descending chain (worst hooking order) still labels min."""
        import numpy as np

        from clkhash_spark.operators.cluster import _union_find_labels

        n = 5000
        u = np.arange(n, 0, -1)
        v = np.arange(n - 1, -1, -1)
        out = _union_find_labels(u, v)
        assert (out["label"] == 0).all()

    def test_driver_gate_plumbed_from_config(self, spark, tmp_path):
        """cluster_driver_gate_edges=0 must force the distributed path
        through run_linkage (observable: non-convergence raise with
        max_iterations unreachable is too slow to test here, so assert
        parity of outputs instead)."""
        from clkhash_spark.pipeline import (
            LinkageConfig,
            run_linkage,
            webpages_schema,
        )

        pages = synthetic_webpages(spark, 300, seed=9).select("url", "text")
        base = dict(
            schema=webpages_schema(), secret="s",
            num_bands=32, bits_per_band=14,
        )
        r_driver = run_linkage(spark, pages, LinkageConfig(**base))
        r_dist = run_linkage(
            spark, pages,
            LinkageConfig(**base, cluster_driver_gate_edges=0),
        )
        a = {
            (r["url"], r["cluster_id"])
            for r in r_driver.clusters.collect()
        }
        b = {
            (r["url"], r["cluster_id"]) for r in r_dist.clusters.collect()
        }
        assert a == b and a
