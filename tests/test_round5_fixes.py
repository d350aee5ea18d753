"""Round-5 fixes: IVF auto-sizer sample scaling (no silent clamp) and
the two-level coarse quantizer growth path.

Round-4 VERDICT "What's wrong #1": kmeans_centroids(num_centroids=None)
targeted n/8 cells but silently clamped to the 20k sample for n > 160k,
making the fit a no-op exactly where the docstring's scale story
applied. The fix scales the sample with the target and warns (never
silently) when an explicit request exceeds the sample; past the 65,536
flat-cell cap the new two-level quantizer keeps ~8 vectors/cell with
O(c1 + branch) assignment cost.
"""

import os
import warnings

import numpy as np
import pandas as pd
import pytest

from clkhash_spark.operators import similarity as S

SF = os.environ.get("SPARK_GRAFT_SMOKE_SF", "/root/testdata/sf0.001")

pytestmark = [
    pytest.mark.spark,
    pytest.mark.skipif(
        not os.path.isdir(SF), reason="driver testdata not available"
    ),
]


def _clustered_corpus(spark, n, dim=8, n_centers=2000, noise=0.05,
                      parts=8):
    """Deterministic clustered corpus: unit-norm centers + hash jitter.

    No RNG state crosses the boundary — each row's vector is a pure
    function of its id, so the corpus is identical on any partitioning.
    """
    centers = np.random.default_rng(7).standard_normal((n_centers, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            base = centers[ids % n_centers]
            d_idx = np.arange(dim)
            jit = (
                ((ids[:, None] * 2654435761 + d_idx[None, :] * 40503)
                 % (2 ** 31)) / 2 ** 31 - 0.5
            ) * noise
            vecs = (base + jit).astype(np.float32)
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": list(vecs)}
            )

    return spark.range(0, n, 1, parts).mapInPandas(
        gen, "vec_id long, embedding array<float>"
    )


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(os.path.join(SF, "embeddings.parquet")).cache()
    df.count()
    return df


class TestKmeansAutoSample:
    """The auto-sizer must deliver ~n/8 REAL cells past the old 160k
    saturation point (n/8 > 20_000), with the sample scaled to match."""

    def test_auto_size_past_old_sample_cap(self, spark):
        n = 168_000  # n/8 = 21_000 > the 20k default sample
        corpus = _clustered_corpus(spark, n).persist()
        corpus.count()
        try:
            with warnings.catch_warnings():
                # silent-clamp regression guard (clamp warns RuntimeWarning)
                warnings.simplefilter("error", RuntimeWarning)
                cents = S.kmeans_centroids(
                    corpus, num_centroids=None, iters=2
                )
            assert cents.shape == (21_000, 8)
            # the fit must be a real Lloyd refinement, not
            # "every sample point is its own centroid": with 2000 true
            # centers and 21k cells, cells concentrate near centers —
            # every centroid is unit-norm and distinct from raw points.
            norms = np.linalg.norm(cents, axis=1)
            assert np.allclose(norms, 1.0)

            # recall floor at a tiny scan fraction: probing 20 of 21k
            # cells (~0.1% of the corpus) on clustered data.
            queries = corpus.where("vec_id % 21000 = 0").selectExpr(
                "vec_id as query_id", "embedding"
            )
            exact = {
                (r["query_id"], r["vec_id"])
                for r in S.brute_force_topk(
                    corpus, queries, k=10
                ).collect()
            }
            got = {
                (r["query_id"], r["vec_id"])
                for r in S.ivf_topk(
                    corpus, queries, cents, k=10, nprobe=20
                ).collect()
            }
            assert len(got & exact) / len(exact) >= 0.5
        finally:
            corpus.unpersist()

    def test_explicit_overask_warns_not_silent(self, emb):
        with pytest.warns(RuntimeWarning, match="clamping"):
            cents = S.kmeans_centroids(
                emb, num_centroids=5000, sample_size=100
            )
        assert cents.shape[0] == 100  # clamped, but loudly

    def test_vectorized_lloyd_matches_small_fit(self, emb):
        # determinism across calls (the old loop-based fit's contract).
        a = S.kmeans_centroids(emb, num_centroids=8)
        b = S.kmeans_centroids(emb, num_centroids=8)
        assert np.array_equal(a, b)


class TestTwoLevelQuantizer:
    @pytest.fixture(scope="class")
    def quantizer(self, emb):
        return S.two_level_centroids(emb, num_cells=64, branch=16)

    def test_fit_shape_and_determinism(self, emb, quantizer):
        q = quantizer
        assert q.coarse.shape[0] == 4  # ceil(64/16)
        assert 4 <= q.num_cells <= 64  # adaptive: scales with cell mass
        again = S.two_level_centroids(emb, num_cells=64, branch=16)
        assert np.array_equal(q.coarse, again.coarse)
        assert np.array_equal(q.fine, again.fine)
        assert np.array_equal(q.valid, again.valid)

    def test_probe1_equals_assign(self, emb, quantizer):
        mat = np.array(
            [r["embedding"] for r in emb.limit(50).collect()],
            dtype=np.float64,
        )
        assigned = quantizer.assign_np(mat)
        probed = quantizer.probe_np(mat, 1)
        assert all(
            len(p) == 1 and p[0] == a for p, a in zip(probed, assigned)
        )

    def test_assignment_total_and_valid_cells_only(self, emb, quantizer):
        assigned = S.ivf_assign_two_level(emb, quantizer)
        n = emb.count()
        assert assigned.count() == n
        cells = {r["centroid_id"]
                 for r in assigned.select("centroid_id").distinct()
                 .collect()}
        valid_ids = {
            int(c1 * quantizer.branch + c2)
            for c1, c2 in zip(*np.nonzero(quantizer.valid))
        }
        assert cells <= valid_ids

    def test_full_probe_matches_brute_force(self, emb, quantizer):
        queries = emb.where("vec_id < 5").selectExpr(
            "vec_id as query_id", "embedding"
        )
        exact = {
            (r["query_id"], r["rank"]): r["vec_id"]
            for r in S.brute_force_topk(emb, queries, k=10).collect()
        }
        approx = {
            (r["query_id"], r["rank"]): r["vec_id"]
            for r in S.ivf_topk_two_level(
                emb, queries, quantizer, k=10,
                nprobe=quantizer.num_cells,
            ).collect()
        }
        assert approx == exact

    def test_partial_probe_recall_on_clustered_data(self, spark):
        corpus = _clustered_corpus(
            spark, 20_000, n_centers=200
        ).persist()
        corpus.count()
        try:
            q = S.two_level_centroids(corpus, num_cells=512, branch=32)
            assert q.num_cells > 64  # a real multi-cell fit
            queries = corpus.where("vec_id % 2000 = 0").selectExpr(
                "vec_id as query_id", "embedding"
            )
            exact = {
                (r["query_id"], r["vec_id"])
                for r in S.brute_force_topk(
                    corpus, queries, k=10
                ).collect()
            }
            got = {
                (r["query_id"], r["vec_id"])
                for r in S.ivf_topk_two_level(
                    corpus, queries, q, k=10, nprobe=16
                ).collect()
            }
            assert len(got & exact) / len(exact) >= 0.5
        finally:
            corpus.unpersist()

    def test_sample_cap_warns(self, emb):
        with pytest.warns(RuntimeWarning, match="max_sample"):
            S.two_level_centroids(
                emb, num_cells=10_000, branch=64, max_sample=400,
            )


class TestIvfTopkFixed:
    """The oracle-checkable IVF probe path (emb_ivf_topk query)."""

    def test_full_probe_matches_brute_force(self, spark, emb):
        queries = emb.where("vec_id < 5").selectExpr(
            "vec_id as query_id", "embedding"
        )
        exact = {
            (r["query_id"], r["rank"]): r["vec_id"]
            for r in S.brute_force_topk(emb, queries, k=10).collect()
        }
        approx = {
            (r["query_id"], r["rank"]): r["vec_id"]
            for r in S.ivf_topk_fixed(
                emb, queries, k=10, num_centroids=8, nprobe=8
            ).collect()
        }
        assert approx == exact  # probing every cell == exhaustive scan

    def test_probe_first_cell_is_assignment_cell(self, spark, emb):
        # nprobe=1's probed cell must equal the cell the corpus
        # assignment would give the same vector (same argmax rule).
        probes = {
            r["vec_id"]: r["cell"]
            for r in S.ivf_probe_fixed(emb, nprobe=1).collect()
        }
        cells = {
            r["vec_id"]: r["cell"]
            for r in S.ivf_cell_fixed(emb).collect()
        }
        assert probes == cells


class TestIvfTopkAuto:
    """One-call dispatch: flat k-means below the cell cap, two-level
    above it — same ranking semantics either way."""

    def test_flat_path_matches_explicit(self, spark, emb):
        queries = emb.where("vec_id < 3").selectExpr(
            "vec_id as query_id", "embedding"
        )
        auto = S.ivf_topk_auto(
            emb, queries, k=5, num_cells=8, nprobe=8
        ).collect()
        cents = S.kmeans_centroids(emb, num_centroids=8)
        explicit = S.ivf_topk(
            emb, queries, cents, k=5, nprobe=8
        ).collect()
        key = lambda rows: {
            (r["query_id"], r["rank"]): r["vec_id"] for r in rows
        }
        assert key(auto) == key(explicit)

    def test_full_probe_flat_equals_brute_force(self, spark, emb):
        queries = emb.where("vec_id < 3").selectExpr(
            "vec_id as query_id", "embedding"
        )
        exact = {
            (r["query_id"], r["rank"]): r["vec_id"]
            for r in S.brute_force_topk(emb, queries, k=5).collect()
        }
        approx = {
            (r["query_id"], r["rank"]): r["vec_id"]
            for r in S.ivf_topk_auto(
                emb, queries, k=5, num_cells=8, nprobe=8
            ).collect()
        }
        assert approx == exact

    def test_dispatches_two_level_past_cap(self, spark, emb):
        # force the two-level branch with a tiny artificial cap; the
        # result must still be a valid top-k frame over real cells
        queries = emb.where("vec_id < 3").selectExpr(
            "vec_id as query_id", "embedding"
        )
        out = S.ivf_topk_auto(
            emb, queries, k=5, num_cells=16, nprobe=16,
            flat_cell_cap=8,
        )
        rows = out.collect()
        assert rows and {r["query_id"] for r in rows} <= {0, 1, 2}
        per_q = {}
        for r in rows:
            per_q.setdefault(r["query_id"], []).append(r["rank"])
        for ranks in per_q.values():
            assert sorted(ranks) == list(range(1, len(ranks) + 1))


class TestNearDupExact:
    """Integer-exact cosine threshold (oracle twin of the float path)."""

    def test_matches_numpy_reference(self, spark, emb):
        import itertools

        rows = {
            r["vec_id"]: np.floor(
                np.asarray(r["embedding"], dtype=np.float64) * 1e6 + 0.5
            ).astype(np.int64)
            for r in emb.collect()
        }
        planes = np.array(
            S.rademacher_planes(6, 64, 42), dtype=np.int64
        ).T
        weights = np.int64(1) << np.arange(6, dtype=np.int64)
        buckets = {
            k: int(((v @ planes >= 0).astype(np.int64) @ weights))
            for k, v in rows.items()
        }
        expected = set()
        by_bucket = {}
        for k, b in buckets.items():
            by_bucket.setdefault(b, []).append(k)
        for members in by_bucket.values():
            for a, b in itertools.combinations(sorted(members), 2):
                dot = int(rows[a] @ rows[b])
                na = int(rows[a] @ rows[a])
                nb = int(rows[b] @ rows[b])
                if dot > 0 and 10_000 * dot * dot >= 400 * na * nb:
                    expected.add((a, b))
        got = {
            (r["vec_a"], r["vec_b"])
            for r in S.embedding_near_duplicates_exact(emb).collect()
        }
        assert got == expected and len(expected) > 0


class TestFixedTwoLevelQuantizer:
    """The sha-derived fixed two-level quantizer that backs the
    `emb_ivf_two_level_cells` oracle: integer-exact dots through the
    real assign_np path."""

    def test_assign_matches_brute_force(self, emb):
        q = S.fixed_two_level_quantizer(4, 4, dim=64, seed=43)
        rows = emb.limit(200).collect()
        raw = np.array([r["embedding"] for r in rows], dtype=np.float64)
        qmat = np.floor(raw * 1_000_000 + 0.5)
        got = q.assign_np(qmat)
        # independent reference: flat argmax over coarse then fine
        l1 = np.argmax(qmat @ q.coarse.T, axis=1)
        want = np.empty(len(qmat), dtype=np.int64)
        for i in range(len(qmat)):
            sub = q.fine[l1[i]] @ qmat[i]
            want[i] = l1[i] * q.branch + np.argmax(sub)
        assert np.array_equal(got, want)

    def test_dots_are_exact_integers(self, emb):
        q = S.fixed_two_level_quantizer(4, 4, dim=64, seed=43)
        rows = emb.limit(50).collect()
        raw = np.array([r["embedding"] for r in rows], dtype=np.float64)
        qmat = np.floor(raw * 1_000_000 + 0.5)
        dots = qmat @ q.coarse.T
        assert np.all(dots == np.round(dots))
        assert np.abs(dots).max() < 2.0**53

    def test_determinism_and_shape(self):
        a = S.fixed_two_level_quantizer(4, 4, dim=64, seed=43)
        b = S.fixed_two_level_quantizer(4, 4, dim=64, seed=43)
        assert np.array_equal(a.coarse, b.coarse)
        assert np.array_equal(a.fine, b.fine)
        assert a.valid.all() and a.num_cells == 16
        c = S.fixed_two_level_quantizer(4, 4, dim=64, seed=44)
        assert not np.array_equal(a.coarse, c.coarse)


class TestIvfFitAuto:
    """ivf_fit_auto: the build-once index API (fit separated from the
    query path so the fixed driver-side Lloyd cost is amortizable and
    benchmarkable apart from query throughput)."""

    def test_prefit_index_matches_one_call(self, spark, emb):
        from pyspark.sql import functions as F

        queries = emb.where(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        idx = S.ivf_fit_auto(emb, num_cells=8)
        assert idx.kind == "flat" and idx.num_cells == 8
        got = sorted(
            (r["query_id"], r["vec_id"], r["rank"])
            for r in S.ivf_topk_auto(
                emb, queries, k=5, nprobe=8, index=idx
            ).collect()
        )
        want = sorted(
            (r["query_id"], r["vec_id"], r["rank"])
            for r in S.ivf_topk(
                emb, queries, idx.centroids, k=5, nprobe=8
            ).collect()
        )
        assert got == want and len(got) > 0

    def test_fit_dispatches_two_level_past_cap(self, emb):
        idx = S.ivf_fit_auto(emb, num_cells=40, flat_cell_cap=16)
        assert idx.kind == "two_level"
        assert idx.num_cells > 0
        assert idx.quantizer is not None
