"""Similarity search over embedding columns (``array<float>``).

Two paths:

- **Brute-force top-k** (the correctness baseline): broadcast the (small)
  query set, JVM-side dot products via ``zip_with`` + ``aggregate``,
  window top-k. For exact cross-engine checkability the ranking score is
  an *integer* dot product over quantized components (float summation
  order never matters).
- **LSH-bucketed** (the scale path): random-hyperplane sign signatures
  (seeded, hash-derived — no RNG state), banded into bucket keys; only
  vectors sharing a bucket are compared. At 100 TB the bucket join
  replaces the O(N·Q) scan with per-bucket locality.

Also: embedding-cosine near-duplicate detection for dedup.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "quantized_dot",
    "cosine",
    "brute_force_topk",
    "hyperplane_signatures",
    "lsh_topk",
    "embedding_near_duplicates",
]

_QUANT = 1_000_000  # 1e6: float32 components quantize losslessly enough


def _quantize(vec: Column) -> Column:
    """array<float> → array<bigint> of floor(x * 1e6 + 0.5).

    floor(x+0.5) rather than round(): identical semantics in every engine
    (a SQL oracle mirrors it verbatim), and integer arithmetic from here
    on is order-independent and bit-exact.
    """
    return F.transform(
        vec,
        lambda x: F.floor(x.cast("double") * _QUANT + F.lit(0.5)).cast(
            "long"
        ),
    )


def quantized_dot(a: Column, b: Column) -> Column:
    """Integer dot product of quantized vectors — order-independent,
    bit-exact in every engine (the oracle-checkable ranking score)."""
    return F.aggregate(
        F.zip_with(_quantize(a), _quantize(b), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    """True cosine similarity (double) — for consumers, not for oracles."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda v: F.sqrt(  # noqa: E731
        F.aggregate(
            v,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    return dot / (norm(a) * norm(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    query_key_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by quantized dot product; queries are broadcast.

    Returns (query_id, vec_id, dot_q, rank). Self-matches (same id) are
    excluded. Ties break on vec_id for determinism.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_key_col), F.col(vec_col).alias("_qvec")
        )
    )
    scored = vectors.crossJoin(q).where(
        F.col(key_col) != F.col(query_key_col)
    )
    scored = scored.select(
        query_key_col,
        key_col,
        quantized_dot(F.col("_qvec"), F.col(vec_col)).alias("dot_q"),
    )
    w = Window.partitionBy(query_key_col).orderBy(
        F.desc("dot_q"), F.asc(key_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def rademacher_planes(num_planes: int, dim: int, seed: int = 42):
    """Driver-computed ±1 hyperplanes, a pure function of the seed.

    Derived from sha256 so any engine (or a SQL oracle) can reproduce
    them; shipped into the plan as literals (tiny: planes x dim ints).
    """
    import hashlib

    planes = []
    for p in range(num_planes):
        row = []
        for d in range(dim):
            digest = hashlib.sha256(
                f"clkhash-spark-plane:{seed}:{p}:{d}".encode()
            ).digest()
            row.append(1 if digest[0] % 2 else -1)
        planes.append(row)
    return planes


def hyperplane_signatures(
    vectors: DataFrame,
    num_planes: int = 16,
    seed: int = 42,
    dim: int = 64,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bucket id from sign signature under seeded ±1 hyperplanes.

    The sign is taken on an *integer* dot product of quantized components,
    so bucket assignment is bit-exact across engines. Vectors with equal
    signatures lie in the same angular bucket.
    """
    planes = rademacher_planes(num_planes, dim, seed)
    qvec = _quantize(F.col(vec_col))
    bucket = None
    for p, row in enumerate(planes):
        plane = F.array(*[F.lit(c).cast("long") for c in row])
        dot = F.aggregate(
            F.zip_with(qvec, plane, lambda x, c: x * c),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bit = (dot >= 0).cast("long")
        term = F.shiftleft(bit, p)
        bucket = term if bucket is None else bucket + term
    return vectors.select(
        F.col(key_col), F.col(vec_col), bucket.alias("bucket")
    )


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_planes: int = 12,
    seed: int = 42,
    dim: int = 64,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    query_key_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: compare only vectors in the query's bucket.

    Scale path: the vectors table is bucketed once (reusable across query
    batches); each query probes one bucket — a broadcastable join at
    realistic query volumes. Recall depends on num_planes vs data;
    callers trade num_planes down for recall up.
    """
    data_buckets = hyperplane_signatures(
        vectors, num_planes, seed, dim, key_col, vec_col
    )
    query_buckets = hyperplane_signatures(
        queries, num_planes, seed, dim, query_key_col, vec_col
    ).select(
        query_key_col, F.col(vec_col).alias("_qvec"), "bucket"
    )
    joined = data_buckets.join(
        F.broadcast(query_buckets), on="bucket"
    ).where(F.col(key_col) != F.col(query_key_col))
    scored = joined.select(
        query_key_col,
        key_col,
        quantized_dot(F.col("_qvec"), F.col(vec_col)).alias("dot_q"),
    )
    w = Window.partitionBy(query_key_col).orderBy(
        F.desc("dot_q"), F.asc(key_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def embedding_near_duplicates(
    vectors: DataFrame,
    threshold: float = 0.95,
    num_planes: int = 16,
    seed: int = 42,
    dim: int = 64,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate vector pairs: bucket by hyperplane signature, then
    verify candidates with true cosine ≥ threshold."""
    buckets = hyperplane_signatures(
        vectors, num_planes, seed, dim, key_col, vec_col
    )
    left = buckets.select(
        "bucket", F.col(key_col).alias("vec_a"),
        F.col(vec_col).alias("emb_a"),
    )
    right = buckets.select(
        "bucket", F.col(key_col).alias("vec_b"),
        F.col(vec_col).alias("emb_b"),
    )
    pairs = left.join(right, on="bucket").where(
        F.col("vec_a") < F.col("vec_b")
    )
    return (
        pairs.select(
            "vec_a",
            "vec_b",
            F.round(cosine(F.col("emb_a"), F.col("emb_b")), 6).alias(
                "cosine"
            ),
        )
        .where(F.col("cosine") >= threshold)
        .distinct()
    )
