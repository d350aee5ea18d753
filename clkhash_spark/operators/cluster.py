"""Transitive clustering: connected components over matched pairs.

Alternating min-id label propagation (required by the north rule): every
vertex repeatedly adopts the smallest label among itself and its
neighbours until a fixpoint. Duplicate clusters from blocking are
near-cliques, so convergence is typically 2-3 rounds; each round is one
shuffle join + one aggregation.

Scale notes:
- Labels are int64 (hash of the key) — iterative joins on long keys are
  far cheaper than on URLs; the mapping back to keys is one final join.
- ``localCheckpoint`` every round truncates lineage (else the plan doubles
  per iteration and the driver OOMs planning round ~15). On a real
  cluster use reliable ``checkpoint``/table write-back instead — flag
  ``reliable=True``.
- Convergence is detected with a single ``agg(max(changed))`` — one tiny
  job per round, no collect of data rows.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "attach_cluster_ids"]


def connected_components(
    pairs: DataFrame,
    key_a: str = "key_a",
    key_b: str = "key_b",
    max_iterations: int = 50,
    reliable: bool = False,
) -> DataFrame:
    """Cluster pairs into components; returns ``(key, cluster_id)``.

    ``cluster_id`` is the minimum int64 vertex-hash in the component —
    deterministic for a given input (assuming no xxhash64 collision between
    keys, which at sandbox scale is negligible and at 10^12 scale should be
    replaced by a dense-id assignment join; see ``assign_dense_ids``).
    """
    # Vertex ids: int64 hashes of the keys (numeric keys pass through —
    # callers that already work in the hashed-id domain skip a re-hash).
    key_type = dict(pairs.dtypes)[key_a]
    if key_type in ("bigint", "int", "long"):
        vertex = lambda c: F.col(c).cast("long")  # noqa: E731
    else:
        vertex = lambda c: F.xxhash64(F.col(c))  # noqa: E731
    edges = (
        pairs.select(
            vertex(key_a).alias("src"),
            vertex(key_b).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    key_ids = (
        pairs.select(F.col(key_a).alias("key"))
        .union(pairs.select(F.col(key_b).alias("key")))
        .distinct()
        .select("key", vertex("key").alias("id"))
    )

    # Symmetrize once; labels start as the vertex id itself.
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    sym = _persist(sym, reliable)
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
    )
    labels = _persist(labels, reliable)

    for _ in range(max_iterations):
        # Each vertex adopts min(own label, neighbours' labels).
        incoming = (
            sym.join(labels, on=sym.src == labels.id, how="inner")
            .select(F.col("dst").alias("id"), F.col("label"))
        )
        new_labels = (
            labels.unionByName(incoming)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
        )
        new_labels = _persist(new_labels, reliable)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="id")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break

    return (
        key_ids.join(labels, on="id", how="inner")
        .select("key", F.col("label").alias("cluster_id"))
    )


def _persist(df: DataFrame, reliable: bool) -> DataFrame:
    """Truncate lineage between iterations."""
    if reliable:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def attach_cluster_ids(
    records: DataFrame,
    clusters: DataFrame,
    key_col: str = "url",
) -> DataFrame:
    """Left-join cluster ids back onto records; singletons get their own
    id (their key hash), so the output is a total clustering."""
    joined = records.join(
        clusters.withColumnRenamed("key", key_col), on=key_col, how="left"
    )
    return joined.withColumn(
        "cluster_id",
        F.coalesce(F.col("cluster_id"), F.xxhash64(F.col(key_col))),
    )
