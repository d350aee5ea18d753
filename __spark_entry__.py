"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CLK linkage pipeline on sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator with
DuckDB oracles where SQL can express the semantics (the CLK/HMAC family
is rows-only by necessity — its correctness gate is the pytest
golden-vector suite, see tests/test_core_golden.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: encode sf0.001 documents into CLKs, block via LSH
    banding, score with Dice, cluster — return per-cluster sizes joined
    with quality metrics of the run."""
    from clkhash_spark.entry_queries import q_clk_linkage_clusters

    return q_clk_linkage_clusters(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from clkhash_spark.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from clkhash_spark.entry_queries import ORACLES

    return dict(ORACLES)
