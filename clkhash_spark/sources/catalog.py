"""Production input loader: catalog table (Iceberg) or parquet path.

The deployment target reads the web-pages corpus from an Iceberg table
(``catalog.db.webpages``) — on a configured cluster that is just
``spark.read.table(name)``, and every downstream benefit (partition
pruning, snapshot isolation, schema evolution) comes from the catalog,
not from this code. The sandbox has no Iceberg runtime jar, so the same
entry point also accepts a parquet path; both branches return an
identical, schema-validated DataFrame, and everything downstream is
storage-agnostic.

Column pruning note: callers should select the columns they need
*after* this loader — Catalyst pushes the pruning into the scan in both
branches (parquet ``ReadSchema`` / Iceberg projected read), so the
heavy ``html`` binary column is never materialized by pipelines that
only touch ``text``.
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

__all__ = ["load_table", "validate_columns", "INPUT_COLUMNS"]

# The production input shape: Common-Crawl-style web pages.
INPUT_COLUMNS = ("url", "warc_ts", "html", "text", "lang")


class InputSchemaError(ValueError):
    """The loaded table is missing required input columns."""


def validate_columns(
    df: DataFrame, required: Sequence[str], source: str
) -> DataFrame:
    missing = [c for c in required if c not in df.columns]
    if missing:
        raise InputSchemaError(
            f"input table {source!r} is missing column(s) {missing}; "
            f"found {df.columns}"
        )
    return df


def load_table(
    spark: SparkSession,
    source: str,
    required: Sequence[str] = ("url", "text"),
) -> DataFrame:
    """Load the input corpus from a table name or a parquet path.

    ``source`` resolution:

    - an existing filesystem path (directory or ``*.parquet``) →
      ``spark.read.parquet`` — the sandbox / local-test branch;
    - anything else → ``spark.read.table`` — the production branch; an
      Iceberg identifier (``catalog.db.webpages``) resolves through the
      session catalog, so time travel / branch reads configured via
      table options (``VERSION AS OF`` etc.) work unchanged.

    ``required`` defaults to the two columns the linkage pipeline
    touches; pass :data:`INPUT_COLUMNS` to demand the full production
    shape. Missing columns raise :class:`InputSchemaError` eagerly
    (driver-side, before any job runs).
    """
    if os.path.exists(source):
        df = spark.read.parquet(source)
    else:
        df = spark.read.table(source)
    return validate_columns(df, required, source)
