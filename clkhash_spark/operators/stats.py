"""Popcount statistics and run observability (reference:
clkhash/stats.py:5-63, clkhash/describe.py:6-21, clkhash/clk.py:166-189).

The reference maintains a hand-rolled numerically-stable online
mean/variance and a per-chunk tqdm callback; on Spark both collapse into
built-in aggregates and ``DataFrame.observe`` (zero extra passes: the
metrics ride the action that materializes the stage).
"""

from __future__ import annotations

from typing import Dict, Tuple

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

__all__ = ["popcount_stats", "popcount_histogram", "observed_encode"]


def popcount_stats(
    clks: DataFrame, popcount_col: str = "popcount"
) -> Dict[str, float]:
    """Mean/std/min/max of CLK popcounts (the `describe` aggregate)."""
    row = clks.agg(
        F.count("*").alias("n"),
        F.avg(popcount_col).alias("mean"),
        F.stddev_samp(popcount_col).alias("std"),
        F.min(popcount_col).alias("min"),
        F.max(popcount_col).alias("max"),
    ).first()
    return {
        "n": row["n"],
        "mean": float(row["mean"]) if row["mean"] is not None else 0.0,
        "std": float(row["std"]) if row["std"] is not None else 0.0,
        "min": row["min"],
        "max": row["max"],
    }


def popcount_histogram(
    clks: DataFrame, bucket: int = 32, popcount_col: str = "popcount"
) -> DataFrame:
    """Histogram of popcounts in ``bucket``-wide bins (describe's chart)."""
    return (
        clks.groupBy(
            (F.floor(F.col(popcount_col) / bucket) * bucket)
            .cast("int")
            .alias("bucket")
        )
        .agg(F.count("*").alias("n"))
        .orderBy("bucket")
    )


def observed_encode(
    clks: DataFrame, popcount_col: str = "popcount"
) -> Tuple[DataFrame, Observation]:
    """Attach an Observation to an encode output: whichever action first
    materializes the returned DataFrame also yields row count + popcount
    mean/std with no extra job (the Spark version of the reference's
    per-chunk progress callback)."""
    observation = Observation("clk_stats")
    observed = clks.observe(
        observation,
        F.count(F.lit(1)).alias("rows"),
        F.avg(popcount_col).alias("popcount_mean"),
        F.stddev_samp(popcount_col).alias("popcount_std"),
    )
    return observed, observation
