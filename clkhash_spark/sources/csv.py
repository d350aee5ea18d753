"""CSV ingest for linkage datasets (reference: clkhash/clk.py:119-199 and
clkhash/validate_data.py:79-100).

Spark-native replacements for the reference's CSV path:
- header handling modes ``True`` (validate against schema field
  identifiers, in order), ``'ignore'`` (skip row), ``False`` (no header);
- all columns read as strings (the reference's data model);
- row-arity validation is free (DataFrames are fixed-arity — a short row
  becomes nulls, flagged by the optional validity check).

No whole-file pre-count is needed for progress (the reference reads the
file twice, clkhash/clk.py:158); Spark's scan statistics cover it.
"""

from __future__ import annotations

from typing import List, Union

# Module-top import: pandas_udf type-hint resolution needs `pd` visible
# in the module globals when `from __future__ import annotations` is on.
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..core.schema import Schema


class FormatError(ValueError):
    """Header/shape of the input does not match the linkage schema."""


def read_linkage_csv(
    spark: SparkSession,
    path: str,
    schema: Schema,
    header: Union[bool, str] = True,
) -> DataFrame:
    """Read a linkage CSV with one string column per schema field.

    ``header=True`` validates the header row against the schema's field
    identifiers (exact names, exact order — the reference's rule);
    ``header='ignore'`` skips the first row unchecked; ``header=False``
    reads every row as data.
    """
    identifiers = [f.identifier for f in schema.fields]
    read_schema = StructType(
        [StructField(name, StringType(), True) for name in identifiers]
    )
    if header not in (True, False, "ignore"):
        raise ValueError("header must be True, False, or 'ignore'")
    df = (
        spark.read.option("header", header is not False)
        .option("mode", "PERMISSIVE")
        .schema(read_schema)
        .csv(path)
    )
    if header is True:
        # Read just the header line and compare against identifiers.
        raw_first = spark.read.text(path).limit(1).collect()
        if not raw_first:
            raise FormatError("input file is empty")
        import csv as _csv
        import io

        actual = next(_csv.reader(io.StringIO(raw_first[0]["value"])))
        if len(actual) != len(identifiers):
            raise FormatError(
                f"expected {len(identifiers)} columns in header, got "
                f"{len(actual)}"
            )
        mismatches = [
            (i, want, got)
            for i, (want, got) in enumerate(zip(identifiers, actual))
            if want != got
        ]
        if mismatches:
            i, want, got = mismatches[0]
            raise FormatError(
                f"header mismatch at column {i}: expected {want!r}, "
                f"got {got!r}"
            )
    return df


def validity_errors(
    df: DataFrame,
    schema: Schema,
    sample: int = 5,
    key_col: str = None,
) -> List[str]:
    """Run per-field validation; return up to ``sample`` error strings
    (empty = dataset valid).

    Distributed equivalent of the reference's fail-fast entry validation
    (clkhash/validate_data.py:44-76): validation runs on executors as an
    Arrow-batched pandas UDF, only failures come back. Without
    ``key_col`` it checks *distinct* values per field (cheapest); with
    ``key_col`` each error also names the offending row's key — the
    distributed stand-in for the reference EntryError's row index, which
    is partition-relative (meaningless) on a parallel scan.
    """
    from pyspark.sql.types import BooleanType

    errors: List[str] = []
    for field in schema.fields:
        if field.hash_spec is None:
            continue

        def make_validator(fld):
            @F.pandas_udf(BooleanType())
            def is_valid(values: pd.Series) -> pd.Series:
                def check(v):
                    try:
                        fld.validate("" if v is None else str(v))
                        return True
                    except Exception:
                        return False

                return values.map(check)

            return is_valid

        is_valid = make_validator(field)
        source = df.select(
            F.col(field.identifier).alias("v"),
            *([F.col(key_col).alias("k")] if key_col else []),
        )
        if not key_col:
            source = source.distinct()
        bad = (
            source.where(~is_valid(F.col("v")))
            .limit(sample)
            .collect()
        )
        errors.extend(
            f"field {field.identifier!r}: invalid value {r['v']!r}"
            + (f" (key={r['k']!r})" if key_col else "")
            for r in bad
        )
        if len(errors) >= sample:
            break
    return errors[:sample]
