"""Synthetic PII generator (reference: clkhash/randomnames.py:67-207),
rebuilt Spark-native: every value is a pure hash function of
``(seed, row id)`` — ``spark.range`` + JVM expressions, no Python RNG on
executors, any scale regenerates identically.

Produces the reference's default record shape
``(INDEX, NAME freetext, DOB YYYY/MM/DD, GENDER M or F)`` plus
``generate_overlapping_subsets`` for linkage experiments
(reference: clkhash/randomnames.py:170-207 — two parties with a known
overlap fraction and ground truth on INDEX).
"""

from __future__ import annotations

import hashlib
from typing import List, Tuple

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["random_persons", "generate_overlapping_subsets",
           "RANDOMNAMES_SCHEMA_DICT"]

# The reference's default linkage schema shape for this table
# (clkhash/data/randomnames-schema.json), reproduced as config.
RANDOMNAMES_SCHEMA_DICT = {
    "version": 3,
    "clkConfig": {
        "l": 1024,
        "kdf": {"type": "HKDF", "hash": "SHA256", "keySize": 64},
    },
    "features": [
        {"identifier": "INDEX", "ignored": True},
        {
            "identifier": "NAME freetext",
            "format": {"type": "string", "encoding": "utf-8",
                       "case": "mixed", "minLength": 3},
            "hashing": {
                "comparison": {"type": "ngram", "n": 2},
                "strategy": {"bitsPerToken": 15},
                "hash": {"type": "doubleHash"},
            },
        },
        {
            "identifier": "DOB YYYY/MM/DD",
            "format": {"type": "date", "format": "%Y/%m/%d"},
            "hashing": {
                "comparison": {"type": "ngram", "n": 1, "positional": True},
                "strategy": {"bitsPerToken": 30},
                "hash": {"type": "doubleHash"},
            },
        },
        {
            "identifier": "GENDER M or F",
            "format": {"type": "enum", "values": ["M", "F"]},
            "hashing": {
                "comparison": {"type": "ngram", "n": 1},
                "strategy": {"bitsPerToken": 60},
                "hash": {"type": "doubleHash"},
            },
        },
    ],
}


def _name_pool(seed: str, size: int) -> List[str]:
    """Deterministic pool of pronounceable names."""
    consonants = "bcdfghjklmnprstvw"
    vowels = "aeiou"
    names = []
    for i in range(size):
        digest = hashlib.sha256(f"{seed}:{i}".encode()).digest()
        syllables = 2 + digest[0] % 2
        name = "".join(
            consonants[digest[2 * j + 1] % len(consonants)]
            + vowels[digest[2 * j + 2] % len(vowels)]
            for j in range(syllables)
        )
        names.append(name.capitalize())
    return names


def random_persons(
    spark: SparkSession, n: int, seed: int = 42
) -> DataFrame:
    """n synthetic persons: (INDEX, NAME freetext, DOB YYYY/MM/DD,
    GENDER M or F)."""
    first_names = _name_pool("first", 256)
    last_names = _name_pool("last", 256)
    firsts = F.array(*[F.lit(x) for x in first_names])
    lasts = F.array(*[F.lit(x) for x in last_names])

    def h(tag: str) -> Column:
        return F.xxhash64(F.lit(seed), F.lit(tag), F.col("id"))

    df = spark.range(0, n, 1, spark.sparkContext.defaultParallelism)
    name = F.concat(
        F.element_at(firsts, (F.pmod(h("fn"), F.lit(256)) + 1).cast("int")),
        F.lit(" "),
        F.element_at(lasts, (F.pmod(h("ln"), F.lit(256)) + 1).cast("int")),
    )
    # DOB between 1924-01-01 and 2006-12-28 (pure arithmetic, valid days).
    year = (F.lit(1924) + F.pmod(h("y"), F.lit(83))).cast("int")
    month = (F.lit(1) + F.pmod(h("m"), F.lit(12))).cast("int")
    day = (F.lit(1) + F.pmod(h("d"), F.lit(28))).cast("int")
    dob = F.concat_ws(
        "/",
        F.lpad(year.cast("string"), 4, "0"),
        F.lpad(month.cast("string"), 2, "0"),
        F.lpad(day.cast("string"), 2, "0"),
    )
    gender = F.when(F.pmod(h("g"), F.lit(2)) == 0, "M").otherwise("F")
    return df.select(
        F.col("id").cast("string").alias("INDEX"),
        name.alias("NAME freetext"),
        dob.alias("DOB YYYY/MM/DD"),
        gender.alias("GENDER M or F"),
    )


def generate_overlapping_subsets(
    persons: DataFrame, subset_size: int, overlap: float = 0.8
) -> Tuple[DataFrame, DataFrame]:
    """Two ``subset_size``-row parties sharing ``overlap`` of their rows.

    Rows [0, overlap*size) appear in both parties; each party tops up with
    disjoint ranges — ground truth is INDEX equality (the reference's
    80%-overlap e2e fixture, tests/test_e2e_hashing.py:104-127).
    """
    shared = int(subset_size * overlap)
    idx = F.col("INDEX").cast("long")
    party_a = persons.where(idx < subset_size)
    party_b = persons.where(
        (idx < shared)
        | ((idx >= subset_size) & (idx < 2 * subset_size - shared))
    )
    return party_a, party_b
