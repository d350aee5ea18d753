"""Deterministic synthetic web-pages fixture (north-rule input shape).

Generates the ``(url, warc_ts, html, text, lang)`` table from
``BASELINE.json``'s input hint, with labeled duplicate clusters for
linkage evaluation (FIXTURES.md F1). Everything is a pure function of the
row index + seed — generation runs JVM-side (``spark.range`` + hash-based
sampling), no Python UDFs, no RNG state, so any scale regenerates
identically and in parallel.

Cluster structure: rows come in windows of ``window``; the first
``cluster_size`` rows of each window are variants of one entity (true
duplicates with ~``perturb_rate`` of words swapped), the rest are
singletons. Ground truth is recoverable from the row id alone.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["synthetic_webpages", "webpages_truth", "BASE_VOCAB"]

# Deterministic vocabulary: pronounceable pseudo-words derived from a
# fixed seed string (no wall clock, no `random`). 4096 words of 2-5
# syllables ≈ the 4-gram diversity of real web text — unrelated pages
# share few character n-grams, which keeps LSH candidate volume O(n)
# like a real crawl (a tiny vocab makes every page collide with every
# other and the pair stage degenerate to O(n²)).
def _make_vocab(size: int = 4096, seed: str = "clkhash-spark-vocab") -> List[str]:
    consonants = "bcdfghjklmnpqrstvwz"
    vowels = "aeiou"
    clusters = ["", "r", "l", "n", "s"]
    words = []
    for i in range(size):
        digest = hashlib.sha256(f"{seed}:{i}".encode()).digest()
        length = 2 + digest[0] % 4  # 2-5 syllables
        syllables = []
        for j in range(length):
            c = consonants[digest[3 * j + 1] % len(consonants)]
            v = vowels[digest[3 * j + 2] % len(vowels)]
            tail = clusters[digest[3 * j + 3] % len(clusters)]
            syllables.append(c + v + tail)
        words.append("".join(syllables))
    return words


BASE_VOCAB = _make_vocab()
_LANGS = ["en", "de", "es", "fr", "zh"]


def synthetic_webpages(
    spark: SparkSession,
    num_rows: int,
    seed: int = 42,
    window: int = 10,
    cluster_size: int = 3,
    min_words: int = 30,
    max_words: int = 80,
    perturb_denominator: int = 12,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Build the synthetic (url, warc_ts, html, text, lang) table.

    ~``cluster_size / window`` of rows belong to duplicate clusters of
    ``cluster_size``; a variant differs from its entity's base text in
    ~``1/perturb_denominator`` of word positions (2-gram Dice stays well
    above typical 0.72-0.9 thresholds).
    """
    vocab = F.array(*[F.lit(w) for w in BASE_VOCAB])
    vocab_size = len(BASE_VOCAB)

    df = spark.range(0, num_rows, 1, num_partitions or spark.sparkContext.defaultParallelism)
    offset = F.col("id") % window
    entity = F.when(
        offset < cluster_size, (F.col("id") / window).cast("long") * window
    ).otherwise(F.col("id"))
    variant = F.when(offset < cluster_size, offset).otherwise(F.lit(0))

    df = df.withColumn("entity_id", entity).withColumn(
        "variant", variant.cast("int")
    )

    def h(*cols: Column) -> Column:
        return F.xxhash64(F.lit(seed), *cols)

    n_words = (
        F.lit(min_words)
        + F.pmod(h(F.col("entity_id")), F.lit(max_words - min_words))
    ).cast("int")

    # Variant > 0 swaps ~1/perturb_denominator of word positions for an
    # alternate word; all word picks are hash-indexed into the vocab.
    words = F.transform(
        F.sequence(F.lit(0), n_words - 1),
        lambda j: F.when(
            (F.col("variant") > 0)
            & (
                F.pmod(h(F.col("entity_id"), F.col("variant"), j),
                       F.lit(perturb_denominator))
                == 0
            ),
            F.element_at(
                vocab,
                (
                    F.pmod(
                        h(F.col("entity_id"), F.col("variant"), j, F.lit(1)),
                        F.lit(vocab_size),
                    )
                    + 1
                ).cast("int"),
            ),
        ).otherwise(
            F.element_at(
                vocab,
                (
                    F.pmod(h(F.col("entity_id"), j), F.lit(vocab_size)) + 1
                ).cast("int"),
            )
        ),
    )

    text = F.array_join(words, " ")
    url = F.concat(
        F.lit("https://example.org/"),
        F.col("entity_id").cast("string"),
        F.lit("/"),
        F.col("variant").cast("string"),
    )
    warc_ts = F.timestamp_seconds(F.lit(1704067200) + F.col("id"))  # 2024-01-01 + id sec
    lang = F.element_at(
        F.array(*[F.lit(x) for x in _LANGS]),
        (F.pmod(h(F.col("entity_id"), F.lit("lang")), F.lit(len(_LANGS))) + 1).cast("int"),
    )
    html = F.encode(
        F.concat(F.lit("<html><body>"), text, F.lit("</body></html>")),
        "utf-8",
    )

    return df.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
        F.col("entity_id"),
        F.col("variant"),
    )


def webpages_truth(webpages: DataFrame) -> DataFrame:
    """Ground-truth sidecar (url, entity_id)."""
    return webpages.select("url", "entity_id")


def synthetic_webpage_parties(
    spark: SparkSession,
    entities_per_party: int,
    overlap: float = 0.5,
    seed: int = 42,
    window: int = 10,
    **fixture_kwargs,
) -> tuple:
    """Two overlapping record-linkage parties from the synthetic fixture
    (the ``generate_overlapping_subsets`` pattern of the reference's
    randomnames module, clkhash/randomnames.py:170-207, re-expressed
    over the web-pages shape).

    Party A holds variant 0 of its entities, party B variant 1 —
    overlapping entities appear as *near-duplicate* records (different
    ~1/12-word perturbations), never byte-identical, so cross-party
    linkage exercises real approximate matching. ``overlap`` is the
    fraction of each party's entities shared with the other; keys are
    prefixed ``a:`` / ``b:`` so they stay distinct across parties.

    Returns ``(party_a, party_b, shared_entities)`` — each party is a
    DataFrame (key, text, entity_id) of exactly ``entities_per_party``
    rows; ``shared_entities`` is the ground-truth match count.
    """
    shared = int(entities_per_party * overlap)
    total_windows = 2 * entities_per_party - shared
    pages = synthetic_webpages(
        spark, total_windows * window, seed=seed, window=window,
        **fixture_kwargs,
    )
    # Clustered rows only (one per window per variant): singletons have
    # entity_id == id with id % window >= cluster_size.
    clustered = pages.where(F.col("entity_id") % window == 0)
    win = (F.col("entity_id") / window).cast("long")

    def party(prefix: str, variant: int, cond) -> DataFrame:
        return (
            clustered.where((F.col("variant") == variant) & cond)
            .select(
                F.concat(F.lit(prefix), F.col("url")).alias("key"),
                "text",
                "entity_id",
            )
        )

    party_a = party("a:", 0, win < entities_per_party)
    party_b = party(
        "b:", 1,
        (win >= entities_per_party - shared) & (win < total_windows),
    )
    return party_a, party_b, shared
