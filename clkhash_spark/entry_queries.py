"""Query registry for the driver contract (``__spark_entry__.py``).

Each entry pairs a Spark implementation (a callable of ``(spark, sf_dir)``)
with an equivalent ANSI-SQL oracle DuckDB can run over the same parquet
tables. Column names and types are aligned on both sides — the driver
hash-compares values after sorting columns by name.

Queries whose semantics SQL cannot express (HMAC-based CLK encoding and
everything downstream of it) are registered without an oracle; their
correctness gate is the pytest golden-vector/parity suite instead.
"""

from __future__ import annotations

import os
from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import dedup, similarity, text as text_ops

QueryFn = Callable[[SparkSession, str], DataFrame]

MINHASH_NUM_HASHES = 32
MINHASH_NUM_BANDS = 8
MINHASH_SHINGLE = 3
TOPK_K = 10
TOPK_NUM_QUERIES = 5


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))


# ---------------------------------------------------------------------------
# Text analysis (SURVEY §2 Part C extras; SQL-oracled)
# ---------------------------------------------------------------------------

def q_doc_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_ops.token_counts(_read(spark, sf_dir, "documents"))


SQL_DOC_TOKEN_COUNTS = r"""
SELECT doc_id,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\s+')) END
           ::INT AS n_tokens_ws,
       len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))
           ::INT AS n_tokens_re
FROM documents
"""


def q_doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_ops.quality_scores(_read(spark, sf_dir, "documents"))


_SQL_STOPWORDS = ", ".join(f"'{w}'" for w in text_ops.STOPWORDS)

SQL_DOC_QUALITY_SCORES = rf"""
WITH base AS (
    SELECT doc_id, text,
           CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                ELSE regexp_split_to_array(trim(text), '\s+') END AS words,
           length(text) AS n_chars
    FROM documents
), feats AS (
    SELECT doc_id, n_chars, len(words) AS n_words,
           len([w FOR w IN words IF lower(w) IN ({_SQL_STOPWORDS})])
               AS n_stop,
           length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
           length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g'))
               AS n_punct,
           length(regexp_replace(text, '\s+', '', 'g')) AS n_nonspace
    FROM base
)
SELECT doc_id,
       n_chars::INT AS n_chars_measured,
       n_words::INT AS n_words,
       CASE WHEN n_words > 0
            THEN round(n_nonspace::DOUBLE / n_words, 6) ELSE 0.0 END
           AS mean_word_len,
       round(CASE WHEN n_words > 0
                  THEN n_stop::DOUBLE / n_words ELSE 0.0 END, 6)
           AS stopword_ratio,
       round(CASE WHEN n_chars > 0
                  THEN n_digit::DOUBLE / n_chars ELSE 0.0 END, 6)
           AS digit_ratio,
       round(CASE WHEN n_chars > 0
                  THEN n_punct::DOUBLE / n_chars ELSE 0.0 END, 6)
           AS punct_ratio
FROM feats
"""


def q_doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_ops.language_id(_read(spark, sf_dir, "documents"))


def _sql_lang_markers() -> str:
    parts = []
    anti = {"en": 3, "de": 2, "es": 1, "fr": 0}
    for lang, markers in text_ops.LANG_MARKERS.items():
        in_list = ", ".join(f"'{m}'" for m in markers)
        parts.append(
            f"(len([w FOR w IN words IF lower(w) IN ({in_list})]), "
            f"{anti[lang]}, '{lang}')"
        )
    return ", ".join(parts)


SQL_DOC_LANG_ID = rf"""
WITH base AS (
    SELECT doc_id,
           CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                ELSE regexp_split_to_array(trim(text), '\s+') END AS words
    FROM documents
), scored AS (
    SELECT doc_id,
           list_max([{_sql_lang_markers()}]) AS best
    FROM base
)
SELECT doc_id,
       CASE WHEN best[1] > 0 THEN best[3] ELSE 'und' END AS lang_pred,
       best[1]::INT AS marker_hits
FROM scored
"""


def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_ops.fingerprints(_read(spark, sf_dir, "documents"))


SQL_DOC_FINGERPRINTS = r"""
WITH base AS (
    SELECT doc_id,
           regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm,
           CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                ELSE regexp_split_to_array(trim(text), '\s+') END AS words
    FROM documents
)
SELECT doc_id,
       md5(norm) AS md5_fp,
       md5(CASE WHEN len(words) >= 5
                THEN list_min([array_to_string(words[i:i+4], ' ')
                               FOR i IN range(1, len(words) - 3)])
                ELSE array_to_string(words, ' ') END) AS shingle_fp
FROM base
"""


# ---------------------------------------------------------------------------
# Dedup (SQL-oracled)
# ---------------------------------------------------------------------------

def q_doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_duplicates(_read(spark, sf_dir, "documents"))


SQL_DOC_EXACT_DEDUP = r"""
SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS text_md5,
       count(*)::BIGINT AS n_docs,
       min(doc_id) AS canonical_doc_id
FROM documents
GROUP BY 1
"""

# Shared SQL fragment: normalized word shingles + MinHash signature.
_SQL_SHINGLES = r"""
    SELECT doc_id,
           string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
                        ' ') AS words
    FROM documents
"""


def _sql_signature(num_hashes: int, shingle: int) -> str:
    from .operators.dedup import (
        _MINHASH_BASE_MOD,
        _MINHASH_PRIME,
        minhash_coefficients,
    )

    mins = ", ".join(
        f"list_min([(h * {a}::BIGINT + {b}) % {_MINHASH_PRIME} "
        f"FOR h IN base])"
        for a, b in minhash_coefficients(num_hashes)
    )
    return rf"""
WITH w AS ({_SQL_SHINGLES}),
sh AS (
    SELECT doc_id,
           CASE WHEN len(words) >= {shingle}
                THEN [array_to_string(words[i:i+{shingle - 1}], ' ')
                      FOR i IN range(1, len(words) - {shingle - 2})]
                ELSE [array_to_string(words, ' ')] END AS shingles
    FROM w
),
hashed AS (
    SELECT doc_id,
           [CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)
            % {_MINHASH_BASE_MOD} FOR s IN shingles] AS base
    FROM sh
),
sig AS (
    SELECT doc_id, [{mins}] AS signature
    FROM hashed
)
"""


def q_doc_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = dedup.minhash_signatures(
        _read(spark, sf_dir, "documents"),
        num_hashes=MINHASH_NUM_HASHES,
        shingle_size=MINHASH_SHINGLE,
    )
    return sigs.select(
        "doc_id",
        F.element_at("signature", 1).alias("sig_0"),
        F.element_at("signature", 2).alias("sig_1"),
        F.element_at("signature", MINHASH_NUM_HASHES).alias("sig_last"),
        # Checksum over the full signature; summed mod 2^31 per element so
        # 32 x ~2^61 values can never overflow a long.
        F.aggregate(
            "signature",
            F.lit(0).cast("long"),
            lambda a, x: a + F.pmod(x, F.lit(1 << 31)),
        ).alias("sig_sum"),
    )


SQL_DOC_MINHASH_SIGNATURES = (
    _sql_signature(MINHASH_NUM_HASHES, MINHASH_SHINGLE)
    + f"""
SELECT doc_id,
       signature[1] AS sig_0,
       signature[2] AS sig_1,
       signature[{MINHASH_NUM_HASHES}] AS sig_last,
       list_sum([s % {1 << 31} FOR s IN signature])::BIGINT AS sig_sum
FROM sig
"""
)


def q_doc_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_near_duplicates(
        _read(spark, sf_dir, "documents"),
        threshold=0.5,
        num_hashes=MINHASH_NUM_HASHES,
        num_bands=MINHASH_NUM_BANDS,
        shingle_size=MINHASH_SHINGLE,
    )


_ROWS_PER_BAND = MINHASH_NUM_HASHES // MINHASH_NUM_BANDS

SQL_DOC_MINHASH_PAIRS = (
    _sql_signature(MINHASH_NUM_HASHES, MINHASH_SHINGLE)
    + f"""
, bands AS (
    SELECT doc_id,
           unnest([CAST(b AS VARCHAR) || '|' ||
                   array_to_string(
                       signature[b * {_ROWS_PER_BAND} + 1 :
                                 b * {_ROWS_PER_BAND} + {_ROWS_PER_BAND}],
                       ',')
                   FOR b IN range(0, {MINHASH_NUM_BANDS})]) AS band_raw
    FROM sig
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b ON md5(a.band_raw) = md5(b.band_raw)
    WHERE a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       round(len([i FOR i IN range(1, {MINHASH_NUM_HASHES} + 1)
                  IF sa.signature[i] = sb.signature[i]])::DOUBLE
             / {MINHASH_NUM_HASHES}, 6) AS est_jaccard
FROM cand
JOIN sig sa ON sa.doc_id = cand.doc_a
JOIN sig sb ON sb.doc_id = cand.doc_b
WHERE len([i FOR i IN range(1, {MINHASH_NUM_HASHES} + 1)
           IF sa.signature[i] = sb.signature[i]])::DOUBLE
      / {MINHASH_NUM_HASHES} >= 0.5
"""
)


def q_doc_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash(_read(spark, sf_dir, "documents"))


SQL_DOC_SIMHASH = r"""
WITH w AS (
    SELECT doc_id,
           string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
                        ' ') AS words
    FROM documents
), h AS (
    SELECT doc_id,
           [CAST(('0x' || substr(md5('sim:' || w), 1, 15)) AS BIGINT)
            FOR w IN words] AS hashes
    FROM w
)
SELECT doc_id,
       list_sum([CASE WHEN list_sum([((hh >> b) & 1) * 2 - 1
                                     FOR hh IN hashes]) > 0
                      THEN (1::BIGINT << b) ELSE 0 END
                 FOR b IN range(0, 60)])::BIGINT AS simhash
FROM h
"""


def q_doc_shingle_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-shingle Jaccard for pairs sharing the min-shingle
    fingerprint (1-permutation MinHash prefilter)."""
    docs = _read(spark, sf_dir, "documents")
    fps = text_ops.fingerprints(docs)
    left = fps.select(F.col("shingle_fp"), F.col("doc_id").alias("doc_a"))
    right = fps.select(F.col("shingle_fp"), F.col("doc_id").alias("doc_b"))
    candidates = (
        left.join(right, on="shingle_fp")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return dedup.shingle_jaccard(docs, candidates, shingle_size=3)


SQL_DOC_SHINGLE_JACCARD = r"""
WITH base AS (
    SELECT doc_id,
           CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                ELSE regexp_split_to_array(trim(text), '\s+') END AS words,
           string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
                        ' ') AS norm_words
    FROM documents
), fp AS (
    SELECT doc_id,
           md5(CASE WHEN len(words) >= 5
                    THEN list_min([array_to_string(words[i:i+4], ' ')
                                   FOR i IN range(1, len(words) - 3)])
                    ELSE array_to_string(words, ' ') END) AS shingle_fp
    FROM base
), sh AS (
    SELECT doc_id,
           list_distinct(
               CASE WHEN len(norm_words) >= 3
                    THEN [array_to_string(norm_words[i:i+2], ' ')
                          FOR i IN range(1, len(norm_words) - 1)]
                    ELSE [array_to_string(norm_words, ' ')] END
           ) AS shingles
    FROM base
), cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM fp a JOIN fp b ON a.shingle_fp = b.shingle_fp
    WHERE a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       round(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
             / len(list_distinct(sa.shingles || sb.shingles)), 6)
           AS jaccard
FROM cand
JOIN sh sa ON sa.doc_id = cand.doc_a
JOIN sh sb ON sb.doc_id = cand.doc_b
"""


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window style aggregate: events per type per hour with an
    exact integer value sum."""
    events = _read(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(
                F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long")
            ).alias("value_milli_sum"),
        )
    )


SQL_EVENTS_HOURLY = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*)::BIGINT AS n_events,
       sum(CAST(floor(value * 1000 + 0.5) AS BIGINT))::BIGINT
           AS value_milli_sum
FROM events
GROUP BY 1, 2
"""


def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join (customer ⋈ orders ⋈ nation) with broadcast dims."""
    orders = _read(spark, sf_dir, "orders")
    customer = _read(spark, sf_dir, "customer")
    nation = _read(spark, sf_dir, "nation")
    return (
        orders.join(
            F.broadcast(customer),
            orders.o_custkey == customer.c_custkey,
        )
        .join(
            F.broadcast(nation),
            customer.c_nationkey == nation.n_nationkey,
        )
        .groupBy("n_name")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
                    "long"
                )
            ).alias("revenue_cents"),
        )
    )


SQL_REVENUE_BY_NATION = """
SELECT n_name,
       count(*)::BIGINT AS n_orders,
       sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))::BIGINT
           AS revenue_cents
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# Embedding similarity (SQL-oracled, integer-exact)
# ---------------------------------------------------------------------------

def q_emb_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _read(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < TOPK_NUM_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = similarity.brute_force_topk(emb, queries, k=TOPK_K)
    return out.select(
        F.col("query_id").cast("long"),
        F.col("vec_id").cast("long"),
        F.col("dot_q").cast("long"),
        F.col("rank").cast("int"),
    )


SQL_EMB_TOPK = f"""
WITH q AS (
    SELECT vec_id AS query_id,
           [CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
            FOR x IN embedding] AS qv
    FROM embeddings WHERE vec_id < {TOPK_NUM_QUERIES}
), v AS (
    SELECT vec_id,
           [CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
            FOR x IN embedding] AS vv
    FROM embeddings
), scored AS (
    SELECT q.query_id, v.vec_id,
           list_sum([qv[i] * vv[i] FOR i IN range(1, len(qv) + 1)])::BIGINT
               AS dot_q
    FROM q CROSS JOIN v
    WHERE v.vec_id <> q.query_id
), ranked AS (
    SELECT query_id, vec_id, dot_q,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY dot_q DESC, vec_id ASC) AS rank
    FROM scored
)
SELECT query_id::BIGINT AS query_id, vec_id::BIGINT AS vec_id,
       dot_q, rank::INT AS rank
FROM ranked WHERE rank <= {TOPK_K}
"""


def q_emb_bucket_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH bucket occupancy — checks hyperplane bucketing end-to-end."""
    emb = _read(spark, sf_dir, "embeddings")
    buckets = similarity.hyperplane_signatures(emb, num_planes=8, dim=64)
    return (
        buckets.groupBy("bucket")
        .agg(F.count("*").cast("long").alias("n_vecs"))
    )


def _sql_planes_terms(num_planes: int = 8, dim: int = 64, seed: int = 42) -> str:
    planes = similarity.rademacher_planes(num_planes, dim, seed)
    terms = []
    for p, row in enumerate(planes):
        dot = " + ".join(
            f"({c}) * qv[{d + 1}]" for d, c in enumerate(row)
        )
        terms.append(
            f"(CASE WHEN ({dot}) >= 0 THEN (1::BIGINT << {p}) "
            f"ELSE 0 END)"
        )
    return " + ".join(terms)


SQL_EMB_BUCKET_SIZES = f"""
WITH v AS (
    SELECT vec_id,
           [CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
            FOR x IN embedding] AS qv
    FROM embeddings
)
SELECT ({_sql_planes_terms(8, 64, 42)}) AS bucket,
       count(*)::BIGINT AS n_vecs
FROM v
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Relational sanity queries (joins / aggs / windows; SQL-oracled)
# ---------------------------------------------------------------------------

def q_lineitem_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(
                F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast(
                    "long"
                )
            ).alias("sum_base_price_cents"),
            F.count("*").cast("long").alias("count_order"),
        )
    )


SQL_LINEITEM_PRICING = """
SELECT l_returnflag, l_linestatus,
       sum(CAST(l_quantity AS BIGINT))::BIGINT AS sum_qty,
       sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))::BIGINT
           AS sum_base_price_cents,
       count(*)::BIGINT AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


def q_orders_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _read(spark, sf_dir, "orders")
    customer = _read(spark, sf_dir, "customer")
    return (
        orders.join(
            F.broadcast(customer),
            orders.o_custkey == customer.c_custkey,
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
                    "long"
                )
            ).alias("total_cents"),
        )
    )


SQL_ORDERS_BY_SEGMENT = """
SELECT c_mktsegment,
       count(*)::BIGINT AS n_orders,
       sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))::BIGINT
           AS total_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_events_top_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    events = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("value"), F.asc("event_id")
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value")
    )


SQL_EVENTS_TOP_BY_USER = """
SELECT user_id, event_id, event_type, value
FROM (
    SELECT user_id, event_id, event_type, value,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY value DESC, event_id ASC) AS rn
    FROM events
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# CLK pipeline queries (no SQL oracle possible — HMAC inside; the
# correctness gate for these is the pytest golden-vector + parity suite)
# ---------------------------------------------------------------------------

def _documents_as_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").cast("string").alias("url"), "text"
    )


def q_clk_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.encode import encode_clks
    from .pipeline import webpages_schema

    pages = _documents_as_pages(spark, sf_dir)
    clks = encode_clks(
        pages, webpages_schema(), "spark-graft-secret", key_cols=("url",)
    )
    return clks.select(
        "url",
        F.base64(F.col("clk")).alias("clk_b64"),
        F.col("popcount").cast("int"),
    )


def q_clk_popcount_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.encode import encode_clks
    from .pipeline import webpages_schema

    pages = _documents_as_pages(spark, sf_dir)
    clks = encode_clks(
        pages, webpages_schema(), "spark-graft-secret", key_cols=("url",)
    )
    return (
        clks.groupBy(
            (F.floor(F.col("popcount") / 32) * 32).cast("int").alias(
                "popcount_bucket"
            )
        )
        .agg(F.count("*").cast("long").alias("n"))
    )


def q_clk_linkage_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pipeline on the deterministic synthetic web-pages fixture;
    returns the cluster-size distribution (stable across runs)."""
    from .pipeline import LinkageConfig, run_linkage, webpages_schema
    from .sources.webpages import synthetic_webpages

    pages = synthetic_webpages(spark, 2000, seed=42).select("url", "text")
    result = run_linkage(
        spark, pages,
        LinkageConfig(schema=webpages_schema(), secret="spark-graft-secret"),
    )
    return (
        result.clusters.groupBy("cluster_id")
        .agg(F.count("*").alias("cluster_size"))
        .groupBy("cluster_size")
        .agg(F.count("*").cast("long").alias("n_clusters"))
    )


def q_clk_linkage_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline quality vs ground truth as a 1-row DataFrame."""
    from .operators.evaluate import (
        cluster_pairs,
        pairwise_metrics,
        truth_pairs,
    )
    from .pipeline import LinkageConfig, run_linkage, webpages_schema
    from .sources.webpages import synthetic_webpages, webpages_truth

    pages = synthetic_webpages(spark, 2000, seed=42)
    result = run_linkage(
        spark, pages.select("url", "text"),
        LinkageConfig(schema=webpages_schema(), secret="spark-graft-secret"),
    )
    metrics = pairwise_metrics(
        cluster_pairs(result.clusters, key_col="url"),
        truth_pairs(webpages_truth(pages)),
    )
    return spark.createDataFrame(
        [(metrics["tp"], metrics["predicted"], metrics["truth"],
          round(metrics["precision"], 6), round(metrics["recall"], 6),
          round(metrics["f1"], 6))],
        ["tp", "predicted", "truth", "precision", "recall", "f1"],
    )


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

QUERIES: Dict[str, QueryFn] = {
    # text analysis
    "doc_token_counts": q_doc_token_counts,
    "doc_quality_scores": q_doc_quality_scores,
    "doc_lang_id": q_doc_lang_id,
    "doc_fingerprints": q_doc_fingerprints,
    # dedup
    "doc_exact_dedup": q_doc_exact_dedup,
    "doc_minhash_signatures": q_doc_minhash_signatures,
    "doc_minhash_pairs": q_doc_minhash_pairs,
    "doc_simhash": q_doc_simhash,
    "doc_shingle_jaccard": q_doc_shingle_jaccard,
    # similarity
    "emb_topk": q_emb_topk,
    "emb_bucket_sizes": q_emb_bucket_sizes,
    # relational sanity
    "lineitem_pricing": q_lineitem_pricing,
    "orders_by_segment": q_orders_by_segment,
    "events_top_by_user": q_events_top_by_user,
    "events_hourly": q_events_hourly,
    "revenue_by_nation": q_revenue_by_nation,
    # CLK pipeline (rows-only checks)
    "clk_encode": q_clk_encode,
    "clk_popcount_hist": q_clk_popcount_hist,
    "clk_linkage_clusters": q_clk_linkage_clusters,
    "clk_linkage_f1": q_clk_linkage_f1,
}

ORACLES: Dict[str, str] = {
    "doc_token_counts": SQL_DOC_TOKEN_COUNTS,
    "doc_quality_scores": SQL_DOC_QUALITY_SCORES,
    "doc_lang_id": SQL_DOC_LANG_ID,
    "doc_fingerprints": SQL_DOC_FINGERPRINTS,
    "doc_exact_dedup": SQL_DOC_EXACT_DEDUP,
    "doc_minhash_signatures": SQL_DOC_MINHASH_SIGNATURES,
    "doc_minhash_pairs": SQL_DOC_MINHASH_PAIRS,
    "doc_simhash": SQL_DOC_SIMHASH,
    "doc_shingle_jaccard": SQL_DOC_SHINGLE_JACCARD,
    "emb_topk": SQL_EMB_TOPK,
    "emb_bucket_sizes": SQL_EMB_BUCKET_SIZES,
    "lineitem_pricing": SQL_LINEITEM_PRICING,
    "orders_by_segment": SQL_ORDERS_BY_SEGMENT,
    "events_top_by_user": SQL_EVENTS_TOP_BY_USER,
    "events_hourly": SQL_EVENTS_HOURLY,
    "revenue_by_nation": SQL_REVENUE_BY_NATION,
}
