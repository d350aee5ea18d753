"""End-to-end CLK linkage pipeline: encode → block → score → cluster.

Composes the operators with checkpointed stages and throughput counters.
Stage tables are plain parquet directories with a JSON manifest
(`_clkhash_manifest.json`) — the sandbox stand-in for Iceberg snapshot
tables; on a real cluster swap :class:`StageStore` for Iceberg
``writeTo``/snapshots without touching the operator code.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Sequence, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core.schema import Schema
from .operators.blocking import block_keys, block_size_histogram, cap_block_size
from .operators.cluster import attach_cluster_ids, connected_components
from .operators.encode import encode_clks
from .operators.scoring import candidate_pairs, score_candidates

__all__ = ["LinkageConfig", "LinkageResult", "StageStore", "run_linkage",
           "run_linkage_two_party", "tuned_blocking",
           "WEBPAGES_SCHEMA_DICT", "webpages_schema"]


# Default linkage schema for the north-rule web-pages table: the page text
# as 4-grams under doubleHash (1024-bit CLK). 4-grams ≈ word-piece level —
# measured on the synthetic fixture, unrelated-page Dice tops out ~0.50
# while near-duplicates stay ≥0.83, so thresholds in [0.6, 0.8] separate
# cleanly (2-grams of web text share too small a universe: unrelated Dice
# reaches 0.88). bitsPerFeature keeps popcount roughly length-independent,
# which stabilizes Dice across page sizes.
WEBPAGES_SCHEMA_DICT: Dict[str, Any] = {
    "version": 3,
    "clkConfig": {
        "l": 1024,
        "kdf": {"type": "HKDF", "hash": "SHA256", "keySize": 64},
    },
    "features": [
        {
            "identifier": "text",
            "format": {"type": "string", "encoding": "utf-8"},
            "hashing": {
                "comparison": {"type": "ngram", "n": 4},
                "strategy": {"bitsPerFeature": 400},
                "hash": {"type": "doubleHash"},
            },
        }
    ],
}


def webpages_schema() -> Schema:
    from .core.schema import from_json_dict

    return from_json_dict(WEBPAGES_SCHEMA_DICT)


def tuned_blocking(
    n_rows: int,
    num_bands: int = 64,
    unrelated_agreement: float = 0.57,
    # Empirical on fixtures: near-dup Dice >= 0.83 at fill 0.32 gives
    # per-bit agreement ~0.93; pass 0.90 to plan for a Dice-0.76 tail.
    duplicate_agreement: float = 0.93,
    target_candidates_per_row: float = 20.0,
    min_band_matches: int = 2,
) -> Dict[str, int]:
    """Scale-aware LSH band sizing.

    Two CLK bits of *unrelated* records agree with probability
    ``1 - 2f(1-f)`` (~0.57 at fill 0.32) regardless of content, so
    spurious candidates grow with n² while true pairs grow with n.
    Holding candidates to ``target_candidates_per_row · n``:

    - ``min_band_matches=1``: leakage ``≈ n²/2 · b·a_u^r`` →
      ``r ≈ log(2·target/(n·b)) / log(a_u)`` (22 bits ≈ 100k rows,
      44 ≈ 10^10 — steep).
    - ``min_band_matches=2`` (default): leakage
      ``≈ n²/2 · (b·a_u^r)²/2`` — quadratic suppression →
      ``r ≈ log(2·sqrt(target/n)/b) / log(a_u)`` (16 bits ≈ 1M rows,
      28 ≈ 10^12 — CLK-bit LSH stays viable at web scale).

    Recall per true pair (worst-case band agreement ``a_d≈0.90`` for a
    marginal Dice-0.75 duplicate): ``P(Binom(b, a_d^r) ≥ m)``; bands
    double until the prediction clears 0.995 (reported so callers can
    check).
    """
    import math

    # The binding constraint is the block-join OUTPUT volume
    # (n²/2 · b · a_u^r skinny rows), which min_band_matches does NOT
    # reduce — it only filters what gets scored. Bound the join at
    # ~10x the scored target per row; the ≥2-band rule then makes the
    # scored set essentially pure.
    join_budget_per_row = 10.0 * target_candidates_per_row
    frac = 2.0 * join_budget_per_row / (n_rows * num_bands)
    r = math.ceil(math.log(frac) / math.log(unrelated_agreement))
    r = max(14, min(r, 48))

    def predicted_recall(bands: int) -> float:
        p = duplicate_agreement ** r
        miss = (1 - p) ** bands
        if min_band_matches >= 2:
            miss += bands * p * (1 - p) ** (bands - 1)
        return 1 - miss

    bands = num_bands
    while bands < 512 and predicted_recall(bands) < 0.995:
        bands *= 2
    return {
        "num_bands": bands,
        "bits_per_band": r,
        "predicted_recall": round(predicted_recall(bands), 6),
        "min_band_matches": min_band_matches,
    }


@dataclass
class LinkageConfig:
    schema: Schema
    secret: Union[str, bytes]
    key_col: str = "url"
    feature_cols: Optional[Sequence[str]] = None
    # Dice ≥ 0.75 keeps near-dups (≥0.83 on fixtures) and rejects unrelated
    # pages (≤0.50 at 4-gram encoding).
    threshold: float = 0.75
    # Measured at 20k fixture rows with the >=2-band rule: 64 bands x
    # 18 bits → F1 0.9995 (R 0.999); 20 bits → F1 0.9992 with ~half the
    # join volume. Use tuned_blocking(n) to re-derive for other scales —
    # join volume grows n² while true pairs grow n.
    num_bands: int = 64
    bits_per_band: int = 18
    # Require >=2 band collisions before a pair is scored: quadratic
    # suppression of spurious candidates (see candidate_pairs) at ~0.1%
    # recall cost for marginal (Dice~0.76) duplicates.
    min_band_matches: int = 2
    lsh_seed: int = 42
    lsh_salt: int = 0
    max_block_size: Optional[int] = 2000
    block_cap_mode: str = "split"
    validate: bool = False
    pair_partitions: Optional[int] = None
    checkpoint_dir: Optional[str] = None
    resume: bool = True


@dataclass
class LinkageResult:
    clks: DataFrame
    blocks: DataFrame
    pairs: DataFrame
    clusters: DataFrame
    metrics: Dict[str, Any] = field(default_factory=dict)


class StageStore:
    """Parquet-with-manifest stage checkpointing (Iceberg stand-in).

    Each stage writes to ``<root>/<stage>/`` and records a manifest entry
    (row count, wall time, config fingerprint). A completed stage is
    *resumed* — read back instead of recomputed — when the fingerprint
    matches, which is what makes a killed job cheap to restart.
    """

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.manifest_path = os.path.join(root, "_clkhash_manifest.json")
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as fp:
                self.manifest = json.load(fp)
        else:
            self.manifest = {"stages": {}}

    def _save_manifest(self) -> None:
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as fp:
            json.dump(self.manifest, fp, indent=2)
        os.replace(tmp, self.manifest_path)

    def has(self, stage: str, fingerprint: str) -> bool:
        entry = self.manifest["stages"].get(stage)
        return bool(entry and entry.get("fingerprint") == fingerprint
                    and entry.get("complete"))

    def read(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.root, stage))

    def write(
        self, stage: str, df: DataFrame, fingerprint: str
    ) -> DataFrame:
        path = os.path.join(self.root, stage)
        start = time.time()
        df.write.mode("overwrite").parquet(path)
        out = self.spark.read.parquet(path)
        rows = out.count()
        elapsed = time.time() - start
        self.manifest["stages"][stage] = {
            "fingerprint": fingerprint,
            "rows": rows,
            "seconds": round(elapsed, 3),
            "rows_per_sec": round(rows / elapsed, 1) if elapsed > 0 else None,
            "complete": True,
        }
        self._save_manifest()
        return out


def _fingerprint(config: LinkageConfig, stage: str) -> str:
    import hashlib

    relevant = {
        "stage": stage,
        "l": config.schema.l,
        "xor_folds": config.schema.xor_folds,
        "fields": [f.identifier for f in config.schema.fields],
        "threshold": config.threshold,
        "num_bands": config.num_bands,
        "bits_per_band": config.bits_per_band,
        "min_band_matches": config.min_band_matches,
        "lsh_seed": config.lsh_seed,
        "lsh_salt": config.lsh_salt,
        "max_block_size": config.max_block_size,
        "cap_mode": config.block_cap_mode,
    }
    return hashlib.sha256(
        json.dumps(relevant, sort_keys=True).encode()
    ).hexdigest()[:16]


def run_linkage(
    spark: SparkSession,
    pages: DataFrame,
    config: LinkageConfig,
) -> LinkageResult:
    """Run the full dedup-linkage pipeline over one table.

    Stages (each checkpointed when ``config.checkpoint_dir`` is set):
    ``clks`` → ``blocks`` → ``pairs`` → ``clusters``.
    """
    store = (
        StageStore(spark, config.checkpoint_dir)
        if config.checkpoint_dir
        else None
    )
    metrics: Dict[str, Any] = {}

    def stage(name: str, build):
        fp = _fingerprint(config, name)
        if store is not None and config.resume and store.has(name, fp):
            metrics[f"{name}_resumed"] = True
            return store.read(name)
        start = time.time()
        df = build()
        if store is not None:
            df = store.write(name, df, fp)
            entry = store.manifest["stages"][name]
            metrics[f"{name}_rows"] = entry["rows"]
            metrics[f"{name}_seconds"] = entry["seconds"]
            metrics[f"{name}_rows_per_sec"] = entry["rows_per_sec"]
        else:
            # No table store: persist + materialize so downstream stages
            # never recompute this one (lazy evaluation would otherwise
            # re-run encode once per consumer), and so AQE sees real
            # sizes (e.g. broadcasting the CLK payload into the pair
            # join).
            df = df.persist()
            rows = df.count()
            elapsed = time.time() - start
            metrics[f"{name}_rows"] = rows
            metrics[f"{name}_seconds"] = round(elapsed, 3)
            metrics[f"{name}_rows_per_sec"] = (
                round(rows / elapsed, 1) if elapsed > 0 else None
            )
        return df

    clks = stage(
        "clks",
        lambda: encode_clks(
            pages,
            config.schema,
            config.secret,
            key_cols=(config.key_col,),
            feature_cols=config.feature_cols,
            validate=config.validate,
        ),
    )

    # Work in an int64 key domain through the shuffle-heavy middle
    # stages: banding, the pair self-join, and the CLK payload joins all
    # move (long, long) rows instead of (long, url-string) — ~2.5x less
    # shuffle volume. URL strings rejoin only on the skinny final pairs.
    # (xxhash64 collisions across keys are negligible below ~10^9 rows;
    # beyond that substitute a dense-id assignment join here.)
    kid_col = "_kid"
    clks_k = clks.withColumn(kid_col, F.xxhash64(F.col(config.key_col)))
    ids = clks_k.select(kid_col, config.key_col)

    def build_blocks() -> DataFrame:
        blocks = block_keys(
            clks_k,
            l=config.schema.l,
            num_bands=config.num_bands,
            bits_per_band=config.bits_per_band,
            seed=config.lsh_seed,
            salt=config.lsh_salt,
            key_cols=(kid_col,),
        )
        if config.max_block_size:
            # Persist the raw banding once: the cap needs it twice (size
            # join + accounting) and clks is already materialized.
            blocks = blocks.persist()
            blocks, accounting = cap_block_size(
                blocks,
                config.max_block_size,
                mode=config.block_cap_mode,
                key_cols=(kid_col,),
            )
            metrics["block_cap_accounting"] = (
                accounting.first().asDict()
            )
        return blocks

    blocks = stage("blocks", build_blocks)

    def build_pairs() -> DataFrame:
        scored = score_candidates(
            candidate_pairs(
                blocks,
                key_col=kid_col,
                repartition=config.pair_partitions,
                min_band_matches=config.min_band_matches,
            ),
            clks_k,
            threshold=config.threshold,
            key_col=kid_col,
        )
        # Back to user-facing keys for the stage table / consumers.
        id_a = ids.select(
            F.col(kid_col).alias("key_a"),
            F.col(config.key_col).alias("_url_a"),
        )
        id_b = ids.select(
            F.col(kid_col).alias("key_b"),
            F.col(config.key_col).alias("_url_b"),
        )
        # Pairs were canonicalized in the kid domain; re-canonicalize on
        # the user-facing keys (string order != hash order).
        return (
            scored.join(id_a, on="key_a")
            .join(id_b, on="key_b")
            .select(
                F.least("_url_a", "_url_b").alias("key_a"),
                F.greatest("_url_a", "_url_b").alias("key_b"),
                "score",
            )
        )

    pairs = stage("pairs", build_pairs)

    def build_clusters() -> DataFrame:
        components = connected_components(pairs)
        return attach_cluster_ids(
            clks.select(config.key_col), components, key_col=config.key_col
        )

    clusters = stage("clusters", build_clusters)

    return LinkageResult(
        clks=clks, blocks=blocks, pairs=pairs, clusters=clusters,
        metrics=metrics,
    )


def run_linkage_two_party(
    spark: SparkSession,
    party_a: DataFrame,
    party_b: DataFrame,
    config: LinkageConfig,
    one_to_one: bool = True,
) -> LinkageResult:
    """Two-party record linkage (the reference tutorial's FEBRL flow:
    encode both datasets under the SAME secret/schema, block together,
    score cross-party pairs, optionally enforce a 1-1 matching).

    ``party_a``/``party_b`` rows must carry distinct ``config.key_col``
    values across parties (prefix them if needed). Returns pairs as
    (key_a from party_a, key_b from party_b, score); ``clusters`` holds
    the matched-pair components (useful when one_to_one=False).
    """
    from .operators.scoring import one_to_one_matching

    def encode(df: DataFrame) -> DataFrame:
        return encode_clks(
            df,
            config.schema,
            config.secret,
            key_cols=(config.key_col,),
            feature_cols=config.feature_cols,
            validate=config.validate,
        ).persist()

    clks_a = encode(party_a)
    clks_a.count()
    clks_b = encode(party_b)
    clks_b.count()

    def bands(clks: DataFrame) -> DataFrame:
        return block_keys(
            clks,
            l=config.schema.l,
            num_bands=config.num_bands,
            bits_per_band=config.bits_per_band,
            seed=config.lsh_seed,
            salt=config.lsh_salt,
            key_cols=(config.key_col,),
        )

    blocks_a = bands(clks_a)
    blocks_b = bands(clks_b)
    pairs = candidate_pairs(
        blocks_a, other=blocks_b, key_col=config.key_col,
        repartition=config.pair_partitions,
        min_band_matches=config.min_band_matches,
    )
    scored = score_candidates(
        pairs, clks_a, threshold=config.threshold,
        other_clks=clks_b, key_col=config.key_col,
    ).persist()
    scored.count()
    matched = one_to_one_matching(scored) if one_to_one else scored

    components = connected_components(matched)
    all_keys = clks_a.select(config.key_col).union(
        clks_b.select(config.key_col)
    )
    clusters = attach_cluster_ids(all_keys, components,
                                  key_col=config.key_col)
    return LinkageResult(
        clks=clks_a.unionByName(clks_b),
        blocks=blocks_a.unionByName(blocks_b),
        pairs=matched,
        clusters=clusters,
        metrics={},
    )
