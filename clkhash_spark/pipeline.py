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

__all__ = ["LinkageConfig", "LinkageResult", "StageStore",
           "estimate_bit_agreement", "run_linkage",
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


# Band-count search grid: banded-row volume (the dominant pipeline
# shuffle — b skinny rows per input record) is proportional to b, so
# the tuner walks this grid upward and stops at the first band count
# whose budget-derived bit depth still predicts the recall target.
_BAND_GRID = (16, 20, 24, 28, 32, 40, 48, 56, 64, 80, 96, 128, 192, 256,
              384, 512)


def tuned_blocking(
    n_rows: int,
    num_bands: Optional[int] = None,
    unrelated_agreement: float = 0.57,
    # CALIBRATED against measured recall, not assumed: a round-4
    # counter-verified A/B at 600k rows (local[8], r=24) measured
    # pair-miss 0.0099 at b=64 and 0.0201 at b=48, plus 0.0241 at
    # b=56/r=26 — no value fits all three exactly (duplicate agreement
    # is a DISTRIBUTION with a Dice≈0.76 tail, not a point), but 0.91
    # stays within ~2x of every measurement (0.93, the typical-pair
    # value, under-predicted the tail's misses 15x and let the search
    # cut bands straight through the F1 gate: 0.9899 measured at b=48).
    duplicate_agreement: float = 0.91,
    target_candidates_per_row: float = 20.0,
    min_band_matches: int = 2,
    target_recall: float = 0.9925,
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

    Recall per true pair (worst-case band agreement for a marginal
    duplicate): ``P(Binom(b, a_d^r) ≥ m)``.

    ``num_bands=None`` (default) *searches* the band count: every
    banded row is shuffle volume (b rows per record through the blocks
    exchange — the pipeline's dominant mover, 1.49 GB at 2M rows under
    the old fixed b=64), so the tuner picks the SMALLEST band count on
    ``_BAND_GRID`` meeting the recall target — never more bands than
    the (calibrated) model needs, never fewer than the F1 gate allows.

    The recall target itself is volume-aware: the allowed per-pair miss
    probability is ``min(1 - target_recall, max(1e-5, n/1e8))`` — a
    marginal band costs O(n) shuffle but buys a fixed per-pair recall
    increment, so small inputs (where bands are nearly free) are held
    to near-certainty (miss ≤ 1e-5: pinned small-fixture oracles stay
    exact) while large inputs settle at the ``target_recall`` floor
    (0.9925 default, derived from the F1 ≥ 0.99 gate with margin for
    the model's measured ~2x error band — see ``duplicate_agreement``).
    With the tail-calibrated model this search CUTS bands only below
    ~20k rows and ADDS them at scale (64 → 80-128 over 100k-4M rows):
    the round-4 A/B that motivated the calibration measured F1 0.9899
    (below gate) when bands were cut 64→48 at 600k.

    An explicit ``num_bands`` pins the start and only doubles upward
    (the pre-round-4 behavior) — never shrinks below what the caller
    asked for.
    """
    import math

    # The binding constraint is the block-join OUTPUT volume
    # (n²/2 · b · a_u^r skinny rows), which min_band_matches does NOT
    # reduce — it only filters what gets scored. Bound the join at 3x
    # the scored target per row; the ≥2-band rule then makes the scored
    # set essentially pure. Measured at 600k rows (A/B, local[8]): the
    # 10x budget picked r=21 (pairs stage 68 s, F1 0.99813); 3x picks
    # r=23 (pairs 20 s — 3.4x faster — F1 0.99654). The extra bit-depth
    # costs only marginal (Dice≈0.76) pairs; doubling bands instead
    # recovers them but doubles banded-row volume for ~zero net wall
    # win on this workload.
    join_budget_per_row = 3.0 * target_candidates_per_row

    def r_for(bands: int) -> int:
        frac = 2.0 * join_budget_per_row / (n_rows * bands)
        r = math.ceil(math.log(frac) / math.log(unrelated_agreement))
        return max(14, min(r, 48))

    def predicted_recall(bands: int) -> float:
        p = duplicate_agreement ** r_for(bands)
        miss = (1 - p) ** bands
        if min_band_matches >= 2:
            miss += bands * p * (1 - p) ** (bands - 1)
        return 1 - miss

    # Volume-aware miss budget (see docstring): near-certainty when
    # bands are cheap, a gate-derived ceiling when they are the
    # dominant shuffle (P=1 linkage needs recall >= 0.9803 for
    # F1 >= 0.99; the default 0.0075 ceiling leaves ~2.6x margin for
    # the model's measured error band).
    allowed_miss = min(1.0 - target_recall, max(1e-5, n_rows / 1e8))

    if num_bands is not None:
        bands = num_bands
        while bands < 512 and 1 - predicted_recall(bands) > allowed_miss:
            bands *= 2
    else:
        bands = next(
            (b for b in _BAND_GRID
             if 1 - predicted_recall(b) <= allowed_miss),
            _BAND_GRID[-1],
        )
    return {
        "num_bands": bands,
        "bits_per_band": r_for(bands),
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
    # None (default) = auto-tune from the materialized CLK count via
    # tuned_blocking(n) — spurious-candidate volume grows n² while true
    # pairs grow n, so band geometry MUST scale with input size; fixed
    # values tuned at 100k rows melt down at 10M. Set explicitly to pin.
    num_bands: Optional[int] = None
    bits_per_band: Optional[int] = None
    # Auto-tuning knob: scored-candidate budget per row (join volume is
    # bounded at 3x this; see tuned_blocking). Ignored when both band
    # settings are pinned explicitly.
    target_candidates_per_row: float = 20.0
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
    # 'hash': int64 keys via xxhash64 (deterministic; collisions
    # negligible < ~10^9 rows). 'dense': unique per-run ids via
    # monotonically_increasing_id — survives 10^12-row inputs with no
    # birthday-collision risk (cluster-id values then vary run-to-run;
    # membership does not).
    key_id_mode: str = "hash"
    # Record the log2 block-size histogram (the skew observable) in
    # metrics — one extra aggregate over the banded rows.
    block_histogram: bool = False
    # Matched-pair graphs at or below this edge count are clustered
    # driver-side (Arrow transfer, 16 B/edge → ≤64 MB at the default;
    # vectorized hook+jump labelling) instead of O(log n) rounds of
    # Spark jobs — the rounds are almost pure fixed latency at
    # small/medium scale (the clusters stage measured 0.36 scaling
    # efficiency at 2→8 cores). Above the gate the distributed
    # star-contraction runs; 0 forces it.
    cluster_driver_gate_edges: int = 4_000_000
    # Folded into stage fingerprints so a resume never reuses stages
    # computed from different input data. Defaults to a fingerprint of
    # the input's source files + schema (exact for file-backed reads;
    # callers of in-memory inputs should pass e.g. row count + version).
    input_fingerprint: Optional[str] = None


@dataclass
class LinkageResult:
    clks: DataFrame
    blocks: DataFrame
    pairs: DataFrame
    clusters: DataFrame
    metrics: Dict[str, Any] = field(default_factory=dict)
    # The config actually executed — banding resolved (never None).
    config: Optional[LinkageConfig] = None


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


def _shuffle_partitions(spark: SparkSession) -> int:
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:  # pragma: no cover - defensive
        return 200


# Partition budget for the banded-rows exchange: skinny (long, long)
# rows at ~16 B payload → ~4M rows ≈ 64 MB serialized per partition,
# comfortably in-memory through the cap join and pair self-join.
_BANDED_ROWS_PER_PARTITION = 4_000_000


def _banded_partitions(spark: SparkSession, banded_rows: int) -> int:
    """Partition count for the single banded-rows exchange.

    The explicit repartition bypasses AQE coalescing, so size it from
    the known volume (rows x bands) instead of the static
    shuffle-partitions conf: at 2M input rows x 64 bands on local[2]
    the static 8 partitions put 16M rows (~256 MB+) in each and the
    blocks stage spent its time spilling. Floor at the session conf
    (never fewer partitions than plain shuffles use), cap at 65536
    (10^12-row inputs run with explicit pair_partitions anyway)."""
    by_volume = (banded_rows + _BANDED_ROWS_PER_PARTITION - 1) // (
        _BANDED_ROWS_PER_PARTITION
    )
    return max(_shuffle_partitions(spark), min(int(by_volume), 65536))


def _input_fingerprint(df: DataFrame) -> str:
    """Best-effort identity of an input DataFrame: source files + schema.

    Exact for file-backed reads (parquet/csv paths + schema); in-memory
    inputs have no files, so callers who re-run checkpointed jobs over
    changing in-memory data should supply
    ``LinkageConfig.input_fingerprint`` themselves.
    """
    import hashlib

    try:
        files = sorted(df.inputFiles())
    except Exception:  # pragma: no cover - defensive
        files = []
    basis = json.dumps(
        {"files": files, "schema": df.schema.simpleString()},
        sort_keys=True,
    )
    return hashlib.sha256(basis.encode()).hexdigest()[:16]


def _secret_fingerprint(secret: Union[str, bytes]) -> str:
    import hashlib

    raw = secret.encode() if isinstance(secret, str) else bytes(secret)
    return hashlib.sha256(b"clkhash-spark-secret:" + raw).hexdigest()[:16]


# Stage → config fields that affect its OUTPUT (cumulative: a stage's
# fingerprint covers everything upstream of it, so changing e.g. the
# threshold invalidates pairs+clusters but keeps clks/blocks resumable).
# "kids" is the dense-mode key↔id map: persisting it as its own stage is
# what makes _kid-bearing downstream stages (blocks/pairs) safe to
# resume — monotonically_increasing_id values are per-run, so the map
# MUST be read back from the store rather than re-derived on resume.
_STAGE_FIELDS = {
    "clks": ("key_col", "feature_cols", "validate"),
    "kids": ("key_id_mode",),
    "blocks": ("num_bands", "bits_per_band", "lsh_seed", "lsh_salt",
               "max_block_size", "block_cap_mode"),
    "pairs": ("threshold", "min_band_matches"),
    "clusters": (),
}
_STAGE_ORDER = ("clks", "kids", "blocks", "pairs", "clusters")


def _fingerprint(
    config: LinkageConfig, stage: str, input_fp: str
) -> str:
    """Stage fingerprint: schema + hashed secret + input identity +
    every config field the stage's output depends on (cumulatively)."""
    import hashlib

    base_stage = stage.split("_")[0]  # clks_a/clks_b share clks params
    relevant: Dict[str, Any] = {
        "stage": stage,
        "l": config.schema.l,
        "xor_folds": config.schema.xor_folds,
        "fields": [f.identifier for f in config.schema.fields],
        "secret_sha": _secret_fingerprint(config.secret),
        "input": input_fp,
    }
    for s in _STAGE_ORDER:
        for name in _STAGE_FIELDS[s]:
            value = getattr(config, name)
            if isinstance(value, tuple):
                value = list(value)
            relevant[name] = value
        if s == base_stage:
            break
    return hashlib.sha256(
        json.dumps(relevant, sort_keys=True).encode()
    ).hexdigest()[:16]


def estimate_bit_agreement(
    clks: DataFrame,
    key_col: str = "url",
    clk_col: str = "clk",
    sample_size: int = 2000,
    num_pairs: int = 1000,
) -> float:
    """Measured per-bit agreement of *unrelated* CLK pairs.

    The banding law's leakage term is ``a_u^r`` — a 0.05 error in the
    assumed ``a_u`` mis-sizes the candidate volume by an order of
    magnitude at r≈25 (measured at 600k rows: the 0.57 textbook value
    vs ~0.62 actual cost 89M join rows instead of ~9M; shared-vocabulary
    bit correlations push agreement above the fill-only estimate
    ``1-2f(1-f)``). So: measure it.

    Sample = ``sample_size`` rows with smallest ``xxhash64(key)`` (a
    seeded, partition-independent draw — the same bounded TakeOrdered
    pattern as kmeans_centroids; the corpus is never collected). Pairs
    are formed by folding the hash-ordered sample in half, so they are
    uniform-random with respect to content; the MEDIAN pair agreement is
    reported, which tolerates up to half the sampled pairs being true
    duplicates. On a corpus so duplicated that even the median lands in
    the duplicate regime (> 0.90), the 25th-percentile agreement — the
    unrelated tail — is returned instead, with a RuntimeWarning, rather
    than letting the downstream clamp pin silently at 0.90.
    """
    import numpy as np

    rows = (
        clks.select(clk_col)
        .orderBy(F.xxhash64(F.col(key_col)))
        .limit(sample_size)
        .collect()
    )
    if len(rows) < 16:
        # Degenerate input (incl. zero rows — np.frombuffer(b"") would
        # raise before any fold): too few pairs to measure; fall back
        # to the fill-based prior.
        return 0.57
    mat = np.unpackbits(
        np.frombuffer(
            b"".join(r[clk_col] for r in rows), dtype=np.uint8
        ).reshape(len(rows), -1),
        axis=1,
    )
    half = len(mat) // 2
    a = mat[:half][: min(half, num_pairs)]
    b = mat[half : 2 * half][: min(half, num_pairs)]
    agreement = (a == b).mean(axis=1)
    med = float(np.median(agreement))
    if med > 0.90:
        import warnings

        p25 = float(np.quantile(agreement, 0.25))
        warnings.warn(
            "estimate_bit_agreement: median pair agreement "
            f"{med:.3f} is in the duplicate regime (> 0.90) — the "
            "corpus looks majority-duplicated; using the "
            f"25th-percentile agreement {p25:.3f} (the unrelated tail) "
            "for band sizing instead",
            RuntimeWarning,
            stacklevel=2,
        )
        return p25
    return med


def _resolve_banding(
    config: LinkageConfig,
    n_rows: int,
    measured_agreement: Optional[float] = None,
) -> LinkageConfig:
    """Fill in auto (None) band geometry from the materialized row count
    (and the measured unrelated-pair bit agreement, when available)."""
    import dataclasses

    if config.num_bands is not None and config.bits_per_band is not None:
        return config
    kwargs = {}
    if measured_agreement is not None:
        # Clamp to a sane regime: <0.5 means anti-correlated sampling
        # noise, >0.9 means the "unrelated" sample is mostly duplicates
        # (median swamped) — both would mis-size r wildly.
        kwargs["unrelated_agreement"] = min(max(measured_agreement, 0.50),
                                            0.90)
    tuned = tuned_blocking(
        max(int(n_rows), 1000),
        num_bands=config.num_bands,  # None → search the band grid
        min_band_matches=config.min_band_matches,
        target_candidates_per_row=config.target_candidates_per_row,
        **kwargs,
    )
    return dataclasses.replace(
        config,
        num_bands=config.num_bands or tuned["num_bands"],
        bits_per_band=config.bits_per_band or tuned["bits_per_band"],
    )


class _StageRunner:
    """Checkpoint-or-persist stage execution shared by the one- and
    two-party pipelines."""

    def __init__(
        self,
        spark: SparkSession,
        config: LinkageConfig,
        metrics: Dict[str, Any],
    ) -> None:
        self.spark = spark
        self.store = (
            StageStore(spark, config.checkpoint_dir)
            if config.checkpoint_dir
            else None
        )
        self.resume = config.resume
        self.metrics = metrics

    def run(self, name: str, fp: str, build, parents=()) -> DataFrame:
        if self.store is not None and self.resume and self.store.has(name, fp):
            self.metrics[f"{name}_resumed"] = True
            entry = self.store.manifest["stages"][name]
            self.metrics[f"{name}_rows"] = entry.get("rows")
            return self.store.read(name)
        start = time.time()
        # Tag every job this stage triggers with a job group, so the
        # event log (and the UI) can attribute shuffle bytes / task time
        # to pipeline stages — tools/linkage_job.py aggregates these
        # into per-stage shuffle counters. Restored in the finally
        # below; lazily-consumed upstream work is attributed to the
        # stage whose action forced it, which is the wall-clock-honest
        # attribution.
        sc = self.spark.sparkContext
        sc.setLocalProperty("spark.jobGroup.id", f"clk:{name}")
        sc.setLocalProperty(
            "spark.job.description", f"clkhash stage {name}"
        )
        try:
            df = self._run_stage(name, fp, build, parents, start)
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
            sc.setLocalProperty("spark.job.description", None)
        return df

    def _run_stage(
        self, name: str, fp: str, build, parents, start: float
    ) -> DataFrame:
        df = build()
        if self.store is not None:
            df = self.store.write(name, df, fp)
            entry = self.store.manifest["stages"][name]
            # Lineage: which upstream snapshots this one was derived
            # from (their fingerprints at write time) — the audit trail
            # an Iceberg snapshot chain would carry.
            entry["lineage"] = {
                p: self.store.manifest["stages"]
                .get(p, {})
                .get("fingerprint")
                for p in parents
            }
            self.store._save_manifest()
            self.metrics[f"{name}_rows"] = entry["rows"]
            self.metrics[f"{name}_seconds"] = entry["seconds"]
            self.metrics[f"{name}_rows_per_sec"] = entry["rows_per_sec"]
        else:
            # No table store: materialize AND cut lineage at the stage
            # boundary. A lazy localCheckpoint + count does both in ONE
            # job (the count action triggers the checkpoint): rows land
            # in the block manager exactly like persist, and the
            # logical plan collapses to a LogicalRDD. The truncation is
            # the point — each downstream stage's plan otherwise embeds
            # MULTIPLE copies of the whole upstream tree (the pair
            # self-join doubles it, the cluster stage's key unions
            # triple it), and Catalyst analysis + cache lookup over
            # those trees measured ~10 s of driver-only gaps per 100k-
            # row pipeline run (event-log evidence, OPTIMIZATION_r06.md
            # — e.g. a 5.2 s zero-task gap before the first clusters
            # job). Physical partitioning survives (LogicalRDD carries
            # outputPartitioning), so the blocks stage's single-
            # exchange contract still holds. On a real cluster, prefer
            # reliable snapshots via checkpoint_dir (the StageStore
            # path, which truncates the same way through parquet).
            if not getattr(df, "_clkhash_prematerialized", False):
                df = df.localCheckpoint(eager=False)
            rows = df.count()
            elapsed = time.time() - start
            self.metrics[f"{name}_rows"] = rows
            self.metrics[f"{name}_seconds"] = round(elapsed, 3)
            self.metrics[f"{name}_rows_per_sec"] = (
                round(rows / elapsed, 1) if elapsed > 0 else None
            )
        return df


def run_linkage(
    spark: SparkSession,
    pages: DataFrame,
    config: LinkageConfig,
) -> LinkageResult:
    """Run the full dedup-linkage pipeline over one table.

    Stages (each checkpointed when ``config.checkpoint_dir`` is set):
    ``clks`` → ``blocks`` → ``pairs`` → ``clusters``.
    """
    metrics: Dict[str, Any] = {}
    runner = _StageRunner(spark, config, metrics)
    input_fp = config.input_fingerprint or _input_fingerprint(pages)

    clks = runner.run(
        "clks",
        _fingerprint(config, "clks", input_fp),
        lambda: encode_clks(
            pages,
            config.schema,
            config.secret,
            key_cols=(config.key_col,),
            feature_cols=config.feature_cols,
            validate=config.validate,
        ),
    )

    # Band geometry must scale with n (candidate volume grows n²,
    # true pairs n) — resolve auto settings from the materialized count
    # AND the measured unrelated-pair bit agreement (the leakage base of
    # the law; assuming it costs an order of magnitude in join volume —
    # see estimate_bit_agreement).
    n_rows = metrics.get("clks_rows") or clks.count()
    measured_a = None
    if config.num_bands is None or config.bits_per_band is None:
        measured_a = estimate_bit_agreement(clks, key_col=config.key_col)
    config = _resolve_banding(config, n_rows, measured_a)
    metrics["banding"] = {
        "num_bands": config.num_bands,
        "bits_per_band": config.bits_per_band,
        "min_band_matches": config.min_band_matches,
        "n_rows": n_rows,
        "measured_bit_agreement": measured_a,
    }

    # Work in an int64 key domain through the shuffle-heavy middle
    # stages: banding, the pair self-join, and the CLK payload joins all
    # move (long, long) rows instead of (long, url-string) — ~2.5x less
    # shuffle volume. URL strings rejoin only on the skinny final pairs.
    # key_id_mode='hash' (xxhash64) is deterministic and collision-safe
    # below ~10^9 rows; 'dense' assigns unique per-run ids instead for
    # the 10^12-row regime.
    kid_col = "_kid"
    if config.key_id_mode == "dense":
        # Dense ids come from monotonically_increasing_id, which is
        # PER-RUN (partition-layout dependent) — so the key↔id map is
        # itself a checkpointed stage: a resumed 'blocks'/'pairs' table
        # stores _kid values and would silently join wrong against a
        # fresh assignment. Reading the map back from the store (or
        # pinning it via persist+count when there is no store) keeps
        # every _kid consumer on ONE assignment.
        def build_kids() -> DataFrame:
            return clks.select(config.key_col).withColumn(
                kid_col, F.monotonically_increasing_id()
            )

        kids = runner.run(
            "kids", _fingerprint(config, "kids", input_fp), build_kids,
            parents=("clks",),
        )
        clks_k = clks.join(kids, on=config.key_col).persist()
        ids = kids.select(kid_col, config.key_col)
    else:
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
        # ONE explicit shuffle by block_key, materialized ONCE: the
        # cap's size aggregate, the histogram, and BOTH sides of the
        # pair self-join all require hashpartitioning(block_key) —
        # deriving them from this exchange makes every one of them
        # exchange-free. Counters at 600k rows: the banded rows (37M
        # skinny rows, ~320 MB) previously re-shuffled 3x (size groupBy
        # + two join inputs = ~75M of the pairs stage's 85M shuffled
        # records); now once. persist, NOT localCheckpoint, for THIS
        # stage: under AQE a checkpoint's LogicalRDD loses the plan's
        # outputPartitioning (the adaptive plan's final partitioning is
        # unknown pre-execution), which silently re-inserted the very
        # exchanges this stage exists to eliminate — measured at 4M
        # two-party rows: a 285.6M-row size-aggregate exchange plus
        # 2×192M-row pair-join-side exchanges (event log, round-6 4M
        # ladder). Cached plans keep their partitioning (AQE leaves
        # cached-plan output partitioning unchanged by default), and
        # the logical tree above the checkpointed clks stage is tiny,
        # so the lineage-truncation motivation doesn't apply here. The
        # cap's size aggregate (its first action) materializes the
        # cache; the runner then skips a second materialization.
        blocks = blocks.repartition(
            config.pair_partitions
            or _banded_partitions(spark, n_rows * config.num_bands),
            "block_key",
        ).persist()
        capped = blocks
        if config.max_block_size:
            capped, accounting = cap_block_size(
                blocks,
                config.max_block_size,
                mode=config.block_cap_mode,
                key_cols=(kid_col,),
            )
            metrics["block_cap_accounting"] = (
                accounting.first().asDict()
            )
        if config.block_histogram:
            metrics["block_size_histogram"] = {
                int(r["log2_size"]): int(r["num_blocks"])
                for r in block_size_histogram(capped).collect()
            }
        if capped is blocks:
            # Unchanged by the cap: already checkpoint-materialized.
            capped._clkhash_prematerialized = True
        return capped

    blocks = runner.run(
        "blocks", _fingerprint(config, "blocks", input_fp), build_blocks,
        parents=("clks",),
    )
    if metrics.get("blocks_resumed"):
        # Parquet read-back loses the blocks stage's
        # hashpartitioning(block_key) — restore it so a resumed run
        # keeps the same single-exchange pairs plan as a fresh one.
        blocks = blocks.repartition(
            config.pair_partitions
            or _banded_partitions(spark, n_rows * config.num_bands),
            "block_key",
        ).persist()

    def build_pairs() -> DataFrame:
        scored = score_candidates(
            candidate_pairs(
                blocks,
                key_col=kid_col,
                # blocks is hash-partitioned by block_key (the blocks
                # stage's single exchange, restored above on resume),
                # so both self-join sides reuse it; a repartition here
                # would add the shuffle back. Caveat: when the skew cap
                # SPLITS a mega-block it rewrites block_key for those
                # rows, and Catalyst conservatively re-inserts an
                # exchange for the join — correct, just not
                # single-exchange on that (rare, capped) path.
                repartition=None,
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

    pairs = runner.run(
        "pairs", _fingerprint(config, "pairs", input_fp), build_pairs,
        parents=("clks", "blocks"),
    )

    def build_clusters() -> DataFrame:
        components = connected_components(
            pairs, id_assignment=config.key_id_mode,
            small_graph_edges=config.cluster_driver_gate_edges,
            # the materialized pairs-stage row count upper-bounds the
            # edge count, letting the driver-gate path skip its
            # materialize-and-checksum job (see connected_components)
            known_edge_bound=metrics.get("pairs_rows"),
        )
        return attach_cluster_ids(
            clks.select(config.key_col), components,
            key_col=config.key_col, id_assignment=config.key_id_mode,
        )

    clusters = runner.run(
        "clusters", _fingerprint(config, "clusters", input_fp),
        build_clusters, parents=("pairs",),
    )

    return LinkageResult(
        clks=clks, blocks=blocks, pairs=pairs, clusters=clusters,
        metrics=metrics, config=config,
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

    Stage checkpointing/metrics mirror :func:`run_linkage`: stages
    ``clks_a`` / ``clks_b`` / ``blocks`` / ``pairs`` / ``clusters``
    (plus ``kids_a``/``kids_b`` under ``key_id_mode='dense'``) resume
    from ``config.checkpoint_dir`` when fingerprints match. Banding,
    skew capping (``max_block_size``), and the pair join all run in the
    same int64 ``_kid`` domain as the single-table pipeline, with the
    party carried in the kid's sign bit.
    """
    from .operators.scoring import one_to_one_matching

    metrics: Dict[str, Any] = {}
    runner = _StageRunner(spark, config, metrics)
    fp_a = config.input_fingerprint or _input_fingerprint(party_a)
    fp_b = config.input_fingerprint or _input_fingerprint(party_b)
    fp_ab = f"{fp_a}+{fp_b}"

    def encode(df: DataFrame):
        return lambda: encode_clks(
            df,
            config.schema,
            config.secret,
            key_cols=(config.key_col,),
            feature_cols=config.feature_cols,
            validate=config.validate,
        )

    clks_a = runner.run(
        "clks_a", _fingerprint(config, "clks_a", fp_a), encode(party_a)
    )
    clks_b = runner.run(
        "clks_b", _fingerprint(config, "clks_b", fp_b), encode(party_b)
    )

    n_rows = (metrics.get("clks_a_rows") or clks_a.count()) + (
        metrics.get("clks_b_rows") or clks_b.count()
    )
    measured_a = None
    if config.num_bands is None or config.bits_per_band is None:
        measured_a = estimate_bit_agreement(
            clks_a.unionByName(clks_b), key_col=config.key_col
        )
    config = _resolve_banding(config, n_rows, measured_a)
    metrics["banding"] = {
        "num_bands": config.num_bands,
        "bits_per_band": config.bits_per_band,
        "min_band_matches": config.min_band_matches,
        "n_rows": n_rows,
        "measured_bit_agreement": measured_a,
    }

    # Same int64 key-id domain as run_linkage — the shuffle-heavy middle
    # (banding, the cross-party block join, the CLK payload joins) moves
    # (long, long) rows, never (long, url-string). The party rides in
    # the SIGN BIT of the kid (A ≥ 0, B < 0): cross-party pair selection
    # is then a free sign predicate on the unioned capped blocks, and
    # the skew cap sees both parties' contribution to a hot block at
    # once (a boilerplate mega-block is a JOINT phenomenon — capping
    # per-party would under-count its s_a × s_b pair volume).
    kid_col = "_kid"
    party_b_tag = F.lit(-(1 << 63))

    def with_kids(
        clks: DataFrame, stage: str, input_fp: str, is_b: bool
    ) -> DataFrame:
        if config.key_id_mode == "dense":
            # Per-run ids → checkpoint the key↔id map itself (see
            # run_linkage) so resumed _kid-bearing stages stay joinable.
            def build_kids() -> DataFrame:
                kid = F.monotonically_increasing_id()
                if is_b:
                    kid = kid.bitwiseOR(party_b_tag)
                return clks.select(config.key_col).withColumn(kid_col, kid)

            kids = runner.run(
                stage, _fingerprint(config, stage, input_fp), build_kids,
                parents=(stage.replace("kids", "clks"),),
            )
            return clks.join(kids, on=config.key_col).persist()
        # 63-bit deterministic hash, party tag in the sign bit.
        kid = F.shiftrightunsigned(F.xxhash64(F.col(config.key_col)), 1)
        if is_b:
            kid = kid.bitwiseOR(party_b_tag)
        return clks.withColumn(kid_col, kid)

    clks_ka = with_kids(clks_a, "kids_a", fp_a, is_b=False)
    clks_kb = with_kids(clks_b, "kids_b", fp_b, is_b=True)
    ids_a = clks_ka.select(kid_col, config.key_col)
    ids_b = clks_kb.select(kid_col, config.key_col)

    def bands(clks: DataFrame) -> DataFrame:
        return block_keys(
            clks,
            l=config.schema.l,
            num_bands=config.num_bands,
            bits_per_band=config.bits_per_band,
            seed=config.lsh_seed,
            salt=config.lsh_salt,
            key_cols=(kid_col,),
        )

    def build_blocks() -> DataFrame:
        blocks = bands(clks_ka).unionByName(bands(clks_kb))
        # Same single-exchange, single-materialization discipline as
        # run_linkage: partition the unioned bands by block_key once —
        # persist, NOT localCheckpoint, because an AQE checkpoint loses
        # outputPartitioning and re-inserts the size-aggregate and
        # cross-party join-side exchanges (see run_linkage's blocks
        # stage for the 4M-ladder measurement). The cap aggregate and
        # both sign-filtered join sides reuse the cached exchange; the
        # runner skips a second materialization when the cap changed
        # nothing.
        blocks = blocks.repartition(
            config.pair_partitions
            or _banded_partitions(spark, n_rows * config.num_bands),
            "block_key",
        ).persist()
        capped = blocks
        if config.max_block_size:
            capped, accounting = cap_block_size(
                blocks,
                config.max_block_size,
                mode=config.block_cap_mode,
                key_cols=(kid_col,),
            )
            metrics["block_cap_accounting"] = accounting.first().asDict()
        if config.block_histogram:
            metrics["block_size_histogram"] = {
                int(r["log2_size"]): int(r["num_blocks"])
                for r in block_size_histogram(capped).collect()
            }
        if capped is blocks:
            capped._clkhash_prematerialized = True
        return capped

    blocks = runner.run(
        "blocks", _fingerprint(config, "blocks", fp_ab), build_blocks,
        parents=("clks_a", "clks_b"),
    )
    if metrics.get("blocks_resumed"):
        # Restore hashpartitioning(block_key) lost in the parquet
        # read-back (see run_linkage).
        blocks = blocks.repartition(
            config.pair_partitions
            or _banded_partitions(spark, n_rows * config.num_bands),
            "block_key",
        ).persist()

    _stage_scratch: list = []

    def build_pairs() -> DataFrame:
        pairs = candidate_pairs(
            blocks.where(F.col(kid_col) >= 0),
            other=blocks.where(F.col(kid_col) < 0),
            key_col=kid_col,
            repartition=None,  # pre-partitioned in the blocks stage
            min_band_matches=config.min_band_matches,
        )
        scored = score_candidates(
            pairs, clks_ka, threshold=config.threshold,
            other_clks=clks_kb, key_col=kid_col,
        )
        # Back to user-facing keys BEFORE 1-1 matching: the mutual-best
        # tie-break orders by key, which must stay the url ordering.
        # Orientation is fixed (key_a from A, key_b from B) — no
        # re-canonicalization.
        scored = (
            scored.join(
                ids_a.select(F.col(kid_col).alias("key_a"),
                             F.col(config.key_col).alias("_url_a")),
                on="key_a",
            )
            .join(
                ids_b.select(F.col(kid_col).alias("key_b"),
                             F.col(config.key_col).alias("_url_b")),
                on="key_b",
            )
            .select(
                F.col("_url_a").alias("key_a"),
                F.col("_url_b").alias("key_b"),
                "score",
            )
        )
        if not one_to_one:
            return scored
        # Scratch cache for the mutual-best windows (two consumers);
        # released once the stage output is materialized.
        scored = scored.persist()
        _stage_scratch.append(scored)
        scored.count()
        return one_to_one_matching(scored)

    pairs_fp = _fingerprint(
        config, "pairs", f"{fp_ab}|one_to_one={one_to_one}"
    )
    matched = runner.run(
        "pairs", pairs_fp, build_pairs, parents=("clks_a", "clks_b", "blocks")
    )
    for scratch in _stage_scratch:
        scratch.unpersist()
    _stage_scratch.clear()

    def build_clusters() -> DataFrame:
        components = connected_components(
            matched, id_assignment=config.key_id_mode,
            small_graph_edges=config.cluster_driver_gate_edges,
            known_edge_bound=metrics.get("pairs_rows"),
        )
        all_keys = clks_a.select(config.key_col).union(
            clks_b.select(config.key_col)
        )
        return attach_cluster_ids(
            all_keys, components,
            key_col=config.key_col, id_assignment=config.key_id_mode,
        )

    clusters = runner.run(
        "clusters",
        _fingerprint(config, "clusters", f"{fp_ab}|one_to_one={one_to_one}"),
        build_clusters, parents=("pairs",),
    )

    return LinkageResult(
        clks=clks_a.unionByName(clks_b),
        blocks=blocks,  # kid domain, capped (party = kid sign bit)
        pairs=matched,
        clusters=clusters,
        metrics=metrics,
        config=config,
    )
