"""Vectorized batch CLK encoder — the executor hot path.

Encodes an Arrow batch of records into packed CLKs + popcounts with numpy,
producing output byte-identical to :func:`clkhash_spark.core.hashing.
encode_record` (which in turn matches the reference's pinned golden
vectors; reference semantics: clkhash/bloomfilter.py:28-366).

Vectorization strategy (replaces the reference's ``lru_cache`` memoization,
reference: clkhash/bloomfilter.py:28-29) — everything operates on *packed*
uint8 masks (``hash_l / 8`` bytes), never per-bit row loops:

1. Per field, factorize the column → format/tokenize each *unique value*
   once.
2. Deduplicate ``(token, k)`` pairs across the whole batch; hash each pair
   once (with a bounded cross-batch digest cache per worker) and render it
   to a packed byte mask.
3. OR the token masks of each unique value with ``bitwise_or.reduceat``
   (token masks are laid out value-contiguously), then gather per-row with
   one fancy index and OR into the batch accumulator.
4. XOR-fold in the byte domain; popcount via a 256-entry LUT.

The only Python-level loops left are over unique values (tokenize) and
unique uncached tokens (one ``hmac``/``blake2b`` call each, C-speed).
"""

from __future__ import annotations

import hashlib
import hmac
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from .fields import Field
from .schema import Schema

# Bounded per-worker token caches (analog of the reference's lru_cache).
_TOKEN_CACHE_LIMIT = 1 << 16

# Per-worker-PROCESS hasher registry: a reused Python worker
# (spark.python.worker.reuse, default on) runs many tasks, but the
# BatchEncoder — and with it every token-digest cache — was rebuilt per
# task, so the second encode stage over the same keys re-hashed every
# token it had already seen. Keying the hasher by its full config
# (including the derived key bytes, so a different secret can never hit
# a stale entry) keeps the caches worker-lifetime. PID-guarded: a
# forked worker starts clean. This only memoizes token→digest within
# one Spark application's workers — nothing persists across runs.
_WORKER_HASHERS: Dict[tuple, object] = {}
_WORKER_PID: Optional[int] = None


def _worker_hasher(key: tuple, build):
    global _WORKER_PID
    import os

    pid = os.getpid()
    if _WORKER_PID != pid:
        _WORKER_HASHERS.clear()
        _WORKER_PID = pid
    hasher = _WORKER_HASHERS.get(key)
    if hasher is None:
        hasher = _WORKER_HASHERS[key] = build()
    return hasher

# Byte → number of set bits.
_POPCOUNT_LUT = np.unpackbits(
    np.arange(256, dtype=np.uint8)[:, None], axis=1
).sum(axis=1).astype(np.uint8)


def popcount_bytes(packed: np.ndarray) -> np.ndarray:
    """Row-wise popcount of a ``[N, W]`` uint8 matrix → int32 vector."""
    return _POPCOUNT_LUT[packed].sum(axis=1, dtype=np.int32)


def _pack_indices(indices: np.ndarray, rows: np.ndarray, num_rows: int,
                  l: int) -> np.ndarray:
    """Set bit ``indices[i]`` in row ``rows[i]`` of a packed uint8 matrix.

    Big-endian bit order within each byte (``np.packbits`` convention,
    matching ``bitarray.tobytes()``).
    """
    masks = np.zeros((num_rows, l >> 3), dtype=np.uint8)
    byte_pos = indices >> 3
    bit_val = (np.uint8(0x80) >> (indices & 7)).astype(np.uint8)
    np.bitwise_or.at(masks, (rows, byte_pos), bit_val)
    return masks


class DoubleHashTokenHasher:
    """Caches ``token_bytes → (sha1 % l, md5 % l)`` for one field config."""

    __slots__ = ("key_sha1", "key_md5", "l", "non_singular", "_cache",
                 "_tmpl_sha1", "_tmpl_md5")

    def __init__(
        self, key_sha1: bytes, key_md5: bytes, l: int, non_singular: bool
    ) -> None:
        self.key_sha1 = key_sha1
        self.key_md5 = key_md5
        self.l = l
        self.non_singular = non_singular
        self._cache: Dict[bytes, Tuple[int, int]] = {}
        # Keyed HMAC templates, cloned per token: hmac.new() re-derives
        # the padded key block on every call; copy() of a keyed-but-
        # empty template skips that (measured 0.21 s → 0.13 s per 34k
        # token pairs — the hashing loop is ~40% of encode CPU).
        # Byte-identical digests (same key, same message).
        self._tmpl_sha1 = hmac.new(key_sha1, digestmod=hashlib.sha1)
        self._tmpl_md5 = hmac.new(key_md5, digestmod=hashlib.md5)

    def hash_tokens(
        self, token_bytes_list: Sequence[bytes]
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Return ``(sha1_mods, md5_mods)`` int64 arrays, one per token."""
        n = len(token_bytes_list)
        sha1_mods = np.empty(n, dtype=np.int64)
        md5_mods = np.empty(n, dtype=np.int64)
        cache = self._cache
        l = self.l
        tmpl_sha1, tmpl_md5 = self._tmpl_sha1, self._tmpl_md5
        if len(cache) > _TOKEN_CACHE_LIMIT:
            cache.clear()
        for i, tb in enumerate(token_bytes_list):
            hit = cache.get(tb)
            if hit is None:
                h = tmpl_sha1.copy()
                h.update(tb)
                s = int.from_bytes(h.digest(), "big") % l
                h = tmpl_md5.copy()
                h.update(tb)
                m = int.from_bytes(h.digest(), "big") % l
                if self.non_singular:
                    suffix = 0
                    while m == 0:
                        h = tmpl_md5.copy()
                        h.update(tb + chr(suffix).encode())
                        m = int.from_bytes(h.digest(), "big") % l
                        suffix += 1
                hit = (s, m)
                cache[tb] = hit
            sha1_mods[i] = hit[0]
            md5_mods[i] = hit[1]
        return sha1_mods, md5_mods


class BlakeTokenHasher:
    """Caches ``(token_bytes, num_macs) → uint16 shorts`` for one field."""

    __slots__ = ("key", "l", "_cache")

    def __init__(self, key: bytes, l: int) -> None:
        if l & (l - 1) != 0:
            raise ValueError(
                f"l must be a power of two for the blake2 encoding, got {l}"
            )
        self.key = bytes(key)
        self.l = l
        self._cache: Dict[Tuple[bytes, int], np.ndarray] = {}

    def shorts_for(self, token_bytes: bytes, k: int) -> np.ndarray:
        num_macs = (k + 31) // 32
        cache_key = (token_bytes, num_macs)
        shorts = self._cache.get(cache_key)
        if shorts is None:
            if len(self._cache) > _TOKEN_CACHE_LIMIT:
                self._cache.clear()
            parts = [
                hashlib.blake2b(
                    token_bytes, key=self.key, salt=str(i).encode()
                ).digest()
                for i in range(num_macs)
            ]
            # Native-endian '32H' in the reference; pinned little-endian
            # here (identical on x86-64/arm64).
            shorts = np.frombuffer(b"".join(parts), dtype="<u2").astype(np.int64)
            self._cache[cache_key] = shorts
        return shorts


class FieldEncoder:
    """Per-field encoder state, built once per worker and reused per batch."""

    __slots__ = ("field", "hash_l", "double_hasher", "blake_hasher")

    def __init__(self, field: Field, keys: Sequence[bytes], hash_l: int) -> None:
        self.field = field
        self.hash_l = hash_l
        hs = field.hash_spec
        self.double_hasher: Optional[DoubleHashTokenHasher] = None
        self.blake_hasher: Optional[BlakeTokenHasher] = None
        if hs is None:
            return
        if hash_l % 8 != 0:
            raise ValueError(f"hash length {hash_l} must be a multiple of 8")
        if hs.hash_type == "doubleHash":
            non_singular = bool(hs.prevent_singularity)
            self.double_hasher = _worker_hasher(
                ("double", bytes(keys[0]), bytes(keys[1]), hash_l,
                 non_singular),
                lambda: DoubleHashTokenHasher(
                    keys[0], keys[1], hash_l, non_singular
                ),
            )
        elif hs.hash_type == "blakeHash":
            self.blake_hasher = _worker_hasher(
                ("blake", bytes(keys[0]), hash_l),
                lambda: BlakeTokenHasher(keys[0], hash_l),
            )
        else:
            raise ValueError(f"unsupported hash type {hs.hash_type!r}")

    def _generic_flatten(self, uniques: np.ndarray, hs):
        """Tokenize each unique value in Python (exact/numeric paths)."""
        encoding = hs.encoding
        tokenize = hs.tokenizer.tokenize
        format_value = self.field.format_value
        strategy = hs.strategy

        flat_tokens: List[bytes] = []
        flat_ks: List[np.ndarray] = []
        owner_ids: List[int] = []       # unique-value index per token group
        group_starts: List[int] = []    # first flat index of each group
        for u_idx in range(len(uniques)):
            tokens = tokenize(format_value(str(uniques[u_idx])))
            if not tokens:
                continue
            group_starts.append(len(flat_tokens))
            owner_ids.append(u_idx)
            flat_tokens.extend(t.encode(encoding) for t in tokens)
            flat_ks.append(strategy.bits_per_token_array(len(tokens)))
        if not flat_tokens:
            return None
        token_codes, token_uniques = pd.factorize(
            pd.Series(flat_tokens, dtype=object)  # bytes: NUL-safe table
        )
        return (
            token_codes.astype(np.int64),
            list(token_uniques),
            np.concatenate(flat_ks),
            np.asarray(owner_ids, dtype=np.int64),
            np.asarray(group_starts, dtype=np.int64),
        )

    def _ngram_flatten(self, uniques: np.ndarray, hs):
        """Vectorized n-gram tokenization of all unique values at once.

        Builds one UTF-32 buffer of the padded values, takes numpy sliding
        windows, and deduplicates windows (+ position for positional
        n-grams) BEFORE any Python string is created — only distinct
        tokens are ever materialized/encoded. ~5-10x faster than the
        per-token Python loop for text-heavy fields.
        """
        n = hs.tokenizer.n
        positional = hs.tokenizer.positional
        encoding = hs.encoding
        format_value = self.field.format_value
        strategy = hs.strategy
        pad = " " * (n - 1) if n > 1 else ""

        pieces: List[str] = []
        counts: List[int] = []
        owner_ids: List[int] = []
        for u_idx in range(len(uniques)):
            formatted = format_value(str(uniques[u_idx]))
            if not formatted:
                continue
            piece = pad + formatted + pad
            pieces.append(piece)
            counts.append(len(piece) - n + 1)
            owner_ids.append(u_idx)
        if not pieces:
            return None

        counts_arr = np.asarray(counts, dtype=np.int64)
        lengths = counts_arr + (n - 1)
        piece_offsets = np.concatenate(
            ([0], np.cumsum(lengths)[:-1])
        )
        buf = np.frombuffer(
            "".join(pieces).encode("utf-32-le"), dtype=np.uint32
        )
        total = int(counts_arr.sum())
        group_starts = np.concatenate(([0], np.cumsum(counts_arr)[:-1]))
        # Window start index of every token: per-piece ramp + offset.
        ramp = np.arange(total, dtype=np.int64) - np.repeat(
            group_starts, counts_arr
        )
        starts = np.repeat(piece_offsets, counts_arr) + ramp
        # Dedup windows without materializing per-token arrays when the
        # text is 8-bit (ASCII/Latin-1 — the overwhelming web-text case)
        # and the whole window fits one int64: pack chars (and position)
        # into a single key, factorize once. Fallback: iterated int64
        # factorize over window columns — exact because
        # codes * 2^32 + column < 2^54 for any realistic batch.
        max_char = int(buf.max()) if buf.size else 0
        pos_bits = int(counts_arr.max()).bit_length() + 1 if positional else 0
        if max_char < 256 and 8 * n + pos_bits <= 63:
            wide_buf = buf.astype(np.int64)
            packed = np.zeros(len(buf) - n + 1, dtype=np.int64)
            for j in range(n):
                packed |= wide_buf[j:len(wide_buf) - n + 1 + j] << (8 * j)
            keys = packed[starts]
            if positional:
                keys = keys | ((ramp + 1) << (8 * n))
            token_codes, _ = pd.factorize(keys)
        else:
            windows = np.lib.stride_tricks.sliding_window_view(buf, n)[
                starts
            ]
            flat = np.ascontiguousarray(windows)
            # Token identity = (position,) + chars for positional grams.
            token_codes = (
                pd.factorize((ramp + 1))[0].astype(np.int64)
                if positional
                else None
            )
            for col in range(flat.shape[1]):
                col_arr = flat[:, col].astype(np.int64)
                if token_codes is None:
                    token_codes, _ = pd.factorize(col_arr)
                else:
                    token_codes, _ = pd.factorize(
                        token_codes.astype(np.int64) * (1 << 32) + col_arr
                    )
        num_tokens = int(token_codes.max()) + 1
        # First occurrence per code: factorize assigns codes in first-
        # appearance order, so a reversed fancy write leaves the earliest
        # index as the survivor.
        first_occ = np.empty(num_tokens, dtype=np.int64)
        first_occ[token_codes[::-1]] = np.arange(
            len(token_codes) - 1, -1, -1, dtype=np.int64
        )
        token_uniques: List[bytes] = []
        for t in first_occ:
            start = int(starts[t])
            chars = buf[start:start + n].tobytes().decode("utf-32-le")
            if positional:
                text = f"{int(ramp[t]) + 1} {chars}"
            else:
                text = chars
            token_uniques.append(text.encode(encoding))

        # ks per token: BitsPerToken is constant; BitsPerFeature depends
        # on each value's token count (first residue tokens get k+1).
        from .strategies import BitsPerToken

        if isinstance(strategy, BitsPerToken):
            ks_arr = np.full(total, strategy.k, dtype=np.int64)
        else:
            ks_arr = np.concatenate(
                [
                    strategy.bits_per_token_array(int(c))
                    for c in counts_arr
                ]
            )
        return (
            token_codes.astype(np.int64),
            token_uniques,
            ks_arr,
            np.asarray(owner_ids, dtype=np.int64),
            group_starts,
        )

    def _pair_masks(
        self, pair_tokens: List[bytes], pair_ks: np.ndarray
    ) -> np.ndarray:
        """Packed byte mask per unique ``(token, k)`` pair."""
        l = self.hash_l
        num_pairs = len(pair_tokens)
        if self.double_hasher is not None:
            sha1_mods, md5_mods = self.double_hasher.hash_tokens(pair_tokens)
            total = int(pair_ks.sum())
            starts = np.cumsum(pair_ks) - pair_ks
            ramp = np.arange(total, dtype=np.int64) - np.repeat(starts, pair_ks)
            indices = (
                np.repeat(sha1_mods, pair_ks)
                + ramp * np.repeat(md5_mods, pair_ks)
            ) % l
            rows = np.repeat(
                np.arange(num_pairs, dtype=np.int64), pair_ks
            )
        else:
            assert self.blake_hasher is not None
            shorts_for = self.blake_hasher.shorts_for
            idx_parts: List[np.ndarray] = []
            for tb, k in zip(pair_tokens, pair_ks):
                k = int(k)
                idx_parts.append(shorts_for(tb, k)[:k] % l)
            indices = np.concatenate(idx_parts) if idx_parts else np.empty(0, np.int64)
            rows = np.repeat(np.arange(num_pairs, dtype=np.int64), pair_ks)
        return _pack_indices(indices, rows, num_pairs, l)

    def set_bits(self, values: pd.Series, acc: np.ndarray) -> None:
        """OR this field's packed mask into ``acc`` (``[N, hash_l/8]`` u8)."""
        hs = self.field.hash_spec
        if hs is None:
            return
        # np.unique, NOT pd.factorize: pandas' StringHashTable hashes
        # C-strings and silently collapses values containing NUL bytes
        # ('' and '\x00' become one unique — found by hypothesis).
        # Nulls are treated as '' (so missing-value sentinels apply).
        arr = values.fillna("").to_numpy(dtype=object)
        uniques, codes = np.unique(arr, return_inverse=True)

        from .comparators import NgramTokenizer

        if isinstance(hs.tokenizer, NgramTokenizer):
            flattened = self._ngram_flatten(uniques, hs)
        else:
            flattened = self._generic_flatten(uniques, hs)
        if flattened is None:
            return
        token_codes, token_uniques, ks_arr, owner_ids, group_starts = (
            flattened
        )

        # Deduplicate (token, k) pairs across the batch: the bit mask of a
        # token depends only on the token and its k. Hash-based factorize
        # (no sort); reversed fancy write recovers first occurrences.
        pair_key = token_codes * (int(ks_arr.max()) + 1) + ks_arr
        pair_inverse, _ = pd.factorize(pair_key)
        num_pairs = int(pair_inverse.max()) + 1
        first_flat = np.empty(num_pairs, dtype=np.int64)
        first_flat[pair_inverse[::-1]] = np.arange(
            len(pair_inverse) - 1, -1, -1, dtype=np.int64
        )
        pair_tokens = [token_uniques[token_codes[i]] for i in first_flat]
        pair_ks = ks_arr[first_flat]

        avg_k = float(ks_arr.mean())
        if avg_k <= 8.0:
            # Low-k path (typical for bitsPerFeature over long text:
            # k per token is 1-2): scatter individual bit indices into a
            # per-unique-value bool matrix. Memory traffic is
            # O(sum(k) + U*l/8) — an order of magnitude below the mask
            # path's O(tokens * l/8), which saturates DRAM bandwidth when
            # 32 workers run side by side.
            u_bits = self._scatter_bits(
                pair_tokens, pair_ks, pair_inverse, group_starts,
                owner_ids, len(uniques),
            )
            u_masks = np.packbits(u_bits, axis=1)
            wide = (self.hash_l >> 3) % 8 == 0
        else:
            # High-k path (e.g. bitsPerToken=30 PII fields): one packed
            # mask per distinct (token, k) pair amortizes k bit-sets into
            # l/64 word ops; combine per value with reduceat.
            pair_masks = self._pair_masks(pair_tokens, pair_ks)
            width_bytes = self.hash_l >> 3
            wide = width_bytes % 8 == 0
            if wide:
                pair_masks = pair_masks.view(np.uint64)
            flat_masks = pair_masks[pair_inverse]
            value_masks = np.bitwise_or.reduceat(
                flat_masks, np.asarray(group_starts, dtype=np.int64),
                axis=0,
            )
            u_masks = np.zeros(
                (len(uniques), value_masks.shape[1]),
                dtype=value_masks.dtype,
            )
            u_masks[np.asarray(owner_ids, dtype=np.int64)] = value_masks

        if wide and u_masks.dtype == np.uint8:
            u_masks = u_masks.view(np.uint64)
        acc_view = acc.view(np.uint64) if wide else acc
        acc_view |= u_masks[codes]

    def _scatter_bits(
        self,
        pair_tokens: List[bytes],
        pair_ks: np.ndarray,
        pair_inverse: np.ndarray,
        group_starts: np.ndarray,
        owner_ids: np.ndarray,
        num_uniques: int,
    ) -> np.ndarray:
        """Bool bit matrix [num_uniques, hash_l] via direct index scatter."""
        l = self.hash_l
        max_k = int(pair_ks.max())
        num_pairs = len(pair_tokens)
        # Padded per-pair bit-index table [P, max_k].
        padded = np.zeros((num_pairs, max_k), dtype=np.int64)
        if self.double_hasher is not None:
            sha1_mods, md5_mods = self.double_hasher.hash_tokens(pair_tokens)
            ramp = np.arange(max_k, dtype=np.int64)
            padded = (sha1_mods[:, None] + ramp[None, :] * md5_mods[:, None]) % l
        else:
            assert self.blake_hasher is not None
            shorts_for = self.blake_hasher.shorts_for
            for p, (tb, k) in enumerate(zip(pair_tokens, pair_ks)):
                k = int(k)
                padded[p, :k] = shorts_for(tb, k)[:k] % l
        valid = np.arange(max_k, dtype=np.int64)[None, :] < pair_ks[:, None]

        # Owner (unique-value slot) of every flat token.
        total = len(pair_inverse)
        group_sizes = np.diff(np.append(group_starts, total))
        owner_per_token = np.repeat(
            np.asarray(owner_ids, dtype=np.int64), group_sizes
        )

        flat_bits = padded[pair_inverse]          # [T, max_k]
        flat_valid = valid[pair_inverse]          # [T, max_k]
        rows = np.broadcast_to(
            owner_per_token[:, None], flat_bits.shape
        )[flat_valid]
        bits = flat_bits[flat_valid]
        u_bits = np.zeros((num_uniques, l), dtype=bool)
        u_bits[rows, bits] = True
        return u_bits


class BatchEncoder:
    """Encodes pandas batches of records into packed CLKs + popcounts.

    Construct once per worker/partition (it carries token caches), then call
    :meth:`encode` per Arrow batch.
    """

    def __init__(
        self, schema: Schema, keys: Sequence[Sequence[bytes]]
    ) -> None:
        self.schema = schema
        hash_l = schema.hash_l
        if hash_l % 8 != 0 or (hash_l >> schema.xor_folds) % 8 != 0:
            raise ValueError(
                "hash length and folded length must be byte-aligned; got "
                f"l={schema.l}, xor_folds={schema.xor_folds}"
            )
        self.field_encoders = [
            FieldEncoder(field, field_keys, hash_l)
            for field, field_keys in zip(schema.fields, keys)
        ]

    def encode(
        self, columns: Sequence[pd.Series]
    ) -> Tuple[np.ndarray, np.ndarray]:
        """``columns[i]`` is the data for schema field ``i``.

        Returns ``(packed, popcounts)``: a ``[N, l/8]`` uint8 matrix and an
        int32 vector.
        """
        n = len(columns[0]) if columns else 0
        acc = np.zeros((n, self.schema.hash_l >> 3), dtype=np.uint8)
        for series, encoder in zip(columns, self.field_encoders):
            encoder.set_bits(series, acc)
        for _ in range(self.schema.xor_folds):
            half = acc.shape[1] >> 1
            if half % 8 == 0:  # fold in uint64 lanes when byte-aligned
                wide = acc.view(np.uint64)
                wide_half = wide.shape[1] >> 1
                acc = (wide[:, :wide_half] ^ wide[:, wide_half:]).view(
                    np.uint8
                )
            else:
                acc = acc[:, :half] ^ acc[:, half:]
        popcounts = popcount_bytes(acc)
        return acc, popcounts

    def encode_to_lists(
        self, columns: Sequence[pd.Series]
    ) -> Tuple[List[bytes], np.ndarray]:
        """Like :meth:`encode` but yields per-row ``bytes`` for BinaryType."""
        packed, popcounts = self.encode(columns)
        return [row.tobytes() for row in packed], popcounts
