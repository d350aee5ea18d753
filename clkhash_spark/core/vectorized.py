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

    __slots__ = ("key_sha1", "key_md5", "l", "non_singular", "_cache")

    def __init__(
        self, key_sha1: bytes, key_md5: bytes, l: int, non_singular: bool
    ) -> None:
        self.key_sha1 = key_sha1
        self.key_md5 = key_md5
        self.l = l
        self.non_singular = non_singular
        self._cache: Dict[bytes, Tuple[int, int]] = {}

    def hash_tokens(
        self, token_bytes_list: Sequence[bytes]
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Return ``(sha1_mods, md5_mods)`` int64 arrays, one per token."""
        n = len(token_bytes_list)
        sha1_mods = np.empty(n, dtype=np.int64)
        md5_mods = np.empty(n, dtype=np.int64)
        cache = self._cache
        l = self.l
        key_sha1, key_md5 = self.key_sha1, self.key_md5
        if len(cache) > _TOKEN_CACHE_LIMIT:
            cache.clear()
        for i, tb in enumerate(token_bytes_list):
            hit = cache.get(tb)
            if hit is None:
                s = int.from_bytes(hmac.new(key_sha1, tb, hashlib.sha1).digest(), "big") % l
                m = int.from_bytes(hmac.new(key_md5, tb, hashlib.md5).digest(), "big") % l
                if self.non_singular:
                    suffix = 0
                    while m == 0:
                        d = hmac.new(key_md5, tb + chr(suffix).encode(), hashlib.md5).digest()
                        m = int.from_bytes(d, "big") % l
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
            self.double_hasher = DoubleHashTokenHasher(
                keys[0], keys[1], hash_l, bool(hs.prevent_singularity)
            )
        elif hs.hash_type == "blakeHash":
            self.blake_hasher = BlakeTokenHasher(keys[0], hash_l)
        else:
            raise ValueError(f"unsupported hash type {hs.hash_type!r}")

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
        codes, uniques = pd.factorize(values)
        encoding = hs.encoding
        tokenize = hs.tokenizer.tokenize
        format_value = self.field.format_value
        strategy = hs.strategy

        # Tokenize each unique value once; flatten value-contiguously.
        flat_tokens: List[bytes] = []
        flat_ks: List[np.ndarray] = []
        owner_ids: List[int] = []       # unique-value index per token group
        group_starts: List[int] = []    # first flat index of each group
        for u_idx in range(len(uniques)):
            raw = uniques[u_idx]
            text = "" if raw is None else str(raw)
            tokens = tokenize(format_value(text))
            if not tokens:
                continue
            group_starts.append(len(flat_tokens))
            owner_ids.append(u_idx)
            flat_tokens.extend(t.encode(encoding) for t in tokens)
            flat_ks.append(strategy.bits_per_token_array(len(tokens)))
        if not flat_tokens:
            return
        ks_arr = np.concatenate(flat_ks)

        # Deduplicate (token, k) pairs across the batch: the bit mask of a
        # token depends only on the token and its k.
        token_codes, token_uniques = pd.factorize(
            pd.Series(flat_tokens, dtype=object)
        )
        pair_key = token_codes.astype(np.int64) * (ks_arr.max() + 1) + ks_arr
        pair_uniq, pair_inverse = np.unique(pair_key, return_inverse=True)
        first_flat = np.full(len(pair_uniq), -1, dtype=np.int64)
        # first occurrence of each unique pair
        seen_order = np.argsort(pair_inverse, kind="stable")
        boundaries = np.searchsorted(
            pair_inverse[seen_order], np.arange(len(pair_uniq))
        )
        first_flat = seen_order[boundaries]
        pair_tokens = [flat_tokens[i] for i in first_flat]
        pair_ks = ks_arr[first_flat]

        pair_masks = self._pair_masks(pair_tokens, pair_ks)

        # Per-unique-value mask: OR the masks of its tokens (contiguous
        # groups → reduceat).
        flat_masks = pair_masks[pair_inverse]
        value_masks = np.bitwise_or.reduceat(
            flat_masks, np.asarray(group_starts, dtype=np.int64), axis=0
        )

        # Scatter to unique-value slots, then gather per row.
        u_masks = np.zeros((len(uniques), self.hash_l >> 3), dtype=np.uint8)
        u_masks[np.asarray(owner_ids, dtype=np.int64)] = value_masks
        valid = codes >= 0  # factorize gives -1 for nulls
        if valid.all():
            acc |= u_masks[codes]
        else:
            acc[valid] |= u_masks[codes[valid]]


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
            acc = acc[:, :half] ^ acc[:, half:]
        popcounts = popcount_bytes(acc)
        return acc, popcounts

    def encode_to_lists(
        self, columns: Sequence[pd.Series]
    ) -> Tuple[List[bytes], np.ndarray]:
        """Like :meth:`encode` but yields per-row ``bytes`` for BinaryType."""
        packed, popcounts = self.encode(columns)
        return [row.tobytes() for row in packed], popcounts
