"""Scalar (single-record) CLK encoder — the in-package oracle.

This is the plain, readable implementation of the CLK bit-level contract,
used (a) as the correctness oracle for the vectorized batch encoder in
:mod:`clkhash_spark.core.vectorized`, and (b) for tiny driver-side jobs.
Bit semantics match data61/clkhash exactly (reference:
clkhash/bloomfilter.py:28-366):

- ``doubleHash``: per token ``m``, ``g_i = (HMAC-SHA1(m) + i * HMAC-MD5(m))
  mod l`` for ``i < k`` (both digests reduced mod ``l`` first). The
  non-singular variant re-hashes ``m + chr(j)`` (j = 0, 1, ...) while the
  MD5 digest is ``0 mod l``.
- ``blakeHash``: ``ceil(k/32)`` keyed blake2b MACs (salt = ``str(i)``), each
  64-byte digest read as 32 native-endian uint16s; index = ``short % l``;
  requires ``l`` to be a power of two.
- Per-field filters are OR-combined into a ``l * 2**xor_folds``-bit filter,
  then XOR-folded ``xor_folds`` times.

Bits are held in a numpy bool vector; bit ``i`` packs into byte ``i // 8``
at bit position ``7 - i % 8`` (``np.packbits`` big-endian order — identical
byte layout to ``bitarray.tobytes()`` used by the reference serializer).
"""

from __future__ import annotations

import hashlib
import hmac
import sys
from typing import Dict, List, Sequence, Tuple

import numpy as np

from .fields import Field
from .schema import Schema

# blakeHash parity with the reference's native-endian struct.unpack('32H')
# is only byte-exact on little-endian hosts; every platform Spark
# realistically runs on qualifies, but make the assumption loud.
# A hard raise, not `assert`: the guard must survive `python -O`
# (asserts are stripped exactly where this silent-divergence protection
# matters most).
_LITTLE_ENDIAN = sys.byteorder == "little"
if not _LITTLE_ENDIAN:
    raise RuntimeError(
        "clkhash_spark pins little-endian blakeHash digests; big-endian "
        "hosts would diverge from reference CLKs"
    )


def double_hash_token(
    token_bytes: bytes,
    l: int,
    key_sha1: bytes,
    key_md5: bytes,
    non_singular: bool = False,
) -> Tuple[int, int]:
    """Return ``(sha1_mod, md5_mod)`` for one token."""
    sha1_mod = (
        int.from_bytes(hmac.new(key_sha1, token_bytes, hashlib.sha1).digest(), "big")
        % l
    )
    md5_mod = (
        int.from_bytes(hmac.new(key_md5, token_bytes, hashlib.md5).digest(), "big")
        % l
    )
    if non_singular:
        suffix = 0
        while md5_mod == 0:
            digest = hmac.new(
                key_md5, token_bytes + chr(suffix).encode(), hashlib.md5
            ).digest()
            md5_mod = int.from_bytes(digest, "big") % l
            suffix += 1
    return sha1_mod, md5_mod


def double_hash_indices(
    tokens: Sequence[str],
    keys: Sequence[bytes],
    ks: Sequence[int],
    l: int,
    encoding: str,
    non_singular: bool = False,
) -> List[int]:
    """All bit indices set by the double-hash scheme for ``tokens``."""
    key_sha1, key_md5 = keys[0], keys[1]
    out: List[int] = []
    for token, k in zip(tokens, ks):
        sha1_mod, md5_mod = double_hash_token(
            token.encode(encoding), l, key_sha1, key_md5, non_singular
        )
        out.extend((sha1_mod + i * md5_mod) % l for i in range(k))
    return out


def blake_hash_token(token_bytes: bytes, k: int, key: bytes, l: int) -> List[int]:
    """Bit indices for one token under the blake2b scheme."""
    shorts: List[int] = []
    num_macs = (k + 31) // 32
    for i in range(num_macs):
        digest = hashlib.blake2b(
            token_bytes, key=key, salt=str(i).encode()
        ).digest()
        # 64-byte digest → 32 uint16 words. The reference uses native-endian
        # struct.unpack('32H', ...); we pin little-endian, which is identical
        # on every platform Spark realistically runs on (x86-64 / arm64) —
        # _LITTLE_ENDIAN is asserted at import so the assumption is explicit.
        shorts.extend(np.frombuffer(digest, dtype="<u2").tolist())
    return [shorts[i] % l for i in range(k)]


def blake_indices(
    tokens: Sequence[str],
    keys: Sequence[bytes],
    ks: Sequence[int],
    l: int,
    encoding: str,
) -> List[int]:
    if l & (l - 1) != 0:
        raise ValueError(
            f"l must be a power of two for the blake2 encoding, got {l}"
        )
    key = bytes(keys[0])
    out: List[int] = []
    for token, k in zip(tokens, ks):
        out.extend(blake_hash_token(token.encode(encoding), k, key, l))
    return out


def fold_xor(bits: np.ndarray, folds: int) -> np.ndarray:
    """XOR-fold a bool bit vector ``folds`` times (halving each time)."""
    if len(bits) % (2 ** folds) != 0:
        raise ValueError(
            f"bit length {len(bits)} is not divisible by 2**{folds}"
        )
    for _ in range(folds):
        half = len(bits) // 2
        bits = bits[:half] ^ bits[half:]
    return bits


def encode_record(
    record: Sequence[str],
    schema: Schema,
    keys: Sequence[Sequence[bytes]],
) -> Tuple[bytes, int]:
    """Encode one record into ``(packed_clk_bytes, popcount)``.

    ``record`` must supply one string per schema field (ignored fields
    included). ``keys`` is the output of
    :func:`clkhash_spark.core.kdf.generate_key_lists`.
    """
    hash_l = schema.hash_l
    bits = np.zeros(hash_l, dtype=bool)
    for value, field, field_keys in zip(record, schema.fields, keys):
        hs = field.hash_spec
        if hs is None:
            continue
        tokens = list(hs.tokenizer.tokenize(field.format_value(value)))
        if not tokens:
            continue
        ks = hs.strategy.bits_per_token(len(tokens))
        if hs.hash_type == "doubleHash":
            idx = double_hash_indices(
                tokens,
                field_keys,
                ks,
                hash_l,
                hs.encoding,
                non_singular=bool(hs.prevent_singularity),
            )
        elif hs.hash_type == "blakeHash":
            idx = blake_indices(tokens, field_keys, ks, hash_l, hs.encoding)
        else:
            raise ValueError(f"unsupported hash type {hs.hash_type!r}")
        bits[np.asarray(idx, dtype=np.int64)] = True
    bits = fold_xor(bits, schema.xor_folds)
    packed = np.packbits(bits).tobytes()
    return packed, int(bits.sum())
