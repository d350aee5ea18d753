"""CLK serialization helpers.

Canonical storage is the packed big-endian-bit byte string (Spark
``BinaryType``); the interchange format is its base64 rendering — identical
to the reference's ``base64(bitarray.tobytes())``
(reference: clkhash/serialization.py:11-23).
"""

from __future__ import annotations

import base64

import numpy as np


def serialize_clk(packed: bytes) -> str:
    """Packed CLK bytes → base64 string."""
    return base64.b64encode(packed).decode("utf-8")


def deserialize_clk(text: str) -> bytes:
    """Base64 string → packed CLK bytes."""
    return base64.b64decode(text.encode("utf-8"), validate=True)


def bits_to_bytes(bits: np.ndarray) -> bytes:
    """Bool bit vector → packed bytes (bit i → byte i//8, bit 7 - i%8)."""
    return np.packbits(np.asarray(bits, dtype=bool)).tobytes()


def bytes_to_bits(packed: bytes, l: int) -> np.ndarray:
    """Packed bytes → bool bit vector of length ``l``."""
    return np.unpackbits(np.frombuffer(packed, dtype=np.uint8))[:l].astype(bool)
