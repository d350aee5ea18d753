"""Bloom-filter insertion strategies.

Determine how many bit insertions (``k``) each token of a feature value
gets. Semantics match data61/clkhash (reference: clkhash/field_formats.py:62-130):

- ``bitsPerToken``: every token inserted a constant ``k`` times.
- ``bitsPerFeature``: a fixed budget spread over the tokens; the first
  ``budget % num_tokens`` tokens receive one extra insertion (order matters,
  and duplicate tokens keep their own slot).
"""

from __future__ import annotations

from typing import Any, Dict, SupportsInt, Tuple, Union

import numpy as np


class Strategy:
    def bits_per_token(self, num_tokens: int) -> Tuple[int, ...]:
        raise NotImplementedError

    def bits_per_token_array(self, num_tokens: int) -> np.ndarray:
        """Vectorized variant returning an int64 ndarray."""
        return np.asarray(self.bits_per_token(num_tokens), dtype=np.int64)


class BitsPerToken(Strategy):
    __slots__ = ("k",)

    def __init__(self, k: int) -> None:
        self.k = int(k)

    def bits_per_token(self, num_tokens: int) -> Tuple[int, ...]:
        return (self.k,) * num_tokens

    def bits_per_token_array(self, num_tokens: int) -> np.ndarray:
        return np.full(num_tokens, self.k, dtype=np.int64)

    def __repr__(self) -> str:
        return f"BitsPerToken(k={self.k})"


class BitsPerFeature(Strategy):
    __slots__ = ("total",)

    def __init__(self, total: int) -> None:
        self.total = int(total)

    def bits_per_token(self, num_tokens: int) -> Tuple[int, ...]:
        # Keep the reference's float-division truncation exactly:
        # int(total / n) can differ from total // n only far beyond any
        # realistic bit budget, but we mirror it for strict parity.
        base = int(self.total / num_tokens)
        extra = self.total % num_tokens
        return (base + 1,) * extra + (base,) * (num_tokens - extra)

    def bits_per_token_array(self, num_tokens: int) -> np.ndarray:
        base = int(self.total / num_tokens)
        extra = self.total % num_tokens
        ks = np.full(num_tokens, base, dtype=np.int64)
        ks[:extra] += 1
        return ks

    def __repr__(self) -> str:
        return f"BitsPerFeature(total={self.total})"


def strategy_from_config(
    config: Dict[str, Union[str, SupportsInt]]
) -> Strategy:
    if "bitsPerToken" in config:
        return BitsPerToken(int(config["bitsPerToken"]))
    if "bitsPerFeature" in config:
        return BitsPerFeature(int(config["bitsPerFeature"]))
    raise ValueError(f"unknown insertion strategy: {sorted(config)}")
