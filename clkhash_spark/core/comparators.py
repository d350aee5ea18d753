"""Tokenizers ("comparison techniques") for CLK encoding.

Semantics match data61/clkhash (reference: clkhash/comparators.py:22-217):

- ``ngram``: pad with ``n-1`` spaces on both ends when ``n > 1``; positional
  variant prefixes the 1-indexed position as ``"{i} "``; the empty string
  yields no tokens.
- ``exact``: the whole value as a single token; empty string yields none.
- ``numeric``: the Vatsalan/Christen neighbourhood encoding — quantize to a
  grid of ``threshold_distance`` (scaled by ``10**fractional_precision``),
  emit ``2*resolution + 1`` integer-string tokens spaced
  ``distance_interval`` apart.
- ``none``: no tokens (ignored fields).

These run on the driver for config purposes and inside Arrow batches on
executors; they are deliberately dependency-free.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple


class Tokenizer:
    """Base tokenizer: maps a formatted string value to a tuple of tokens."""

    def tokenize(self, word: str) -> Tuple[str, ...]:
        raise NotImplementedError


class NgramTokenizer(Tokenizer):
    __slots__ = ("n", "positional")

    def __init__(self, n: int, positional: bool = False) -> None:
        if n < 0:
            raise ValueError("n in n-gram must be non-negative")
        self.n = n
        self.positional = bool(positional)

    def tokenize(self, word: str) -> Tuple[str, ...]:
        if not word:
            return ()
        n = self.n
        if n > 1:
            pad = " " * (n - 1)
            word = pad + word + pad
        count = len(word) - n + 1
        if self.positional:
            return tuple(
                f"{pos + 1} {word[pos:pos + n]}" for pos in range(count)
            )
        return tuple(word[pos:pos + n] for pos in range(count))

    def __repr__(self) -> str:
        return f"NgramTokenizer(n={self.n}, positional={self.positional})"


class ExactTokenizer(Tokenizer):
    def tokenize(self, word: str) -> Tuple[str, ...]:
        return (word,) if word else ()

    def __repr__(self) -> str:
        return "ExactTokenizer()"


class NumericTokenizer(Tokenizer):
    """Neighbourhood tokenizer for numeric similarity.

    Values are scaled to integers (``10**fractional_precision``), multiplied
    by ``2*resolution``, snapped to the nearest multiple of
    ``distance_interval`` (ties round up), and expanded to the
    ``2*resolution + 1`` surrounding grid points.
    """

    __slots__ = ("distance_interval", "resolution", "fractional_precision")

    def __init__(
        self,
        threshold_distance: float,
        resolution: int,
        fractional_precision: int = 0,
    ) -> None:
        if not threshold_distance > 0:
            raise ValueError(
                f"threshold_distance must be positive, got {threshold_distance}"
            )
        if resolution < 1:
            raise ValueError(f"resolution must be >= 1, got {resolution}")
        if fractional_precision < 0:
            raise ValueError(
                f"fractional_precision must be >= 0, got {fractional_precision}"
            )
        self.distance_interval = int(
            round(threshold_distance * 10 ** fractional_precision)
        )
        if self.distance_interval == 0:
            raise ValueError(
                "not enough fractional precision to encode threshold_distance"
            )
        self.resolution = resolution
        self.fractional_precision = fractional_precision

    def tokenize(self, word: str) -> Tuple[str, ...]:
        if not word:
            return ()
        fp = self.fractional_precision
        try:
            # Integer fast path keeps full precision.
            v = int(word, base=10)
            if fp > 0:
                v *= 10 ** fp
        except ValueError:
            as_float = float(word)
            v = int(round(as_float * 10 ** fp)) if fp > 0 else int(as_float)
        v *= 2 * self.resolution
        di = self.distance_interval
        residue = v % di
        if residue != 0:
            if residue < di / 2:
                v -= residue
            else:
                v += di - residue
        return tuple(
            str(v + i * di)
            for i in range(-self.resolution, self.resolution + 1)
        )

    def __repr__(self) -> str:
        return (
            f"NumericTokenizer(distance_interval={self.distance_interval}, "
            f"resolution={self.resolution}, "
            f"fractional_precision={self.fractional_precision})"
        )


class NullTokenizer(Tokenizer):
    """Tokenizer for ignored fields — always yields nothing."""

    def tokenize(self, word: str) -> Tuple[str, ...]:
        return ()

    def __repr__(self) -> str:
        return "NullTokenizer()"


def tokenizer_from_config(config: Dict[str, Any]) -> Tokenizer:
    """Build a tokenizer from a ``comparison`` JSON config block."""
    kind = config.get("type")
    if kind == "ngram":
        return NgramTokenizer(
            config.get("n", -1), bool(config.get("positional", False))
        )
    if kind == "exact":
        return ExactTokenizer()
    if kind == "numeric":
        return NumericTokenizer(
            threshold_distance=config.get("thresholdDistance", -1),
            resolution=config.get("resolution", -1),
            fractional_precision=config.get("fractional_precision", 0),
        )
    raise ValueError(f"unsupported comparison type: {kind!r}")
