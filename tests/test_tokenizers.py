"""Tokenizer unit + property tests (mirrors the reference's hypothesis
suite, /root/reference/tests/test_comparators.py)."""

import pytest
from hypothesis import given, strategies as st

from clkhash_spark.core import (
    ExactTokenizer,
    NgramTokenizer,
    NullTokenizer,
    NumericTokenizer,
    tokenizer_from_config,
)


class TestNgram:
    def test_bigram_padding(self):
        assert list(NgramTokenizer(2).tokenize("clkhash")) == [
            " c", "cl", "lk", "kh", "ha", "as", "sh", "h "
        ]

    def test_positional_bigram(self):
        assert list(NgramTokenizer(2, positional=True).tokenize("clkhash")) == [
            "1  c", "2 cl", "3 lk", "4 kh", "5 ha", "6 as", "7 sh", "8 h "
        ]

    def test_unigram_no_padding(self):
        assert list(NgramTokenizer(1).tokenize("abc")) == ["a", "b", "c"]

    def test_empty_input(self):
        assert list(NgramTokenizer(2).tokenize("")) == []

    def test_negative_n_rejected(self):
        with pytest.raises(ValueError):
            NgramTokenizer(-1)

    @given(st.text(min_size=1, max_size=50), st.integers(1, 4),
           st.booleans())
    def test_token_count(self, word, n, positional):
        tokens = list(NgramTokenizer(n, positional).tokenize(word))
        expected = len(word) + n - 1 if n > 1 else len(word) - n + 1
        assert len(tokens) == expected

    @given(st.text(min_size=1, max_size=50), st.integers(2, 4))
    def test_tokens_have_length_n(self, word, n):
        for token in NgramTokenizer(n).tokenize(word):
            assert len(token) == n

    @given(st.text(min_size=1, max_size=50), st.integers(1, 4))
    def test_positional_indices_are_1_based_and_dense(self, word, n):
        tokens = list(NgramTokenizer(n, positional=True).tokenize(word))
        positions = [int(t.split(" ", 1)[0]) for t in tokens]
        assert positions == list(range(1, len(tokens) + 1))

    @given(st.text(min_size=1, max_size=50), st.integers(1, 4),
           st.booleans())
    def test_deterministic(self, word, n, positional):
        t = NgramTokenizer(n, positional)
        assert list(t.tokenize(word)) == list(t.tokenize(word))


class TestExact:
    def test_whole_value_single_token(self):
        assert list(ExactTokenizer().tokenize("hello world")) == ["hello world"]

    def test_empty(self):
        assert list(ExactTokenizer().tokenize("")) == []


class TestNumeric:
    def test_basic_neighbourhood(self):
        # threshold_distance=8, resolution=2: x=25 → tokens [88,96,104,112,120]
        # (worked example from the reference's NumericComparison docstring).
        tok = NumericTokenizer(8, 2)
        assert list(tok.tokenize("25")) == ["88", "96", "104", "112", "120"]

    def test_token_count(self):
        tok = NumericTokenizer(100, 5)
        assert len(list(tok.tokenize("123"))) == 11

    def test_empty(self):
        assert list(NumericTokenizer(8, 2).tokenize("")) == []

    def test_close_numbers_share_tokens(self):
        tok = NumericTokenizer(20, 3)
        a = set(tok.tokenize("100"))
        b = set(tok.tokenize("105"))
        far = set(tok.tokenize("500"))
        assert a & b
        assert not (a & far)

    @given(st.integers(-10**6, 10**6), st.integers(-10**6, 10**6))
    def test_overlap_monotone_in_distance(self, x, y):
        tok = NumericTokenizer(100, 4)
        overlap = len(set(tok.tokenize(str(x))) & set(tok.tokenize(str(y))))
        if abs(x - y) > 100 + 13:  # threshold + 1/2 quantization slack
            assert overlap == 0
        if x == y:
            assert overlap == 9

    def test_fractional_precision(self):
        tok = NumericTokenizer(0.5, 1, fractional_precision=1)
        tokens = list(tok.tokenize("1.2"))
        assert len(tokens) == 3

    def test_invalid_params(self):
        with pytest.raises(ValueError):
            NumericTokenizer(0, 2)
        with pytest.raises(ValueError):
            NumericTokenizer(8, 0)
        with pytest.raises(ValueError):
            NumericTokenizer(8, 2, fractional_precision=-1)
        with pytest.raises(ValueError):
            NumericTokenizer(0.001, 2)  # rounds to zero interval


class TestFactory:
    def test_dispatch(self):
        assert isinstance(
            tokenizer_from_config({"type": "ngram", "n": 2}), NgramTokenizer
        )
        assert isinstance(
            tokenizer_from_config({"type": "exact"}), ExactTokenizer
        )
        assert isinstance(
            tokenizer_from_config(
                {"type": "numeric", "thresholdDistance": 8, "resolution": 2}
            ),
            NumericTokenizer,
        )
        with pytest.raises(ValueError):
            tokenizer_from_config({"type": "nope"})

    def test_null_tokenizer(self):
        assert list(NullTokenizer().tokenize("anything")) == []
