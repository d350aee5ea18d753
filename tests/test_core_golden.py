"""Byte-exact golden-vector parity with the reference.

The expected base64 CLKs are the reference's own pinned regression values
(/root/reference/tests/test_clk.py:174-175) — reproducing them proves the
whole chain (HKDF → format → tokenize → doubleHash → packing) is
bit-for-bit identical.
"""

import pandas as pd
import pytest

from clkhash_spark.core import BatchEncoder, encode_record, serialize_clk

from .conftest import GOLDEN_CLK_B64, GOLDEN_ROWS


def test_scalar_encoder_matches_reference_golden(golden_schema, golden_keys):
    for row, expected in zip(GOLDEN_ROWS, GOLDEN_CLK_B64):
        packed, popcount = encode_record(row, golden_schema, golden_keys)
        assert serialize_clk(packed) == expected
        assert popcount > 0


def test_vectorized_encoder_matches_reference_golden(
    golden_schema, golden_keys
):
    encoder = BatchEncoder(golden_schema, golden_keys)
    columns = [
        pd.Series([row[i] for row in GOLDEN_ROWS]) for i in range(5)
    ]
    packed, popcounts = encoder.encode(columns)
    for i, expected in enumerate(GOLDEN_CLK_B64):
        assert serialize_clk(packed[i].tobytes()) == expected


def test_vectorized_matches_scalar_row_by_row(golden_schema, golden_keys):
    encoder = BatchEncoder(golden_schema, golden_keys)
    columns = [
        pd.Series([row[i] for row in GOLDEN_ROWS]) for i in range(5)
    ]
    packed, popcounts = encoder.encode(columns)
    for i, row in enumerate(GOLDEN_ROWS):
        expected_bytes, expected_pc = encode_record(
            row, golden_schema, golden_keys
        )
        assert packed[i].tobytes() == expected_bytes
        assert popcounts[i] == expected_pc


def test_missing_value_substitution_produces_equal_clks():
    """Sentinel 'null'→'Bob' must hash identically to literal 'Bob'
    (semantics of /root/reference/tests/test_missingValue_integration.py)."""
    from clkhash_spark.core import from_json_dict, generate_key_lists

    schema_dict = dict(
        version=3,
        clkConfig=dict(
            l=1024,
            kdf=dict(type="HKDF", hash="SHA256", keySize=64),
        ),
        features=[
            dict(
                identifier="name",
                format=dict(type="string", encoding="utf-8"),
                hashing=dict(
                    comparison=dict(type="ngram", n=2),
                    strategy=dict(bitsPerToken=20),
                    hash=dict(type="doubleHash"),
                    missingValue=dict(sentinel="null", replaceWith="Bob"),
                ),
            ),
            dict(
                identifier="age",
                format=dict(type="integer"),
                hashing=dict(
                    comparison=dict(type="ngram", n=1, positional=True),
                    strategy=dict(bitsPerToken=20),
                    hash=dict(type="doubleHash"),
                    missingValue=dict(sentinel="NA", replaceWith="42"),
                ),
            ),
        ],
    )
    schema = from_json_dict(schema_dict)
    keys = generate_key_lists(
        "secret", len(schema.fields), key_size=schema.kdf_key_size,
        salt=schema.kdf_salt, info=schema.kdf_info,
        kdf=schema.kdf_type, hash_algo=schema.kdf_hash,
    )
    with_sentinels, _ = encode_record(["null", "NA"], schema, keys)
    with_replacements, _ = encode_record(["Bob", "42"], schema, keys)
    assert with_sentinels == with_replacements


def test_xor_fold_bit_semantics():
    """Folding XORs the first half with the second, per bit
    (semantics of /root/reference/tests/test_xor_folding.py:104-148)."""
    import numpy as np

    from clkhash_spark.core import fold_xor

    rng = np.random.RandomState(7)
    bits = rng.rand(1024) > 0.5
    folded = fold_xor(bits.copy(), 1)
    assert len(folded) == 512
    assert (folded == (bits[:512] ^ bits[512:])).all()
    twice = fold_xor(bits.copy(), 2)
    assert len(twice) == 256
    assert (twice == ((bits[:512] ^ bits[512:])[:256]
                      ^ (bits[:512] ^ bits[512:])[256:])).all()
    with pytest.raises(ValueError):
        fold_xor(np.zeros(1000, dtype=bool), 4)  # 1000 not divisible by 16
