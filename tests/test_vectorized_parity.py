"""Property-based parity: the vectorized batch encoder must be
byte-identical to the scalar oracle for every field type x comparator x
strategy x hash type x xor_folds x missing-value combination."""

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from clkhash_spark.core import (
    BatchEncoder,
    encode_record,
    from_json_dict,
    generate_key_lists,
)


def build(schema_dict, secret="s3cret"):
    schema = from_json_dict(schema_dict)
    keys = generate_key_lists(
        secret, len(schema.fields), key_size=schema.kdf_key_size,
        salt=schema.kdf_salt, info=schema.kdf_info,
        kdf=schema.kdf_type, hash_algo=schema.kdf_hash,
    )
    return schema, keys


def assert_batch_matches_scalar(schema, keys, rows):
    encoder = BatchEncoder(schema, keys)
    columns = [
        pd.Series([row[i] for row in rows], dtype=object)
        for i in range(len(schema.fields))
    ]
    packed, popcounts = encoder.encode(columns)
    for i, row in enumerate(rows):
        expected_bytes, expected_pc = encode_record(row, schema, keys)
        assert packed[i].tobytes() == expected_bytes, f"row {i}: {row}"
        assert popcounts[i] == expected_pc


def make_schema(hash_type="doubleHash", strategy=None, xor_folds=0,
                comparison=None, prevent_singularity=None):
    strategy = strategy or {"bitsPerToken": 20}
    comparison = comparison or {"type": "ngram", "n": 2}
    hash_block = {"type": hash_type}
    if prevent_singularity is not None:
        hash_block["prevent_singularity"] = prevent_singularity
    return dict(
        version=3,
        clkConfig=dict(
            l=1024,
            xor_folds=xor_folds,
            kdf=dict(type="HKDF", hash="SHA256", keySize=64),
        ),
        features=[
            dict(
                identifier="text",
                format=dict(type="string", encoding="utf-8"),
                hashing=dict(
                    comparison=comparison,
                    strategy=strategy,
                    hash=hash_block,
                ),
            ),
        ],
    )


TEXTS = st.lists(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=30
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=25, deadline=None)
@given(TEXTS)
def test_double_hash_bits_per_token(texts):
    schema, keys = build(make_schema("doubleHash", {"bitsPerToken": 17}))
    assert_batch_matches_scalar(schema, keys, [[t] for t in texts])


@settings(max_examples=25, deadline=None)
@given(TEXTS)
def test_double_hash_bits_per_feature(texts):
    schema, keys = build(make_schema("doubleHash", {"bitsPerFeature": 211}))
    assert_batch_matches_scalar(schema, keys, [[t] for t in texts])


@settings(max_examples=25, deadline=None)
@given(TEXTS)
def test_blake_hash_bits_per_feature(texts):
    schema, keys = build(make_schema("blakeHash", {"bitsPerFeature": 300}))
    assert_batch_matches_scalar(schema, keys, [[t] for t in texts])


@settings(max_examples=25, deadline=None)
@given(TEXTS)
def test_blake_hash_large_k_multiple_macs(texts):
    # k > 32 forces multiple blake2b MACs per token.
    schema, keys = build(make_schema("blakeHash", {"bitsPerToken": 70}))
    assert_batch_matches_scalar(schema, keys, [[t] for t in texts])


@settings(max_examples=20, deadline=None)
@given(TEXTS, st.integers(0, 2))
def test_xor_folds(texts, folds):
    schema, keys = build(make_schema("doubleHash", xor_folds=folds))
    assert_batch_matches_scalar(schema, keys, [[t] for t in texts])


@settings(max_examples=20, deadline=None)
@given(TEXTS)
def test_positional_ngrams_and_exact(texts):
    schema, keys = build(
        make_schema(comparison={"type": "ngram", "n": 2, "positional": True})
    )
    assert_batch_matches_scalar(schema, keys, [[t] for t in texts])
    schema, keys = build(make_schema(comparison={"type": "exact"}))
    assert_batch_matches_scalar(schema, keys, [[t] for t in texts])


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(-10**9, 10**9), min_size=1, max_size=30))
def test_numeric_comparison_integer_field(values):
    schema_dict = dict(
        version=3,
        clkConfig=dict(l=1024, kdf=dict(type="HKDF")),
        features=[
            dict(
                identifier="num",
                format=dict(type="integer"),
                hashing=dict(
                    comparison=dict(
                        type="numeric", thresholdDistance=500, resolution=4
                    ),
                    strategy=dict(bitsPerToken=10),
                    hash=dict(type="doubleHash"),
                ),
            )
        ],
    )
    schema, keys = build(schema_dict)
    assert_batch_matches_scalar(schema, keys, [[str(v)] for v in values])


def test_prevent_singularity_path():
    schema, keys = build(
        make_schema("doubleHash", prevent_singularity=True)
    )
    rows = [[f"tok{i}"] for i in range(200)]
    assert_batch_matches_scalar(schema, keys, rows)


def test_nulls_encode_as_empty():
    schema, keys = build(make_schema())
    encoder = BatchEncoder(schema, keys)
    packed, popcounts = encoder.encode(
        [pd.Series([None, "abc", None], dtype=object)]
    )
    assert popcounts[0] == 0 and popcounts[2] == 0
    assert popcounts[1] > 0
    empty, _ = encode_record([""], schema, keys)
    assert packed[0].tobytes() == empty


def test_multi_field_schema_with_ignored_and_dates():
    schema_dict = dict(
        version=3,
        clkConfig=dict(
            l=512, xor_folds=1,
            kdf=dict(type="HKDF", hash="SHA512", keySize=64),
        ),
        features=[
            dict(identifier="rownum", ignored=True),
            dict(
                identifier="name",
                format=dict(type="string", encoding="utf-8"),
                hashing=dict(
                    comparison=dict(type="ngram", n=2),
                    strategy=dict(bitsPerFeature=150),
                    hash=dict(type="blakeHash"),
                ),
            ),
            dict(
                identifier="dob",
                format=dict(type="date", format="%d/%m/%Y"),
                hashing=dict(
                    comparison=dict(type="ngram", n=1, positional=True),
                    strategy=dict(bitsPerToken=25),
                    hash=dict(type="doubleHash"),
                    missingValue=dict(sentinel="", replaceWith="01/01/1900"),
                ),
            ),
        ],
    )
    schema, keys = build(schema_dict)
    rows = [
        ["0", "Jane Austen", "16/12/1775"],
        ["1", "Bob Hawke", ""],
        ["2", "Tivadar Kanizsa", "04/04/1933"],
        ["3", "", "04/04/1933"],
    ]
    assert_batch_matches_scalar(schema, keys, rows)
