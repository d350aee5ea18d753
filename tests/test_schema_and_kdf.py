"""Schema loading/upgrading/validation + key derivation tests
(mirrors /root/reference/tests/test_schema.py and test_key_derivation.py)."""

import pytest
from hypothesis import given, strategies as st

from clkhash_spark.core import (
    BitsPerFeature,
    BitsPerToken,
    SchemaError,
    from_json_dict,
    generate_key_lists,
    hkdf,
    strategy_from_config,
)
from clkhash_spark.core.schema import upgrade_to_latest, validate_schema_dict

from .conftest import GOLDEN_SCHEMA_V1


class TestUpgrades:
    def test_v1_weight_becomes_bits_per_token(self):
        v3 = upgrade_to_latest(GOLDEN_SCHEMA_V1)
        assert v3["version"] == 3
        ks = [
            f["hashing"]["strategy"]["bitsPerToken"] for f in v3["features"]
        ]
        # global k=30; weights 2, 1, .5, 1, 1
        assert ks == [60, 30, 15, 30, 30]

    def test_v1_zero_weight_becomes_ignored(self):
        doc = {
            "version": 1,
            "clkConfig": {
                "l": 1024,
                "k": 30,
                "hash": {"type": "doubleHash"},
                "kdf": {"type": "HKDF"},
            },
            "features": [
                {
                    "identifier": "x",
                    "format": {"type": "string", "encoding": "utf-8"},
                    "hashing": {"ngram": 2, "weight": 0},
                }
            ],
        }
        v3 = upgrade_to_latest(doc)
        assert v3["features"][0] == {"identifier": "x", "ignored": True}

    def test_v2_numbits_becomes_bits_per_feature(self):
        doc = {
            "version": 2,
            "clkConfig": {"l": 1024, "kdf": {"type": "HKDF"}},
            "features": [
                {
                    "identifier": "x",
                    "format": {"type": "string", "encoding": "utf-8"},
                    "hashing": {
                        "ngram": 2,
                        "positional": True,
                        "strategy": {"numBits": 200},
                        "hash": {"type": "blakeHash"},
                    },
                }
            ],
        }
        v3 = upgrade_to_latest(doc)
        hashing = v3["features"][0]["hashing"]
        assert hashing["strategy"] == {"bitsPerFeature": 200}
        assert hashing["comparison"] == {
            "type": "ngram", "n": 2, "positional": True
        }

    def test_unsupported_version_rejected(self):
        with pytest.raises(SchemaError):
            upgrade_to_latest({"version": 99})


class TestValidation:
    def test_golden_schema_valid(self):
        validate_schema_dict(GOLDEN_SCHEMA_V1)

    def test_not_a_dict(self):
        with pytest.raises(SchemaError):
            validate_schema_dict([1, 2, 3])

    def test_missing_version(self):
        with pytest.raises(SchemaError):
            validate_schema_dict({"clkConfig": {"l": 1024}})

    def test_missing_features(self):
        with pytest.raises(SchemaError):
            validate_schema_dict(
                {"version": 3, "clkConfig": {"l": 1024,
                                             "kdf": {"type": "HKDF"}}}
            )

    def test_bad_comparison_type(self):
        doc = {
            "version": 3,
            "clkConfig": {"l": 1024, "kdf": {"type": "HKDF"}},
            "features": [
                {
                    "identifier": "x",
                    "format": {"type": "string"},
                    "hashing": {
                        "comparison": {"type": "sorted-neighbourhood"},
                        "strategy": {"bitsPerToken": 10},
                    },
                }
            ],
        }
        with pytest.raises(SchemaError):
            validate_schema_dict(doc)

    def test_schema_object_from_golden(self, golden_schema):
        assert golden_schema.l == 1024
        assert golden_schema.xor_folds == 0
        assert golden_schema.hash_l == 1024
        assert len(golden_schema.fields) == 5


class TestStrategies:
    def test_bits_per_token(self):
        assert BitsPerToken(20).bits_per_token(3) == (20, 20, 20)

    def test_bits_per_feature_residue_order(self):
        # 100 bits over 7 tokens: first 2 tokens get 15, rest get 14.
        assert BitsPerFeature(100).bits_per_token(7) == (
            15, 15, 14, 14, 14, 14, 14
        )

    @given(st.integers(1, 2000), st.integers(1, 50))
    def test_bits_per_feature_total_preserved(self, total, num_tokens):
        ks = BitsPerFeature(total).bits_per_token(num_tokens)
        assert sum(ks) == total
        assert max(ks) - min(ks) <= 1

    def test_array_variants_match(self):
        import numpy as np

        for strategy in (BitsPerToken(7), BitsPerFeature(123)):
            for n in (1, 5, 17):
                assert (
                    strategy.bits_per_token_array(n)
                    == np.array(strategy.bits_per_token(n))
                ).all()

    def test_factory(self):
        assert isinstance(
            strategy_from_config({"bitsPerToken": 5}), BitsPerToken
        )
        assert isinstance(
            strategy_from_config({"bitsPerFeature": 5}), BitsPerFeature
        )
        with pytest.raises(ValueError):
            strategy_from_config({"nope": 5})


class TestKdf:
    def test_hkdf_rfc5869_test_vector_case_1(self):
        # RFC 5869 A.1 (SHA-256) — public test vector.
        ikm = bytes.fromhex("0b" * 22)
        salt = bytes.fromhex("000102030405060708090a0b0c")
        info = bytes.fromhex("f0f1f2f3f4f5f6f7f8f9")
        from clkhash_spark.core.kdf import hkdf_extract_and_expand

        okm = hkdf_extract_and_expand(
            ikm, 42, hash_algo="SHA256", salt=salt, info=info
        )
        assert okm.hex() == (
            "3cb25f25faacd57a90434f64d0362f2a"
            "2d2d0a90cf1a5a4c5db02d56ecc4c5bf"
            "34007208d5b887185865"
        )

    def test_key_count_and_sizes(self):
        keys = generate_key_lists("secret", 5)
        assert len(keys) == 5
        assert all(len(pair) == 2 for pair in keys)
        assert all(len(k) == 64 for pair in keys for k in pair)

    def test_all_keys_distinct(self):
        keys = generate_key_lists("secret", 8)
        flat = [k for pair in keys for k in pair]
        assert len(set(flat)) == len(flat)

    def test_deterministic(self):
        assert generate_key_lists("s", 3) == generate_key_lists("s", 3)
        assert generate_key_lists("s", 3) != generate_key_lists("t", 3)

    def test_legacy_kdf_reuses_secret(self):
        keys = generate_key_lists(b"abc", 3, kdf="legacy")
        assert keys == ((b"abc", b"abc"),) * 3

    def test_bytes_and_str_secrets_agree(self):
        assert generate_key_lists("s", 2) == generate_key_lists(b"s", 2)

    def test_invalid_args(self):
        with pytest.raises(ValueError):
            generate_key_lists("s", 2, num_hashing_methods=0)
        with pytest.raises(ValueError):
            generate_key_lists("s", 2, kdf="pbkdf2")
        with pytest.raises(ValueError):
            hkdf(b"s", 2, hash_algo="MD5")

    def test_matches_cryptography_hkdf(self):
        """Cross-check our stdlib HKDF against the cryptography package."""
        cryptography = pytest.importorskip("cryptography")
        from cryptography.hazmat.primitives import hashes
        from cryptography.hazmat.primitives.kdf.hkdf import HKDF

        expected = HKDF(
            algorithm=hashes.SHA256(), length=128, salt=b"salty",
            info=b"ctx",
        ).derive(b"secret")
        ours = hkdf(b"secret", 2, salt=b"salty", info=b"ctx", key_size=64)
        assert b"".join(ours) == expected
