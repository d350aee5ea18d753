import json
import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_SF", "/root/testdata/sf0.001")


# The reference's own pinned regression fixture (v1 schema, secret
# 'chicken'); expected CLKs from /root/reference/tests/test_clk.py:174-175.
GOLDEN_SCHEMA_V1 = dict(
    version=1,
    clkConfig=dict(
        l=1024,
        k=30,
        kdf=dict(
            type="HKDF",
            hash="SHA256",
            salt=(
                "SCbL2zHNnmsckfzchsNkZY9XoHk96P/G5nUBrM7ybymlEFsMV6PAeDZCNp3r"
                "fNUPCtLDMOGQHG4pCQpfhiHCyA=="
            ),
            info="c2NoZW1hX2V4YW1wbGU=",
            keySize=64,
        ),
        hash=dict(type="doubleHash"),
    ),
    features=[
        dict(
            identifier="name",
            format=dict(type="string", encoding="utf-8", case="upper"),
            hashing=dict(ngram=2, weight=2),
        ),
        dict(
            identifier="id",
            format=dict(
                type="string",
                encoding="ascii",
                pattern=r"[a-z][a-z][a-z]\d\d\d",
            ),
            hashing=dict(ngram=1, positional=True),
        ),
        dict(
            identifier="dob",
            format=dict(type="date", format="%Y-%m-%d"),
            hashing=dict(ngram=2, positional=True, weight=0.5),
        ),
        dict(
            identifier="gender",
            format=dict(type="enum", values=["M", "F"]),
            hashing=dict(ngram=1, positional=False),
        ),
        dict(
            identifier="children",
            format=dict(type="integer", maximum=20),
            hashing=dict(ngram=1, positional=True),
        ),
    ],
)

GOLDEN_ROWS = [
    ["KÉVIN", "kev007", "1963-12-13", "M", "1"],
    ["JOHN HOWARD, ESQ.", "stv534", "1992-02-29", "M", "16"],
    ["JULIA", "alp423", "0123-01-12", "F", "0"],
]

GOLDEN_SECRET = "chicken"

GOLDEN_CLK_B64 = [
    "SU9+/O/Jzzi0sfzH8K2l3+qfhn8Ky3jVI21DVdH9j2fXE++JH8GcQGSeYxDZFxALCAT8"
    "CHwYJyQcRT3MhUQOFWcOf5fWdr6ofh6DYy8iv////weyunbMahfV9RMWkRwQmBL3fjre"
    "UVOCS9D9kAbQC2XgULidKCTHd9ZpbPJ91eE=",
    "Pfl1/d7/31/+9u9x9zv//76/83//0v1Xt/dX/3X/e79XP7vd+Xfkf//2/9Xb/7Fd73e9"
    "f/n0f/c7Vb99B/X29d8997Pz/vJ87X/X/vcX9vt1d+/+5bP1fvfevnfX8d/f/j0XPL7f"
    "999kc/28/3d4c7t/9b/+Pf411/f2+3z1d/s=",
]


@pytest.fixture(scope="session")
def golden_schema():
    from clkhash_spark.core import from_json_dict

    return from_json_dict(json.loads(json.dumps(GOLDEN_SCHEMA_V1)))


@pytest.fixture(scope="session")
def golden_keys(golden_schema):
    from clkhash_spark.core import generate_key_lists

    s = golden_schema
    return generate_key_lists(
        GOLDEN_SECRET,
        len(s.fields),
        key_size=s.kdf_key_size,
        salt=s.kdf_salt,
        info=s.kdf_info,
        kdf=s.kdf_type,
        hash_algo=s.kdf_hash,
    )


@pytest.fixture(scope="session")
def spark():
    """Shared local SparkSession for the whole test run."""
    from clkhash_spark.session import build_session

    spark = build_session(app_name="clkhash-spark-tests", cores=4,
                          shuffle_partitions=8)
    yield spark
    spark.stop()
