"""Generate extended golden CLK vectors BY RUNNING THE REFERENCE LIBRARY
(read-only, /root/reference) over a config sweep, and write them to
tests/golden_vectors.json. Our engine's parity suite then asserts
byte-identical reproduction of every vector.

The reference needs the `bitarray` package, which isn't installed in
this environment; a minimal pure-python stand-in (our own code) is
injected into sys.modules first. Nothing from the reference is copied —
it is invoked as an oracle.

Usage: python tools/gen_golden_vectors.py
"""

from __future__ import annotations

import base64
import json
import os
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"


# ---------------------------------------------------------------------------
# Minimal bitarray stand-in (only what the reference's hot path touches).
# ---------------------------------------------------------------------------
import numpy as np


class _BitArray:
    __slots__ = ("bits",)

    def __init__(self, length=0):
        if isinstance(length, _BitArray):
            self.bits = length.bits.copy()
        else:
            self.bits = np.zeros(int(length), dtype=bool)

    def setall(self, value):
        self.bits[:] = bool(value)

    def __setitem__(self, index, value):
        self.bits[index] = bool(value)

    def __getitem__(self, index):
        if isinstance(index, slice):
            out = _BitArray(0)
            out.bits = self.bits[index].copy()
            return out
        return bool(self.bits[index])

    def __len__(self):
        return len(self.bits)

    def __or__(self, other):
        out = _BitArray(0)
        out.bits = self.bits | other.bits
        return out

    __ior__ = None  # defined below

    def __xor__(self, other):
        out = _BitArray(0)
        out.bits = self.bits ^ other.bits
        return out

    def count(self, value=True):
        return int(self.bits.sum()) if value else int((~self.bits).sum())

    def tobytes(self):
        return np.packbits(self.bits).tobytes()

    def frombytes(self, raw):
        extra = np.unpackbits(np.frombuffer(raw, dtype=np.uint8)).astype(bool)
        self.bits = np.concatenate([self.bits, extra])

    def __eq__(self, other):
        return isinstance(other, _BitArray) and np.array_equal(
            self.bits, other.bits
        )


def _ior(self, other):
    self.bits |= other.bits
    return self


_BitArray.__ior__ = _ior

shim = types.ModuleType("bitarray")
shim.bitarray = _BitArray
sys.modules.setdefault("bitarray", shim)
sys.path.insert(0, REFERENCE)


def sweep_configs():
    """Config sweep: field type x comparator x strategy x hash x folds x
    missing values (FIXTURES.md F4)."""
    kdf = {
        "type": "HKDF",
        "hash": "SHA256",
        "salt": (
            "SCbL2zHNnmsckfzchsNkZY9XoHk96P/G5nUBrM7ybymlEFsMV6PAeDZCNp3r"
            "fNUPCtLDMOGQHG4pCQpfhiHCyA=="
        ),
        "keySize": 64,
    }
    string_rows = [["Kévin Smith"], ["JOHN HOWARD, ESQ."], [""],
                   ["a"], ["N/A"], ["  padded  "], ["北京 rocks"]]
    int_rows = [["0"], ["13"], ["+13"], ["-7"], ["000042"], ["N/A"]]
    date_rows = [["1963-12-13"], ["1992-02-29"], ["0123-01-12"], ["N/A"]]
    enum_rows = [["M"], ["F"], ["N/A"]]

    def schema_for(fmt, hashing, l=1024, folds=0):
        return {
            "version": 3,
            "clkConfig": {"l": l, "xor_folds": folds, "kdf": kdf},
            "features": [
                {"identifier": "f0", "format": fmt, "hashing": hashing}
            ],
        }

    cases = []
    string_fmt = {"type": "string", "encoding": "utf-8"}
    for comparison in (
        {"type": "ngram", "n": 1},
        {"type": "ngram", "n": 2},
        {"type": "ngram", "n": 2, "positional": True},
        {"type": "ngram", "n": 3, "positional": True},
        {"type": "exact"},
    ):
        for strategy in ({"bitsPerToken": 15}, {"bitsPerFeature": 100}):
            for hash_block in (
                {"type": "doubleHash"},
                {"type": "doubleHash", "prevent_singularity": True},
                {"type": "blakeHash"},
            ):
                for folds in (0, 1, 2):
                    hashing = {
                        "comparison": comparison,
                        "strategy": strategy,
                        "hash": hash_block,
                        "missingValue": {
                            "sentinel": "N/A", "replaceWith": "missing"
                        },
                    }
                    cases.append(
                        (
                            schema_for(dict(string_fmt), hashing,
                                       folds=folds),
                            string_rows,
                        )
                    )
    # integer + numeric comparison
    for strategy in ({"bitsPerToken": 10}, {"bitsPerFeature": 77}):
        hashing = {
            "comparison": {
                "type": "numeric", "thresholdDistance": 100,
                "resolution": 3,
            },
            "strategy": strategy,
            "hash": {"type": "doubleHash"},
            "missingValue": {"sentinel": "N/A", "replaceWith": "0"},
        }
        cases.append((schema_for({"type": "integer"}, hashing), int_rows))
    # dates
    hashing = {
        "comparison": {"type": "ngram", "n": 1, "positional": True},
        "strategy": {"bitsPerToken": 30},
        "hash": {"type": "doubleHash"},
        "missingValue": {"sentinel": "N/A", "replaceWith": "19000101"},
    }
    cases.append(
        (
            schema_for({"type": "date", "format": "%Y-%m-%d"}, hashing),
            date_rows,
        )
    )
    # enum + blake
    hashing = {
        "comparison": {"type": "ngram", "n": 1},
        "strategy": {"bitsPerFeature": 60},
        "hash": {"type": "blakeHash"},
        "missingValue": {"sentinel": "N/A", "replaceWith": "M"},
    }
    cases.append(
        (
            schema_for({"type": "enum", "values": ["M", "F"]}, hashing),
            enum_rows,
        )
    )
    # multi-field with ignored column + SHA512 KDF + 512-bit CLK
    multi = {
        "version": 3,
        "clkConfig": {
            "l": 512,
            "xor_folds": 1,
            "kdf": {"type": "HKDF", "hash": "SHA512", "keySize": 64},
        },
        "features": [
            {"identifier": "skip", "ignored": True},
            {
                "identifier": "name",
                "format": {"type": "string", "encoding": "utf-8"},
                "hashing": {
                    "comparison": {"type": "ngram", "n": 2},
                    "strategy": {"bitsPerFeature": 150},
                    "hash": {"type": "blakeHash"},
                },
            },
            {
                "identifier": "num",
                "format": {"type": "integer"},
                "hashing": {
                    "comparison": {"type": "ngram", "n": 1,
                                   "positional": True},
                    "strategy": {"bitsPerToken": 20},
                    "hash": {"type": "doubleHash"},
                },
            },
        ],
    }
    cases.append(
        (multi, [["x", "Jane Austen", "1775"], ["y", "Bob", "+7"]])
    )
    return cases


def main() -> None:
    from clkhash import schema as ref_schema  # noqa: E402 (reference, as oracle)
    from clkhash.bloomfilter import stream_bloom_filters  # noqa: E402
    from clkhash.key_derivation import generate_key_lists  # noqa: E402

    out = []
    for i, (schema_dict, rows) in enumerate(sweep_configs()):
        loaded = ref_schema.from_json_dict(
            json.loads(json.dumps(schema_dict))
        )
        keys = generate_key_lists(
            "golden-secret",
            len(loaded.fields),
            key_size=loaded.kdf_key_size,
            salt=loaded.kdf_salt,
            info=loaded.kdf_info,
            kdf=loaded.kdf_type,
            hash_algo=loaded.kdf_hash,
        )
        vectors = []
        for bf, _key, popcount in stream_bloom_filters(rows, keys, loaded):
            vectors.append(
                {
                    "clk_b64": base64.b64encode(bf.tobytes()).decode(),
                    "popcount": popcount,
                }
            )
        out.append(
            {
                "case": i,
                "schema": schema_dict,
                "secret": "golden-secret",
                "rows": rows,
                "vectors": vectors,
            }
        )
    path = os.path.join(REPO, "tests", "golden_vectors.json")
    with open(path, "w") as fp:
        json.dump(out, fp, indent=1)
    total = sum(len(c["vectors"]) for c in out)
    print(f"wrote {len(out)} cases / {total} vectors to {path}")


if __name__ == "__main__":
    main()
