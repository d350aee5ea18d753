"""Round-5 operator additions: repetition/boilerplate scores, PII scan,
near-dedup group assignment, and the extended multimodal magic sniffer.

These are the LLM-training-data quality gates the reference has no
counterpart for; semantics are pinned here on hand-built corpora and the
driver's DuckDB oracle covers them at sf scale (doc_repetition, doc_pii,
doc_dedup_groups, mm_media_metadata, mm_image_features).
"""

import pytest

from clkhash_spark.operators import text as text_ops
from clkhash_spark.operators.multimodal import (
    extract_image_features,
    media_metadata,
)

pytestmark = [pytest.mark.spark]


def _rows(df, key="doc_id"):
    return {r[key]: r.asDict() for r in df.collect()}


class TestRepetitionScores:
    def test_hand_counts(self, spark):
        df = spark.createDataFrame(
            [
                (0, "a a a b"),
                (1, "x y z"),
                (2, "w"),
                (3, ""),
                (4, "  p  q  "),
            ],
            ["doc_id", "text"],
        )
        got = _rows(text_ops.repetition_scores(df))
        assert got[0]["n_words"] == 4
        assert got[0]["n_distinct_words"] == 2
        assert got[0]["dup_word_ratio"] == 0.5
        assert got[0]["top_word_ratio"] == 0.75
        # bigrams: "a a", "a a", "a b" -> 2 distinct of 3
        assert got[0]["dup_bigram_ratio"] == round(1 - 2 / 3, 6)
        assert got[1]["dup_word_ratio"] == 0.0
        assert got[1]["dup_bigram_ratio"] == 0.0
        # single word: no bigrams
        assert got[2]["n_words"] == 1
        assert got[2]["dup_bigram_ratio"] == 0.0
        # empty text survives the explode-drop via the left join
        assert got[3]["n_words"] == 0
        assert got[3]["dup_word_ratio"] == 0.0
        assert got[3]["top_word_ratio"] == 0.0
        # irregular whitespace does not create empty tokens
        assert got[4]["n_words"] == 2

    def test_fully_repeated(self, spark):
        df = spark.createDataFrame([(0, "t t t t t")], ["doc_id", "text"])
        got = _rows(text_ops.repetition_scores(df))[0]
        assert got["dup_word_ratio"] == 0.8
        assert got["top_word_ratio"] == 1.0
        assert got["dup_bigram_ratio"] == 0.75


class TestPiiScan:
    def test_counts(self, spark):
        df = spark.createDataFrame(
            [
                (0, "mail me at a.b+c@test-x.org or b@y.io thanks"),
                (1, "call +1-555-0100 or 555-0134"),
                (2, "server at 10.0.3.7 and 192.168.1.255"),
                (3, "no pii here just words"),
                (4, "version 1.2.3.4.5 is not an ip"),
            ],
            ["doc_id", "text"],
        )
        got = _rows(text_ops.pii_scan(df))
        assert got[0]["n_emails"] == 2
        assert got[0]["has_pii"] is True
        assert got[1]["n_phones"] == 2
        assert got[2]["n_ipv4"] == 2
        assert got[3]["n_emails"] == 0
        assert got[3]["n_phones"] == 0
        assert got[3]["n_ipv4"] == 0
        assert got[3]["has_pii"] is False
        # 1.2.3.4.5: \b guards reject a 4-octet window inside 5 octets
        # only where digits adjoin; leftmost match "1.2.3.4" still hits —
        # pin whatever the engines agree on (both count 1 here).
        assert got[4]["n_ipv4"] == 1


class TestDedupGroups:
    def test_groups_over_near_dupes(self, spark):
        from clkhash_spark.entry_queries import q_doc_dedup_groups
        import os

        sf = os.environ.get(
            "SPARK_GRAFT_SMOKE_SF", "/root/testdata/sf0.001"
        )
        if not os.path.isdir(sf):
            pytest.skip("driver testdata not available")
        out = q_doc_dedup_groups(spark, sf)
        rows = out.collect()
        n_docs = len(rows)
        by_group = {}
        for r in rows:
            by_group.setdefault(r["group_id"], []).append(r)
        # every group's id is its minimum member, exactly one keep per
        # group, and group_size is consistent
        for gid, members in by_group.items():
            ids = sorted(m["doc_id"] for m in members)
            assert gid == ids[0]
            assert sum(m["keep"] for m in members) == 1
            assert all(m["group_size"] == len(members) for m in members)
        # keep-list is smaller than the corpus iff any dup pair existed
        n_keep = sum(r["keep"] for r in rows)
        assert n_keep == len(by_group)
        assert n_keep <= n_docs


class TestMinHashUnbiased:
    """The estimator property the original construction silently broke.

    With a,b < 2^31 against p = 2^61-1, a*h+b wrapped the modulus at
    most once, the affine map stayed near-monotonic in h, every
    "permutation" picked the same globally-minimal shingle, and
    signature agreement collapsed to ~{0,1} (toy J=1/3 sets measured
    0/64 agreeing positions). The fixed construction works in
    GF(2^31-1) with full-field a — this test pins the estimator's
    unbiasedness so no future "optimization" can regress it.
    """

    def test_agreement_tracks_jaccard(self):
        import hashlib

        import numpy as np

        from clkhash_spark.operators.dedup import (
            _MINHASH_BASE_MOD,
            _MINHASH_PRIME,
            minhash_coefficients,
        )

        coeffs = minhash_coefficients(128)
        a_vec = np.array([a for a, _ in coeffs], dtype=np.int64)
        b_vec = np.array([b for _, b in coeffs], dtype=np.int64)

        def base(s: str) -> int:
            return (
                int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
                % _MINHASH_BASE_MOD
            )

        def sig(items):
            h = np.array(sorted({base(s) for s in items}), dtype=np.int64)
            vals = (
                h[:, None] * a_vec[None, :] + b_vec[None, :]
            ) % _MINHASH_PRIME
            assert vals.min() >= 0  # no int64 overflow anywhere
            return vals.min(axis=0)

        for target in (0.2, 0.5, 0.8):
            ests = []
            for trial in range(10):
                shared = [
                    f"sh{target}_{trial}_{i}"
                    for i in range(int(100 * target))
                ]
                a_set = set(shared) | {
                    f"a{trial}_{i}" for i in range(100 - len(shared))
                }
                b_set = set(shared) | {
                    f"b{trial}_{i}" for i in range(100 - len(shared))
                }
                true_j = len(a_set & b_set) / len(a_set | b_set)
                ests.append(
                    (sig(a_set) == sig(b_set)).mean() - true_j
                )
            bias = float(np.mean(ests))
            # 128 hashes x 10 trials: |bias| ~ N(0, 0.013); 0.05 is 4 sigma
            assert abs(bias) < 0.05, (target, bias)

    def test_full_field_coefficients(self):
        from clkhash_spark.operators.dedup import (
            _MINHASH_PRIME,
            minhash_coefficients,
        )

        coeffs = minhash_coefficients(64)
        # a must range over the full field — small-a maps are the broken
        # near-monotonic regime.
        assert max(a for a, _ in coeffs) > _MINHASH_PRIME // 2
        assert all(1 <= a < _MINHASH_PRIME for a, _ in coeffs)
        assert all(0 <= b < _MINHASH_PRIME for _, b in coeffs)


class TestMediaSniffer:
    def test_magic_kinds(self, spark):
        blobs = [
            (0, b"\x89PNG\r\n\x1a\nrest"),
            (1, b"\xff\xd8\xff\xe0jfif"),
            (2, b"RIFF1234WAVE"),
            (3, b"GIF89a;;;"),
            (4, b"%PDF-1.7 stream"),
            (5, b"OggSvorbis"),
            (6, b"ID3\x04tag"),
            (7, b"<htmBODY"),
            (8, b"plain words"),
            (9, b""),
        ]
        df = spark.createDataFrame(blobs, ["doc_id", "media"])
        got = _rows(
            media_metadata(df, media_col="media", key_col="doc_id")
        )
        expect = {
            0: "image/png",
            1: "image/jpeg",
            2: "audio/wav",
            3: "image/gif",
            4: "application/pdf",
            5: "audio/ogg",
            6: "audio/mpeg",
            7: "text/html",
            8: "application/octet-stream",
            9: "application/octet-stream",
        }
        for k, kind in expect.items():
            assert got[k]["content_kind"] == kind, k
        assert got[2]["content_bytes"] == 12
        import hashlib

        assert (
            got[0]["content_sha256"]
            == hashlib.sha256(blobs[0][1]).hexdigest()
        )

    def test_feature_stub_deterministic(self, spark):
        import hashlib

        blob = b"GIF89a-some-bytes"
        df = spark.createDataFrame(
            [(0, blob)], ["doc_id", "media"]
        )
        got = _rows(
            extract_image_features(df, media_col="media", key_col="doc_id")
        )[0]
        assert got["width"] == 16 + len(blob) % 241
        assert got["height"] == 16 + len(blob) % 181
        digest = hashlib.sha256(blob).digest()[:16]
        recovered = [round(f * 255) for f in got["features"]]
        assert recovered == list(digest)
