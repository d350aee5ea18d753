"""Streaming encode, column functions, partial resume, multimodal
plumbing."""

import os

import pytest
from pyspark.sql import functions as F

from clkhash_spark.functions import (
    base64_to_clk,
    clk_popcount,
    clk_to_base64,
    dice_similarity,
)
from clkhash_spark.operators.encode import encode_clks
from clkhash_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_image_features,
    media_metadata,
)
from clkhash_spark.pipeline import tuned_blocking, webpages_schema
from clkhash_spark.sources.tables import append_new, missing_keys
from clkhash_spark.sources.webpages import synthetic_webpages

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def clks(spark):
    pages = synthetic_webpages(spark, 200, seed=3).select("url", "text")
    return encode_clks(
        pages, webpages_schema(), "fx", key_cols=("url",)
    ).cache()


class TestColumnFunctions:
    def test_base64_roundtrip(self, spark, clks):
        out = clks.select(
            "clk", base64_to_clk(clk_to_base64(F.col("clk"))).alias("back")
        ).where(F.col("clk") != F.col("back"))
        assert out.count() == 0

    def test_clk_popcount_matches_stored(self, spark, clks):
        mismatch = clks.select(
            (clk_popcount(F.col("clk")) != F.col("popcount")).alias("bad")
        ).where(F.col("bad"))
        assert mismatch.count() == 0

    def test_dice_similarity_self_is_one(self, spark, clks):
        row = clks.limit(1)
        got = row.select(
            dice_similarity(
                F.col("clk"), F.col("clk"),
                F.col("popcount"), F.col("popcount"),
            ).alias("d")
        ).first()["d"]
        assert got == pytest.approx(1.0)


class TestPartialResume:
    def test_missing_keys(self, spark):
        inputs = spark.createDataFrame(
            [("a", 1), ("b", 2), ("c", 3)], ["url", "x"]
        )
        existing = spark.createDataFrame([("b",)], ["url"])
        left = missing_keys(inputs, existing, key_cols=("url",))
        assert {r["url"] for r in left.collect()} == {"a", "c"}
        assert missing_keys(inputs, None, key_cols=("url",)).count() == 3

    def test_append_new_is_idempotent(self, spark, tmp_path):
        path = os.path.join(tmp_path, "stage")
        first = spark.createDataFrame([("a", 1), ("b", 2)], ["url", "x"])
        out1 = append_new(spark, path, first, key_cols=("url",))
        assert out1.count() == 2
        again = append_new(spark, path, first, key_cols=("url",))
        assert again.count() == 2  # no duplicates
        more = spark.createDataFrame([("b", 2), ("c", 3)], ["url", "x"])
        out2 = append_new(spark, path, more, key_cols=("url",))
        assert out2.count() == 3


class TestStreamingEncode:
    def test_stream_matches_batch(self, spark, tmp_path):
        from clkhash_spark.streaming import start_encode_stream

        pages = synthetic_webpages(spark, 120, seed=9).select("url", "text")
        src = os.path.join(tmp_path, "src")
        pages.coalesce(2).write.parquet(src)

        stream = spark.readStream.schema(
            spark.read.parquet(src).schema
        ).parquet(src)
        out_path = os.path.join(tmp_path, "out")
        ckpt = os.path.join(tmp_path, "ckpt")
        query = start_encode_stream(
            stream, webpages_schema(), "stream-secret", out_path, ckpt,
            key_cols=("url",),
        )
        query.awaitTermination(120)

        streamed = spark.read.parquet(out_path)
        batch = encode_clks(
            pages, webpages_schema(), "stream-secret", key_cols=("url",)
        )
        diff = streamed.select("url", "clk").exceptAll(
            batch.select("url", "clk")
        )
        assert streamed.count() == 120
        assert diff.count() == 0

    def test_batch_df_rejected(self, spark):
        from clkhash_spark.streaming import encode_clks_stream

        pages = synthetic_webpages(spark, 5, seed=1).select("url", "text")
        with pytest.raises(ValueError):
            encode_clks_stream(pages, webpages_schema(), "s")


class TestMultimodal:
    def test_media_metadata_kinds(self, spark):
        rows = [
            ("png", b"\x89PNG\r\n" + b"x" * 10),
            ("jpg", b"\xff\xd8\xff\xe0" + b"y" * 10),
            ("wav", b"RIFF" + b"z" * 10),
            ("html", b"<html><body>hi</body></html>"),
            ("bin", b"\x00\x01\x02"),
        ]
        df = spark.createDataFrame(rows, ["url", "content"])
        got = {
            r["url"]: r["content_kind"]
            for r in media_metadata(df, media_col="content").collect()
        }
        assert got == {
            "png": "image/png",
            "jpg": "image/jpeg",
            "wav": "audio/wav",
            "html": "text/html",
            "bin": "application/octet-stream",
        }

    def test_extract_image_features_stub(self, spark):
        df = spark.createDataFrame(
            [("a", b"\x89PNGxxxx"), ("b", b"\x89PNGyyyy")],
            ["url", "content"],
        )
        feats = extract_image_features(df, media_col="content").collect()
        assert len(feats) == 2
        for row in feats:
            assert len(row["features"]) == FEATURE_DIM
            assert row["width"] > 0 and row["height"] > 0
        # deterministic: same bytes → same features
        again = extract_image_features(df, media_col="content").collect()
        assert sorted(map(tuple, feats)) == sorted(map(tuple, again))

    def test_real_decode_raises(self, spark):
        df = spark.createDataFrame([("a", b"\x89PNG")], ["url", "content"])
        out = extract_image_features(
            df, media_col="content", use_stub=False
        )
        with pytest.raises(Exception):
            out.collect()


class TestTunedBlocking:
    def test_monotone_in_n(self):
        rs = [
            tuned_blocking(n)["bits_per_band"]
            for n in (10**3, 10**5, 10**7, 10**9, 10**12)
        ]
        assert rs == sorted(rs)
        assert all(14 <= r <= 48 for r in rs)

    def test_recall_prediction_stays_high(self):
        for n in (10**4, 10**6, 10**9):
            assert tuned_blocking(n)["predicted_recall"] >= 0.9925
        # At 10^12 the law honestly reports the tail-calibrated model
        # (band agreement 0.91, round-4 A/B) dipping below target at
        # the 512-band cap; typical near-dups (agreement >= 0.93)
        # still predict >= 0.995.
        assert tuned_blocking(10**12)["predicted_recall"] >= 0.9
        assert tuned_blocking(
            10**12, duplicate_agreement=0.93
        )["predicted_recall"] >= 0.995
