"""Stateful streaming exact-dedup (applyInPandasWithState).

Two sequential availableNow file-source queries share one checkpoint:
the second run's state store remembers digests emitted by the first, so
a duplicate arriving in a later batch is suppressed — first-seen-wins
across restarts. The queries run with a state TTL configured, which
also exercises the ProcessingTimeTimeout path (TTL >> test runtime, so
nothing expires)."""

import os

import pytest

from clkhash_spark.streaming import streaming_exact_dedup

pytestmark = pytest.mark.spark


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, ["doc_id", "text"]).write.mode(
        "append"
    ).parquet(path)


def _drain(spark, src_dir, out_dir, ckpt_dir, read_schema):
    stream = spark.readStream.schema(read_schema).parquet(src_dir)
    deduped = streaming_exact_dedup(stream, state_ttl_minutes=60)
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()  # availableNow terminates deterministically


class TestStreamingDedup:
    def test_first_seen_wins_across_batches(self, spark, tmp_path):
        src = str(tmp_path / "src")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(src, exist_ok=True)

        _write_batch(
            spark, src,
            [("a1", "hello world"), ("a2", "  HELLO   world "),
             ("b1", "something else")],
        )
        schema = spark.read.parquet(src).schema
        _drain(spark, src, out, ckpt, schema)
        first = {r["doc_id"] for r in spark.read.parquet(out).collect()}
        # a1/a2 normalize to the same digest -> smallest key wins
        assert first == {"a1", "b1"}

        # batch 2: a duplicate of an already-emitted doc + a new one
        _write_batch(
            spark, src,
            [("a3", "hello world"), ("c1", "brand new text")],
        )
        _drain(spark, src, out, ckpt, schema)
        all_out = {r["doc_id"] for r in spark.read.parquet(out).collect()}
        assert all_out == {"a1", "b1", "c1"}  # a3 suppressed by state
