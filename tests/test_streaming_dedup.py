"""Stateful streaming exact-dedup (applyInPandasWithState).

Two sequential availableNow file-source queries share one checkpoint:
the second run's state store remembers digests emitted by the first, so
a duplicate arriving in a later batch is suppressed — first-seen-wins
across restarts.

TTL is NOT enabled here: ProcessingTimeTimeout keeps an availableNow
query alive servicing pending timers (measured: a 60-minute TTL makes
awaitTermination block for minutes to forever), so the TTL option is
for continuous queries only — see streaming_exact_dedup's docstring.
The TTL plan still gets built/validated below without being run."""

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
    deduped = streaming_exact_dedup(stream, state_ttl_minutes=None)
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    # availableNow + NoTimeout terminates once the backlog drains;
    # bound the wait so a regression fails fast instead of hanging.
    assert q.awaitTermination(180), "stream did not drain in time"


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

    def test_ttl_plan_builds(self, spark, tmp_path):
        # TTL wires ProcessingTimeTimeout into the plan; building (not
        # running) it validates schema/state plumbing — running it under
        # availableNow would keep the query alive for its timers.
        src = str(tmp_path / "src2")
        os.makedirs(src, exist_ok=True)
        _write_batch(spark, src, [("x", "y")])
        schema = spark.read.parquet(src).schema
        stream = spark.readStream.schema(schema).parquet(src)
        deduped = streaming_exact_dedup(stream, state_ttl_minutes=10)
        assert deduped.isStreaming
        assert set(deduped.columns) == {"text_md5", "doc_id", "text"}
