"""Live state-TTL coverage for the streaming dedup operator.

Runs streaming_exact_dedup under a CONTINUOUS trigger
(processingTime='1 second') with a 1-second TTL — the configuration the
availableNow tests deliberately avoid (ProcessingTimeTimeout keeps a
drain alive servicing timers; see test_streaming_dedup.py) — and
exercises the state.hasTimedOut path end-to-end: a digest whose state
expired is forgotten and re-emitted on its next arrival.

The heartbeat batch between expiry and the duplicate matters: Spark
services timed-out keys while processing a batch, and a key that
receives data in the same batch is handled with hasTimedOut=False. The
unrelated-doc batch forces the expired timer to fire first, so the
later duplicate meets absent state deterministically.
"""

import os
import time

import pytest

from clkhash_spark.streaming import start_dedup_stream, streaming_exact_dedup

pytestmark = pytest.mark.spark


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _emitted(spark, out_dir):
    try:
        return {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    except Exception:  # sink not committed yet
        return set()


def _wait_for(predicate, timeout_s=60, poll_s=0.5):
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if predicate():
            return True
        time.sleep(poll_s)
    return False


class TestStreamingTtlLive:
    def test_expired_digest_reemits(self, spark, tmp_path):
        src = str(tmp_path / "src")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(src, exist_ok=True)

        _write_batch(spark, src, [("x1", "time to live")])
        schema = spark.read.parquet(src).schema
        stream = spark.readStream.schema(schema).parquet(src)
        query = start_dedup_stream(
            stream, out, ckpt,
            state_ttl_minutes=1 / 60,  # 1 second
            trigger_available_now=False,
            processing_time="1 second",
        )
        try:
            assert _wait_for(
                lambda: "x1" in _emitted(spark, out)
            ), "first emission never arrived"

            # Let the 1-s TTL expire, then force a batch with an
            # unrelated doc so the expired timer fires
            # (state.hasTimedOut -> state.remove()).
            time.sleep(2.5)
            _write_batch(spark, src, [("hb", "heartbeat doc")])
            assert _wait_for(
                lambda: "hb" in _emitted(spark, out)
            ), "heartbeat batch never processed"
            time.sleep(1.5)  # one more trigger after the timer batch

            # Same digest again: state was removed, so it re-emits
            # (first-seen-wins resets after TTL — the documented
            # freshness/memory trade).
            _write_batch(spark, src, [("x2", "time to live")])
            assert _wait_for(
                lambda: "x2" in _emitted(spark, out), timeout_s=90
            ), "expired digest was not re-emitted"
        finally:
            query.stop()
            query.awaitTermination(30)

    def test_ttl_rejected_under_available_now(self, spark, tmp_path):
        src = str(tmp_path / "src2")
        os.makedirs(src, exist_ok=True)
        _write_batch(spark, src, [("a", "b")])
        schema = spark.read.parquet(src).schema
        stream = spark.readStream.schema(schema).parquet(src)
        with pytest.raises(ValueError, match="availableNow"):
            start_dedup_stream(
                stream, str(tmp_path / "o"), str(tmp_path / "c"),
                state_ttl_minutes=5, trigger_available_now=True,
            )

    def test_nonpositive_ttl_rejected(self, spark, tmp_path):
        src = str(tmp_path / "src3")
        os.makedirs(src, exist_ok=True)
        _write_batch(spark, src, [("a", "b")])
        schema = spark.read.parquet(src).schema
        stream = spark.readStream.schema(schema).parquet(src)
        with pytest.raises(ValueError, match="positive"):
            streaming_exact_dedup(stream, state_ttl_minutes=0)
