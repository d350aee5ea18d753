"""Structured Streaming support.

The reference's "streaming" is process-level pipelining of a batch job
(clkhash/clk.py:221-297) and the north rule is batch-with-checkpoints,
but the encode operator is stateless-per-row, so it lifts to Structured
Streaming unchanged: ``readStream → encode_clks_stream → writeStream``
gives continuous CLK ingestion (e.g. new crawl partitions landing in a
directory) with exactly-once sinks via checkpointing.

Blocking/scoring/clustering stay batch jobs over the accumulated CLK
table — pairwise linkage is a global computation with no event-time
windowing semantics to exploit.

:func:`streaming_exact_dedup` adds the custom *stateful* streaming
operator a training-data ingest pipeline needs: first-seen wins
dedup across micro-batches via ``applyInPandasWithState`` (per-digest
state, optional TTL so state is bounded at 100 TB ingest).
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence, Union

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .core.schema import Schema
from .operators.encode import encode_clks

__all__ = [
    "encode_clks_stream",
    "start_encode_stream",
    "streaming_exact_dedup",
    "start_dedup_stream",
]


def encode_clks_stream(
    stream_df: DataFrame,
    schema: Schema,
    secret: Union[str, bytes],
    key_cols: Sequence[str] = ("url",),
    feature_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Streaming variant of the encode operator.

    ``encode_clks`` is a stateless ``mapInPandas`` projection, so the same
    implementation is streaming-safe (no aggregation, no watermark
    needed); this wrapper just documents/asserts the contract.
    """
    if not stream_df.isStreaming:
        raise ValueError(
            "encode_clks_stream expects a streaming DataFrame; use "
            "encode_clks for batch input"
        )
    return encode_clks(
        stream_df, schema, secret,
        key_cols=key_cols, feature_cols=feature_cols,
    )


def streaming_exact_dedup(
    stream_df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    state_ttl_minutes: Optional[float] = None,
) -> DataFrame:
    """First-seen-wins exact dedup across micro-batches (stateful).

    Custom stateful streaming operator via ``applyInPandasWithState``:
    groups by the md5 of normalized text, keeps one boolean per digest
    in the state store, and emits only the first row ever seen for each
    digest (within a batch, the smallest key wins — deterministic).
    State survives restarts through the query checkpoint, so a resumed
    ingest never re-emits old documents.

    Scale notes: state is one boolean per *distinct* document digest,
    hash-partitioned across executors by the groupBy — the same shuffle
    key layout as the batch ``exact_duplicates``. ``state_ttl_minutes``
    bounds the store for unbounded crawls (a digest not seen for the
    TTL is forgotten and would be re-emitted — the standard
    freshness/memory trade).

    TTL is for *continuous* queries only: ProcessingTimeTimeout keeps
    an ``availableNow`` drain alive servicing pending timers, so
    batch-style catch-up runs should pass ``state_ttl_minutes=None``.
    """
    from pyspark.sql.types import (
        BooleanType,
        StringType,
        StructField,
        StructType,
    )

    from .operators.dedup import normalized_text

    if state_ttl_minutes is not None and state_ttl_minutes <= 0:
        # 0 would silently mean "no TTL" (falsy) — make the nonsense
        # input loud instead.
        raise ValueError(
            f"state_ttl_minutes must be positive, got {state_ttl_minutes}; "
            "pass None for unbounded state"
        )

    keyed = stream_df.select(
        F.md5(normalized_text(F.col(text_col))).alias("text_md5"),
        F.col(key_col),
        F.col(text_col),
    )
    out_schema = StructType(
        [
            StructField("text_md5", StringType(), False),
            keyed.schema[key_col],
            keyed.schema[text_col],
        ]
    )
    state_schema = StructType([StructField("seen", BooleanType(), False)])
    ttl_ms = (
        int(state_ttl_minutes * 60_000) if state_ttl_minutes else None
    )

    def dedup_fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            # Digest already emitted in an earlier batch; refresh TTL.
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            return
        batches = [pdf for pdf in pdfs if len(pdf)]
        if not batches:
            return
        rows = pd.concat(batches, ignore_index=True)
        first = rows.sort_values(key_col, kind="stable").iloc[[0]]
        state.update((True,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield first

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return keyed.groupBy("text_md5").applyInPandasWithState(
        dedup_fn, out_schema, state_schema, "append", timeout
    )


def start_encode_stream(
    stream_df: DataFrame,
    schema: Schema,
    secret: Union[str, bytes],
    output_path: str,
    checkpoint_path: str,
    key_cols: Sequence[str] = ("url",),
    feature_cols: Optional[Sequence[str]] = None,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Encode a stream into a parquet CLK table with exactly-once sink.

    ``availableNow`` drains the current backlog then stops (the batch-
    catch-up pattern); pass ``False`` for a continuous micro-batch query.
    """
    encoded = encode_clks_stream(
        stream_df, schema, secret,
        key_cols=key_cols, feature_cols=feature_cols,
    )
    writer = (
        encoded.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_dedup_stream(
    stream_df: DataFrame,
    output_path: str,
    checkpoint_path: str,
    text_col: str = "text",
    key_col: str = "doc_id",
    state_ttl_minutes: Optional[float] = None,
    trigger_available_now: bool = True,
    processing_time: Optional[str] = None,
) -> StreamingQuery:
    """Start a first-seen dedup query with a parquet exactly-once sink.

    Guard rail: TTL (ProcessingTimeTimeout) with an ``availableNow``
    drain keeps the query alive servicing pending timers —
    ``awaitTermination`` can block minutes-to-forever — so that
    combination is rejected here rather than hanging downstream. Use a
    continuous trigger (``processing_time='1 second'``) for TTL'd
    queries.
    """
    if state_ttl_minutes is not None and trigger_available_now:
        raise ValueError(
            "state_ttl_minutes requires a continuous trigger: "
            "ProcessingTimeTimeout keeps an availableNow drain alive "
            "servicing timers (the query never terminates). Pass "
            "trigger_available_now=False with processing_time set."
        )
    deduped = streaming_exact_dedup(
        stream_df, text_col=text_col, key_col=key_col,
        state_ttl_minutes=state_ttl_minutes,
    )
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
