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
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from .core.schema import Schema
from .operators.encode import encode_clks

__all__ = ["encode_clks_stream", "start_encode_stream"]


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
