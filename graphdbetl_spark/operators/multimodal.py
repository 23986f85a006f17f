"""Multimodal column conventions: opaque binary payloads + typed metadata.

Contract (north-star): image/audio/video payloads ride as
``binary`` columns (or out-of-line as storage paths) next to a typed
metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` stages so each Python batch touches a
bounded number of payload bytes.

The decode step itself is STUBBED (codec libraries are not available
in this environment — see ``decode_image``); the Spark-side plumbing
(schema, batching, partition sizing) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Canonical multimodal schema fragment.
MEDIA_META = StructType(
    [
        StructField("media_type", StringType()),  # image/audio/video
        StructField("format", StringType()),  # png/jpeg/wav/...
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("byte_mean", StringType()),  # deterministic fake feature
    ]
)


def attach_media_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Demo wiring: derive a binary payload + metadata struct from a text
    column (stands in for reading real media bytes via
    ``spark.read.format('binaryFile')``)."""
    payload = F.encode(F.col(text_col), "utf-8").cast(BinaryType())
    meta = F.struct(
        F.lit("image").alias("media_type"),
        F.lit("fake").alias("format"),
        F.lit(None).cast(IntegerType()).alias("width"),
        F.lit(None).cast(IntegerType()).alias("height"),
        F.octet_length(payload).cast(LongType()).alias("n_bytes"),
    )
    return df.withColumn("payload", payload).withColumn("media_meta", meta)


def decode_image(payload: bytes) -> object:
    """Decode an image payload. STUB: real codecs (PIL/opencv) are not
    installed here; at deployment, swap the body for the real decoder."""
    raise NotImplementedError("image codec not available in this environment")


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", BinaryType()),
    ]
)


def frame_sample(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    frame_size: int = 64,
    stride: int = 256,
) -> DataFrame:
    """Frame sampling over binary payloads (the video path): one input
    row fans out to N frame rows — mapInPandas is a flat map, so the
    one-to-many shape needs no explode. The 'decoder' slices fixed
    windows from the byte stream (deterministic stand-in for a codec's
    keyframe extraction; swap the slicing for a real decoder at
    deployment). Output partitioning follows the input — no shuffle."""

    def batches(it):
        for pdf in it:
            ids, idxs, frames = [], [], []
            for _, row in pdf.iterrows():
                data = row[payload_col] or b""
                for i, off in enumerate(range(0, len(data), stride)):
                    ids.append(row[id_col])
                    idxs.append(i)
                    frames.append(bytes(data[off : off + frame_size]))
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_bytes": frames})

    return df.select(id_col, payload_col).mapInPandas(batches, FRAME_SCHEMA)


def extract_features(df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas.

    Arrow streams batches of (id, payload); Python computes per-payload
    features. Here the 'feature' is a deterministic byte-mean fake
    (decode stubbed), but the batch shape, schema, and partition flow
    are exactly what a real decoder uses.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": pdf[payload_col].map(len).astype("int64"),
                    "byte_mean": pdf[payload_col].map(
                        lambda b: f"{(sum(b) / len(b)):.4f}" if len(b) else "0"
                    ),
                }
            )
            yield out

    return df.select(id_col, payload_col).mapInPandas(batches, FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("media_meta", MEDIA_META),
    ]
)


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Resize stage over binary payloads via mapInPandas (the image
    path): every payload is re-emitted at exactly ``width*height``
    bytes with its metadata struct updated to the target dimensions.

    The 'resampler' here is deterministic stride-subsampling /
    zero-padding of the byte stream (decode is stubbed in this
    environment — see ``decode_image``); a real deployment swaps only
    the per-batch body for codec decode + interpolate + re-encode. The
    Arrow batch shape, output schema (payload + typed metadata), and
    partition flow (follows input, no shuffle) are the production
    plumbing.
    """
    target = width * height

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_ids, out_payloads, out_meta = [], [], []
            for _, row in pdf.iterrows():
                data = row[payload_col] or b""
                if len(data) >= target:
                    step = len(data) / target
                    resized = bytes(data[int(i * step)] for i in range(target))
                else:
                    resized = data + b"\x00" * (target - len(data))
                out_ids.append(row[id_col])
                out_payloads.append(resized)
                out_meta.append(
                    {
                        "media_type": "image",
                        "format": "fake",
                        "width": width,
                        "height": height,
                        "n_bytes": target,
                    }
                )
            yield pd.DataFrame(
                {"doc_id": out_ids, "payload": out_payloads, "media_meta": out_meta}
            )

    return df.select(id_col, payload_col).mapInPandas(batches, RESIZED_SCHEMA)
