"""Multimodal column plumbing — OP-X5 (SURVEY.md §2.8).

Images/audio/video are opaque ``binary`` columns with typed metadata.
The Spark-side plumbing here is real — explicit output schema, Arrow
batch transfer via ``mapInPandas``, partition-preserving map — while the
codec itself is a deterministic stub (``_fake_decode``), since no
image/audio libraries ship in this container. Swapping the stub for a
real decoder (PIL / torchaudio / ffmpeg) changes ONE function and
nothing in the plan.

Scale posture: decode is a narrow map over the scan — no shuffle, no
driver involvement; batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` so executor memory is
bounded regardless of payload size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

#: Output schema of the decode stage — what a real image decoder would
#: produce (dimensions, channels, a coarse content digest).
DECODE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("byte_len", T.IntegerType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_channels", T.IntegerType()),
    T.StructField("checksum", T.LongType()),
])


def _fake_decode(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic stand-in for a codec: derives (width, height,
    channels, checksum) purely from the bytes. A real implementation
    would be e.g. ``PIL.Image.open(io.BytesIO(payload))``; it is
    stubbed because codec libraries are not available here.
    """
    n = len(payload)
    checksum = 0
    for b in payload[:256]:
        checksum = (checksum * 131 + b) % 1_000_000_007
    width = 16 + (checksum % 240)
    height = 16 + ((checksum // 240) % 240)
    return width, height, 3, checksum


def decode_features(df: DataFrame,
                    id_col: str = "doc_id",
                    payload_col: str = "payload") -> DataFrame:
    """binary payload → typed feature row via Arrow-batched mapInPandas."""

    def decode_batches(batches: Iterator[pd.DataFrame]) \
            -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(p) for p in pdf[payload_col]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "byte_len": [len(p) for p in pdf[payload_col]],
                "width": [d[0] for d in decoded],
                "height": [d[1] for d in decoded],
                "n_channels": [d[2] for d in decoded],
                "checksum": [d[3] for d in decoded],
            })

    return df.mapInPandas(decode_batches, schema=DECODE_SCHEMA)
