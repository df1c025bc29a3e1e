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


#: Output schema of the frame-sampling stage — one row PER SAMPLED
#: FRAME: the fan-out shape real video extraction produces.
FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_off", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("frame_checksum", T.LongType()),
])


def frame_sample(df: DataFrame, id_col: str = "doc_id",
                 payload_col: str = "payload",
                 frame_bytes: int = 16,
                 max_frames: int = 8) -> DataFrame:
    """binary "video" payload → ≤``max_frames`` evenly-strided frame
    rows via Arrow-batched ``mapInPandas``. The frame splitter is a
    deterministic stub (fixed-size frames + rolling checksum) standing
    in for a real demuxer (pyav/ffmpeg); the fan-out plumbing — one
    input row yielding many output rows with an explicit schema, no
    shuffle, executor-bounded batches — is the real thing.
    """

    def sample_batches(batches):
        for pdf in batches:
            cols = {k: [] for k in ("doc_id", "frame_idx", "frame_off",
                                    "n_frames", "frame_checksum")}
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                n = len(p) // frame_bytes
                stride = max(1, n // max_frames)
                for i in list(range(0, n, stride))[:max_frames]:
                    chunk = p[i * frame_bytes:(i + 1) * frame_bytes]
                    cs = 0
                    for b in chunk:
                        cs = (cs * 131 + b) % 1_000_000_007
                    cols["doc_id"].append(did)
                    cols["frame_idx"].append(i)
                    cols["frame_off"].append(i * frame_bytes)
                    cols["n_frames"].append(n)
                    cols["frame_checksum"].append(cs)
            yield pd.DataFrame(cols)

    return df.mapInPandas(sample_batches, schema=FRAME_SCHEMA)
