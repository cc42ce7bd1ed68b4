"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

Not in the reference (beyond-reference, 100-TB-pipeline component): a
training-data pipeline carries media alongside text; the engine's job is the
Spark-side plumbing — schema convention, partition sizing, vectorized batch
shape — while the actual codecs are pluggable.

Schema convention::

    payload  binary                      -- the raw media bytes
    media    struct<mime: string, width: int, height: int,
                    n_frames: int, sample_rate: int, duration_ms: bigint>

Decode is gated: with Pillow/librosa installed, ``decode_image`` uses them;
in this container they are absent, so the REAL decode raises
NotImplementedError and the pipeline runs with a clearly-marked
DETERMINISTIC FAKE (byte-stat features) that exercises identical plumbing —
same schema, same Arrow batches, same partitioning.

Scale notes: payloads never enter a shuffle — metadata/features are computed
map-side and the payload column is pruned before any wide stage. Batch size
is governed by ``spark.sql.execution.arrow.maxRecordsPerBatch``; for
multi-MB media set it low (e.g. 64) so an Arrow batch fits executor memory.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)


def attach_media(df: DataFrame, text_col: str, mime: str = "image/fake") -> DataFrame:
    """Wrap a column's bytes as a multimodal (payload, media) pair with
    deterministic fake dimensions derived from payload length — the test
    stand-in for real ingested media."""
    payload = F.col(text_col).cast("binary")
    size = F.octet_length(payload)
    return df.withColumn("payload", payload).withColumn(
        "media",
        F.struct(
            F.lit(mime).alias("mime"),
            (size % 512 + 64).cast("int").alias("width"),
            (size % 256 + 64).cast("int").alias("height"),
            (size % 7 + 2).cast("int").alias("n_frames"),
            F.lit(16000).alias("sample_rate"),
            (size * 10).cast("long").alias("duration_ms"),
        ),
    )


def decode_image(payload: bytes) -> "np.ndarray":
    """REAL image decode — requires Pillow, absent in this container.

    The plumbing around it (mapInPandas batching, schema, partitioning) is
    real and tested with the deterministic fake below.
    """
    try:
        import io

        from PIL import Image  # type: ignore
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "image decode requires Pillow; this environment has no codec "
            "libraries — use fake_decode_stats for plumbing tests"
        ) from e
    return np.asarray(Image.open(io.BytesIO(payload)))  # pragma: no cover


def fake_decode_stats(payload: bytes) -> tuple[float, float, int]:
    """DETERMINISTIC FAKE decode: byte-level statistics standing in for
    pixel statistics (mean/std of the raw bytes + distinct byte count).
    Pure function of the payload — reproducible across engines."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return 0.0, 0.0, 0
    return float(arr.mean()), float(arr.std()), int(len(np.unique(arr)))


IMAGE_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("size_bytes", LongType()),
        StructField("payload_md5", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_byte", DoubleType()),
        StructField("std_byte", DoubleType()),
        StructField("distinct_bytes", IntegerType()),
    ]
)


def image_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Feature-extraction stage over (payload, media): one ``mapInPandas``
    pass emitting per-item stats. The UDF sees Arrow batches (pandas
    DataFrames) — all numpy-vectorizable work happens per batch, and the
    payload column never survives past this stage (map-side projection)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            stats = [fake_decode_stats(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "size_bytes": payloads.map(len).astype("int64"),
                    "payload_md5": payloads.map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                    "width": pdf["media"].map(lambda m: m["width"]).astype("int32"),
                    "height": pdf["media"].map(lambda m: m["height"]).astype("int32"),
                    "mean_byte": [s[0] for s in stats],
                    "std_byte": [s[1] for s in stats],
                    "distinct_bytes": pd.Series(
                        [s[2] for s in stats], dtype="int32"
                    ),
                }
            )

    return df.select(id_col, "payload", "media").mapInPandas(
        extract, IMAGE_STATS_SCHEMA
    )


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stage STUB: real resize needs a codec (decode_image); the
    metadata/plumbing transformation is real — payload passes through,
    media dims are rewritten, mime marked as resized."""
    return df.withColumn(
        "media",
        F.struct(
            F.concat(F.col("media.mime"), F.lit(";resized")).alias("mime"),
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.col("media.n_frames").alias("n_frames"),
            F.col("media.sample_rate").alias("sample_rate"),
            F.col("media.duration_ms").alias("duration_ms"),
        ),
    )


def sample_frames(
    df: DataFrame, id_col: str = "doc_id", every_n: int = 1
) -> DataFrame:
    """Frame-sampling stage: treat the payload as ``media.n_frames`` equal
    slices (the deterministic fake for a video container) and explode one
    row per sampled frame — pure Catalyst (sequence + explode + substr on
    binary), no Python. A real codec plugs in by replacing the slicing
    expression with a decode UDF; the explode/partition shape is identical."""
    frame_len = (F.octet_length("payload") / F.col("media.n_frames")).cast("int")
    idx = F.explode(
        F.sequence(F.lit(0), F.col("media.n_frames") - 1, F.lit(every_n))
    ).alias("frame_idx")
    return (
        df.select(id_col, "payload", "media")
        .select(F.col(id_col), "payload", frame_len.alias("_flen"), idx)
        .where(F.col("_flen") > 0)
        .select(
            id_col,
            "frame_idx",
            F.substring(
                F.col("payload").cast("string"),
                (F.col("frame_idx") * F.col("_flen") + 1).cast("int"),
                F.col("_flen"),
            )
            .cast("binary")
            .alias("frame_payload"),
        )
        .withColumn("frame_md5", F.md5("frame_payload"))
        .withColumn("frame_bytes", F.octet_length("frame_payload").cast("long"))
    )


AUDIO_ENERGY_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("chunk_idx", IntegerType()),
        StructField("energy", DoubleType()),
    ]
)


def audio_chunk_energy(
    df: DataFrame, id_col: str = "doc_id", chunk_bytes: int = 256
) -> DataFrame:
    """Audio feature stage (fake codec): per-chunk RMS energy over the raw
    bytes via one vectorized mapInPandas pass — the batch shape a real
    PCM/spectrogram extractor would use."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, energies = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
                n = len(arr) // chunk_bytes
                if n == 0:
                    continue
                chunks = arr[: n * chunk_bytes].reshape(n, chunk_bytes)
                rms = np.sqrt((chunks**2).mean(axis=1))
                ids.extend([doc_id] * n)
                idxs.extend(range(n))
                energies.extend(rms)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "chunk_idx": pd.Series(idxs, dtype="int32"),
                    "energy": pd.Series(energies, dtype="float64"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(extract, AUDIO_ENERGY_SCHEMA)
