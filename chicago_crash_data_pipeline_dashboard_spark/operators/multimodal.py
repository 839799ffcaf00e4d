"""Multimodal column plumbing: opaque binary media + typed metadata.

Media (image/audio/video) travel as ``binary`` columns with a typed
metadata struct; decode / feature-extraction / resize / frame-sample
run as Arrow-batched ``mapInPandas`` operators. The decode itself is
STUBBED (no image/audio libs in this container — clearly marked), but
everything Spark-side is real and tested: schema, batch iteration,
partition behavior, UDF signatures, deterministic fake features.

Scale notes: media bytes dominate row size — keep them OUT of shuffles
(derive features first, then drop/replace the binary column), size
``spark.sql.files.maxPartitionBytes`` down for media-heavy tables, and
never collect() a media column.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("format", T.StringType(), True),  # png|jpeg|wav|mp4…
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META, True),
    ]
)

_FEATURE_DIM = 16


def _fake_features(content: bytes, dim: int = _FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a real decoder+encoder: features are
    derived from a sha256 of the bytes, scaled to [-1, 1]. Stable
    across runs/partitions — good enough to test the full pipeline
    shape end-to-end."""
    if content is None:
        return [0.0] * dim
    h = hashlib.sha256(content).digest()
    return [((h[i % len(h)] / 255.0) * 2.0 - 1.0) for i in range(dim)]


def decode_and_featurize(df: DataFrame, real_decode: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``real_decode=True`` is the production path (PIL/librosa/ffmpeg) —
    NOT available in this container, raises NotImplementedError inside
    the executor. The stub path produces deterministic fake features
    with the exact same schema/batching, so the distributed plumbing is
    fully exercised.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("media_type", T.StringType(), True),
            T.StructField("n_bytes", T.LongType(), True),
            T.StructField("features", T.ArrayType(T.DoubleType()), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if real_decode:
                # STUB: real decoder requires image/audio libs absent here.
                raise NotImplementedError(
                    "real media decode requires PIL/librosa/ffmpeg — not in this container"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["meta"].map(
                        lambda m: (m or {}).get("media_type") if isinstance(m, dict) else None
                    ),
                    "n_bytes": pdf["content"].map(lambda b: 0 if b is None else len(b)).astype("int64"),
                    "features": pdf["content"].map(_fake_features),
                }
            )

    return df.mapInPandas(batches, schema=out_schema)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    timestamp (derived from metadata duration — no decode needed). The
    actual pixel extraction plugs into decode_and_featurize."""
    return (
        df.filter(F.col("meta.media_type") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .select("media_id", "frame_ts_ms", "content", "meta")
    )


def make_media_fixture(spark, n: int = 64) -> DataFrame:
    """Deterministic binary-column fixture (bytes from a seeded hash)."""
    rows = []
    for i in range(n):
        blob = hashlib.sha256(f"media-{i}".encode()).digest() * (4 + i % 5)
        mt = ["image", "audio", "video"][i % 3]
        rows.append(
            (
                i,
                bytearray(blob),
                {
                    "media_type": mt,
                    "format": {"image": "png", "audio": "wav", "video": "mp4"}[mt],
                    "width": 64 if mt == "image" else None,
                    "height": 64 if mt == "image" else None,
                    "duration_ms": 5000 + i * 100 if mt != "image" else None,
                    "n_channels": 3 if mt == "image" else 2,
                },
            )
        )
    # few, fat rows: don't spread 96 rows over local[32]'s default
    # parallelism — 8 partitions keeps task overhead < data
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA).coalesce(8)
