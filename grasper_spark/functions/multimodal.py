"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real pipelines store image/audio/video as `binary` columns with a
metadata struct, and run decode / feature-extraction as Arrow-batched
Pandas UDFs over `mapInPandas`. The image/audio libs are NOT in this
container, so the decode step is a deterministic fake (byte statistics)
behind the same plumbing — schema, partitioning, UDF signature, and
batch shape are real and tested; swap `_decode_batch` for PIL/ffmpeg
in production.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("byte_sum", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("first_byte", T.IntegerType()),
    ]
)


def decode_real(payload: bytes) -> bytes:  # pragma: no cover
    """Production decode hook — requires PIL/ffmpeg, absent here."""
    raise NotImplementedError("media decode libs not available in this environment")


def _decode_batch(payloads: pd.Series) -> pd.DataFrame:
    """Deterministic fake decode: byte statistics (vectorized numpy)."""
    import numpy as np

    n_bytes, byte_sum, first = [], [], []
    for p in payloads:
        arr = np.frombuffer(p, dtype=np.uint8) if p else np.array([], dtype=np.uint8)
        n_bytes.append(len(arr))
        byte_sum.append(int(arr.sum()))
        first.append(int(arr[0]) if len(arr) else -1)
    n = pd.Series(n_bytes)
    s = pd.Series(byte_sum)
    return pd.DataFrame(
        {
            "n_bytes": n.astype("int32"),
            "byte_sum": s.astype("int64"),
            # raw int/int division: deterministic on any engine (exact
            # operands < 2^53); pandas .round(6) is half-EVEN and C
            # engines round half-away, so rounding here would diverge
            "byte_mean": s / n.clip(lower=1),
            "first_byte": pd.Series(first).astype("int32"),
        }
    )


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction — Arrow batches in, Arrow batches
    out; scales with partitions (repartition upstream for 100 TB).

    The UDF closure is self-contained (decode logic inlined, stdlib/numpy
    only) so workers never need grasper_spark on their PYTHONPATH."""
    # single-partition local inputs serialize the whole stage; a bounded
    # fan-out keeps Arrow batches large while using several workers
    if media.rdd.getNumPartitions() == 1:
        target = min(8, media.sparkSession.sparkContext.defaultParallelism)
        media = media.repartition(target)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            n_bytes, byte_sum, first = [], [], []
            for p in pdf["payload"]:
                arr = np.frombuffer(p, dtype=np.uint8) if p else np.array([], dtype=np.uint8)
                n_bytes.append(len(arr))
                byte_sum.append(int(arr.sum()))
                first.append(int(arr[0]) if len(arr) else -1)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "n_bytes": pd.Series(n_bytes).astype("int32"),
                    "byte_sum": pd.Series(byte_sum).astype("int64"),
                    "first_byte": pd.Series(first).astype("int32"),
                }
            )

    raw_schema = T.StructType([f for f in FEATURE_SCHEMA if f.name != "byte_mean"])
    out = media.mapInPandas(fn, raw_schema)
    # derive the mean JVM-side as the RAW division: exact int operands
    # < 2^53 through one IEEE divide is bit-identical on any engine,
    # while any rounding step (HALF_UP vs banker's vs multiply-based)
    # can diverge on identical inputs
    return out.withColumn(
        "byte_mean",
        F.col("byte_sum") / F.greatest(F.col("n_bytes"), F.lit(1)),
    ).select([f.name for f in FEATURE_SCHEMA])


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter used in tests/bench: documents.text encoded as the binary
    payload (deterministic), with plausible metadata."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("image").alias("media_type"),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    timestamp (decode stubbed; timestamps derived from metadata)."""
    return media.filter(F.col("meta.duration_ms").isNotNull()).select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
