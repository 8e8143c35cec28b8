"""Embedding-column utilities: L2 normalization and int8 quantization.

Training-data pipelines ship embeddings at corpus scale; at 100 TB the
dominant cost is BYTES — float32→int8 is a 4× storage/shuffle cut that
keeps ANN recall essentially intact. Both transforms are pure SQL
higher-order functions (whole-stage codegen, no UDF): per-row array
arithmetic, zero shuffle.

Quantization is per-vector symmetric (the faiss/SQ8-style baseline):
scale = max|v| / 127, q_i = round(v_i / scale) ∈ [-127, 127] stored as
``array<tinyint>`` + one double scale. Reconstruction error per element
is bounded by scale/2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _norm(vec: Column) -> Column:
    return F.sqrt(
        F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x)
    )


def l2_normalize(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Replace `vec_col` with its unit-norm form (zero vectors pass
    through unchanged)."""
    v = F.col(vec_col)
    n = _norm(v)
    unit = F.when(n == 0.0, v).otherwise(
        F.transform(v, lambda x: x.cast("double") / n)
    )
    return df.withColumn(vec_col, unit)


def quantize_int8(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Add ``q`` (array<tinyint>) and ``scale`` (double) columns; drops
    the float column. Zero vectors get scale 0 and all-zero codes."""
    v = F.col(vec_col)
    amax = F.aggregate(
        v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
    )
    scale = (amax / F.lit(127.0)).alias("scale")
    q = F.when(amax == 0.0, F.transform(v, lambda x: F.lit(0).cast("tinyint"))).otherwise(
        F.transform(
            v, lambda x: F.round(x.cast("double") / (amax / 127.0)).cast("tinyint")
        )
    )
    return df.withColumn("scale", scale).withColumn("q", q).drop(vec_col)


def dequantize(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Inverse of :func:`quantize_int8`: rebuild `vec_col` =
    q_i * scale as array<double>; drops q/scale."""
    rec = F.transform(F.col("q"), lambda x: x.cast("double") * F.col("scale"))
    return df.withColumn(vec_col, rec).drop("q", "scale")
