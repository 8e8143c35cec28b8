"""Skew-handling utilities for hot keys.

AQE's skew-join handles most cases at runtime
(spark.sql.adaptive.skewJoin.enabled is on in session.py); these are
the explicit tools for the pathological ones — e.g. a celebrity vertex
with 10^7 in-edges in a Twitter-scale graph (the reference's Twitter
dataset has max-degree ~3M).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    agg_exprs: dict[str, str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregate for skewed group-by keys: partial-aggregate on
    (key, salt), then merge. Supports sum/count/min/max (re-aggregable).

    agg_exprs: {column: fn} with fn in {sum, count, min, max}.
    """
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    first_fn = {"sum": F.sum, "count": lambda c: F.count(F.lit(1)), "min": F.min, "max": F.max}
    salted = df.withColumn("_salt", (F.rand(seed=7) * salt_buckets).cast("int"))
    partial = salted.groupBy(*key_cols, "_salt").agg(
        *[first_fn[fn](c).alias(f"_p_{c}") for c, fn in agg_exprs.items()]
    )
    return partial.groupBy(*key_cols).agg(
        *[merge_fn[fn](f"_p_{c}").alias(f"{fn}_{c}") for c, fn in agg_exprs.items()]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed many-to-one join: salt the (big, skewed) left side randomly;
    explode the (smaller) right side across all salt values. Output
    columns match a plain `left.join(right, key, how)`."""
    l_salted = left.withColumn("_salt", (F.rand(seed=7) * salt_buckets).cast("int"))
    r_exploded = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = l_salted.join(r_exploded, [key, "_salt"], how)
    return out.drop("_salt")


def top_hot_keys(df: DataFrame, key: str, threshold: int) -> DataFrame:
    """Diagnostic: keys whose frequency exceeds `threshold` (candidates
    for salting / stopword-capping)."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > threshold)
        .orderBy(F.desc("cnt"))
    )
