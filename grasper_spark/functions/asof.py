"""As-of (temporal) join — Spark has no native one (it's the canonical
"compose it" operator): attach to each left row the most recent right
row with right.ts <= left.ts per key.

Implementation: union both sides tagged, one window pass per key ordered
by (ts, side) with last(..., ignorenulls) — a single shuffle on the key,
no range-explosion. Right rows sort before left rows at equal ts, so
"at or before" is inclusive. The right side must be unique per (key, ts)
(pre-aggregate it); otherwise which same-ts row wins is undefined in
every engine's as-of semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Left rows + `value_cols` from the latest right row at-or-before
    each left row's timestamp (NULL when none). Right must be unique per
    (key, ts)."""
    l_tag = left.withColumn("_side", F.lit(1))
    r_tag = right.select(
        key, ts, *value_cols
    ).withColumn("_side", F.lit(0))
    lcols = [c for c in left.columns]
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in value_cols:
        unioned = unioned.withColumn(
            f"asof_{c}",
            F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True).over(w),
        )
    return unioned.filter(F.col("_side") == 1).select(
        *lcols, *[f"asof_{c}" for c in value_cols]
    )
