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


def range_join(
    facts: DataFrame, ranges: DataFrame, value_col: str,
    lo_col: str, hi_col: str, bin_size: float,
) -> DataFrame:
    """Bin-based range join: every fact row matched with every range row
    whose [lo, hi] interval contains its value — WITHOUT the nested-loop
    join Spark plans for a bare `v BETWEEN lo AND hi` condition.

    The classic bin trick: ranges explode to the bins they cover, facts
    map to their single bin, and the match becomes an EQUI-join on the
    bin plus a residual filter. Each (fact, range) pair meets in exactly
    one bin (the fact's), so no dedup is needed. Pick bin_size near the
    typical range width: cost is O(|facts| + Σ range_width/bin_size)
    exploded rows through one hash join — scales where the nested loop
    is quadratic.
    """
    fb = facts.withColumn("_bin", F.floor(F.col(value_col) / bin_size))
    rb = ranges.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bin_size),
                F.floor(F.col(hi_col) / bin_size),
            )
        ),
    )
    return (
        fb.join(rb, "_bin", "inner")
        .filter((F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) <= F.col(hi_col)))
        .drop("_bin")
    )
