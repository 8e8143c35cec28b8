"""Data-layout helpers for multi-dimensional locality at 100 TB.

A table queried by more than one column (user_id AND day, src AND dst)
can only be range-partitioned by one of them — unless rows are laid out
along a space-filling curve. `zorder_key` builds a Morton (bit-
interleaved) key as a pure JVM column expression; writing
`repartitionByRange(zorder_key(...)).sortWithinPartitions(...)` gives
parquet row-group min/max bounds that are tight in EVERY interleaved
dimension, so filters on any of them prune files/row-groups instead of
scanning. This is the same mechanism Delta's OPTIMIZE ZORDER BY uses —
re-expressed as a plain column so any writer can apply it.

Everything here is bit arithmetic on longs — no UDFs, codegen-friendly,
deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(*cols: "Column | str", bits: int = 21) -> Column:
    """Morton key interleaving the low `bits` bits of each column.

    Inputs must be non-negative integers; values >= 2^bits are clamped
    to the top code (locality degrades gracefully instead of wrapping).
    ndims * bits must fit in 63 bits (2 cols -> up to 31 bits each,
    3 cols -> 21). For non-integer or unbounded domains, pre-bucket:
    e.g. `F.unix_timestamp(ts) / 3600` or a rank/percentile bucket.
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    if not cs:
        raise ValueError("zorder_key needs at least one column")
    ndims = len(cs)
    if ndims * bits > 63:
        raise ValueError(
            f"{ndims} cols x {bits} bits = {ndims * bits} > 63 key bits; lower `bits`"
        )
    top = (1 << bits) - 1
    clamped = [
        F.least(F.greatest(c.cast("long"), F.lit(0)), F.lit(top)) for c in cs
    ]
    key = F.lit(0).cast("long")
    for b in range(bits):
        for d, c in enumerate(clamped):
            # ((c >> b) & 1) << (b*ndims + d)
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(c, b).bitwiseAND(F.lit(1)), b * ndims + d
                )
            )
    return key


def zorder_layout(
    df: DataFrame, *cols: "Column | str", bits: int = 21,
    num_partitions: int | None = None,
) -> DataFrame:
    """Rows arranged along the z-curve of `cols`: range-partitioned and
    sorted within partitions by the Morton key (dropped before return).
    Write the result with any sink; every interleaved column gets tight
    per-file/row-group min-max bounds for scan pruning."""
    keyed = df.withColumn("__zkey__", zorder_key(*cols, bits=bits))
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return (
        keyed.repartitionByRange(n, "__zkey__")
        .sortWithinPartitions("__zkey__")
        .drop("__zkey__")
    )
