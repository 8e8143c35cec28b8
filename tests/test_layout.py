"""Z-order layout: Morton key correctness vs a Python reference, and
the pruning payoff it exists for (tight per-file bounds in BOTH dims)."""

import pytest


def _morton_ref(vals, bits):
    key = 0
    for b in range(bits):
        for d, v in enumerate(vals):
            key |= ((v >> b) & 1) << (b * len(vals) + d)
    return key


def test_zorder_key_matches_reference(spark):
    from grasper_spark.sources.layout import zorder_key

    rows = [(x, y) for x in (0, 1, 5, 100, 65535) for y in (0, 3, 64, 4095)]
    df = spark.createDataFrame(rows, ["x", "y"])
    got = {
        (r.x, r.y): r.k
        for r in df.select("x", "y", zorder_key("x", "y", bits=16).alias("k")).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _morton_ref([x & 0xFFFF, y & 0xFFFF], 16)


def test_zorder_key_clamps_and_validates(spark):
    from pyspark.sql import functions as F

    from grasper_spark.sources.layout import zorder_key

    df = spark.createDataFrame([(1 << 40, -5)], ["x", "y"])
    r = df.select(zorder_key("x", "y", bits=8).alias("k")).collect()[0]
    assert r.k == _morton_ref([255, 0], 8)  # clamped top / floor
    with pytest.raises(ValueError, match="63 key bits"):
        zorder_key("x", "y", "z", bits=22)
    with pytest.raises(ValueError, match="at least one"):
        zorder_key()


def test_zorder_layout_tightens_both_dims(spark, tmp_path):
    """The point of the curve: with a linear (x-sorted) layout, a filter
    on y touches EVERY file; z-ordered, both x and y filters localize.
    Measured as per-file span of each dim — no Delta required."""
    import math

    from pyspark.sql import functions as F

    from grasper_spark.sources.layout import zorder_layout

    n, files = 64, 16
    pts = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], ["x", "y"]
    )

    def mean_span(df, col):
        rows = (
            df.withColumn("f", F.spark_partition_id())
            .groupBy("f")
            .agg((F.max(col) - F.min(col)).alias("s"))
            .collect()
        )
        return sum(r.s for r in rows) / len(rows)

    linear = pts.repartitionByRange(files, "x").sortWithinPartitions("x")
    z = zorder_layout(pts, "x", "y", bits=6, num_partitions=files)
    # linear: x-span per file is tiny but y-span is the full domain
    assert mean_span(linear, "y") >= n - 1
    # z-order: BOTH dims bounded well below the domain (sqrt-ish tiles)
    z_x, z_y = mean_span(z, "x"), mean_span(z, "y")
    assert z_x <= n / 2 and z_y <= n / 2, (z_x, z_y)
    # and the layout is a pure reordering
    assert z.count() == n * n
