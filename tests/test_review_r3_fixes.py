"""Regression tests for the round-3 self-review findings: literal-class
gating in prepared serving, nested-barrier rejection, emu fallbacks,
eviction-safe close(), bookkeeping caps, decimal keys."""

import pytest
from pyspark.sql import functions as F

from grasper_spark import G, PropertyGraph
from grasper_spark.plans.prepared import PrepareError, PreparedQuery, prepare


def test_cross_class_literal_never_served_from_numeric_shape(modern):
    from grasper_spark import G

    gi = G(modern)
    # trip auto-prepare on the numeric-literal shape
    for n in (27, 29, 32):
        gi.query(f'g.V().has("age",{n}).values("name")').collect()
    assert sum(1 for v in gi._auto_prepared.values() if v) == 1
    # a STRING literal on the same steps is a different shape AND the
    # predicate type gate makes it empty — must not crash, must be empty
    assert gi.query('g.V().has("age","zzz").values("name")').collect() == []
    assert gi.query('g.V().has("age","29").values("name")').collect() == []


def test_prepared_rows_class_gate(g):
    p = prepare(g, 'g.V().has("age",$RAND).values("name")')
    assert p.rows("zzz") == []      # was: int('zzz') ValueError
    assert p.rows("29") == []       # string literal ≠ numeric 29
    assert p.rows(True) == []       # bool is not num
    assert p.rows(29) == [("marko",)]
    ps = prepare(g, 'g.V().has("name","$RAND").values("age")')
    assert ps.rows(29) == []        # num literal on string key
    assert ps.rows("marko") == [(29,)]


def test_nested_union_barrier_rejected(g):
    with pytest.raises(PrepareError, match="union"):
        prepare(g, 'g.V().has("age",$RAND).union(out("knows").count())')
    # nested coin inside a branch is rejected too (deep _UNSUPPORTED)
    with pytest.raises(PrepareError, match="not preparable"):
        prepare(g, 'g.V().has("age",$RAND).and(out().coin(0.5))')


def test_auto_prepare_skips_nested_union_barrier(modern):
    gi = G(modern)
    q = 'g.V().has("age",{}).union(out("knows").count())'
    base = {n: sorted(r.val for r in gi.query(q.format(n)).collect())
            for n in (27, 29, 32)}
    # shape never auto-prepares (deep name check catches the barrier)
    assert not any(v for v in gi._auto_prepared.values())
    for n, want in base.items():
        got = sorted(r.val for r in gi.query(q.format(n)).collect())
        assert got == want


def test_emu_empty_domain_template_falls_back(g):
    from grasper_spark.emu import run_emu

    # 'created' targets have no outgoing 'nosuch' edges: the prepared
    # materialization is empty for every name — emu must fall back to
    # per-query, not abort
    cfg = ("5 2\n1\n"
           'g.V().has("name","$RAND").out("nosuchlabel").values("name")  name  10\n')
    res = run_emu(g, cfg, max_queries=4)
    assert res.total_queries == 4
    assert res.template_modes == {0: "per-query"}


def test_closed_prepared_still_serves(g):
    # an evicted/closed instance held by a concurrent thread keeps
    # working (uncached scan), both tiers
    p = prepare(g, 'g.V().has("name","$RAND").values("age")')
    p.close()
    assert p.rows("marko") == [(29,)]
    assert p.df("marko").collect()[0][0] == 29


def test_decimal_param_keys_roundtrip(spark):
    v = spark.createDataFrame(
        [(1, "x", "5694.03"), (2, "x", "11.50")],
        "vid long, label string, bal string",
    ).withColumn("bal", F.col("bal").cast("decimal(12,2)"))
    e = spark.createDataFrame([], "src long, dst long, label string")
    gd = G(PropertyGraph(v, e))
    p = PreparedQuery(gd, 'g.V().has("bal",$RAND)')
    assert p.param_dtype.startswith("decimal")
    assert [r for r in p.rows(5694.03)] == [(1,)]
    assert p.rows(11.5) == [(2,)]
    assert p.rows(99.99) == []


def test_shape_bookkeeping_bounded(modern):
    gi = G(modern)
    gi.AUTO_PREPARE_AFTER = 10**9  # count only, never materialize
    for i in range(20):
        gi.query(f'g.V().has("age",{i}).values("name")').collect()
        gi.query(f'g.V().has("age",{i}).label()').collect()
    # distinct literals collapse into per-shape counters, not per-query
    assert len(gi._shape_seen) == 2
