"""The reference paper's 8 OLAP query templates (Grasper_SoCC19.pdf
Table 4; shapes reproduced in BASELINE.md) run end-to-end on the
tpch-graph projection, plus string-vs-fluent parity across the step
surface."""

import pytest

from grasper_spark import G, P
from grasper_spark.plans.api import A, Order
from grasper_spark.sources import load_tpch_graph

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tg(spark):
    return G(load_tpch_graph(spark, SF).cache())


def _vals(df):
    return sorted([r[0] for r in df.collect()], key=str)


# Q1: g.V().has(f).properties(p)
def test_q1_shape(tg):
    got = _vals(tg.V().has("name", "NATION_3").properties("name").df())
    assert got == ["{name:NATION_3}"]


# Q2: g.V().hasKey(f1).hasLabel(l).has(f2)
def test_q2_shape(tg):
    got = tg.V().hasKey("acctbal").hasLabel("customer").has(
        "mktsegment", P.eq("BUILDING")
    ).count().to_list()
    assert got[0] > 0


# Q3: g.V().has(f).in(l).values(k).max()
def test_q3_shape(tg):
    got = tg.V().has("name", "NATION_3").in_("from_nation").values("acctbal").max_().to_list()
    assert len(got) == 1 and isinstance(got[0], float)


# Q4: g.E().has(f1).outV().dedup().has(f2).count()
def test_q4_shape_full(tg):
    # note the has() AFTER dedup on the vertex stream — exercises lazy
    # property attachment post-traversal
    got = tg.E().hasLabel("contains").has("quantity", P.gt(30.0)).outV().dedup().has(
        "totalprice", P.gt(100000.0)
    ).count().to_list()
    assert got[0] >= 0


# Q5: g.E().has(f1).not(outV().has(f2)).groupCount(k)
def test_q5_shape(tg):
    df = (
        tg.E().hasLabel("placed").has("orderdate", P.gte("1997-01-01"))
        .not_(A.outV().has("mktsegment", P.eq("BUILDING")))
        .groupCount("orderdate", relational=True).df()
    )
    rows = df.collect()
    assert len(rows) > 0 and all(r["cnt"] >= 1 for r in rows)


# Q6: g.V().has(f).and(out(l1).values(k1).min().is(p1), in(l2).count().is(p2)).values(k2)
def test_q6_shape(tg):
    got = _vals(
        tg.V().hasLabel("nation")
        .and_(
            A.in_("from_nation").values("acctbal").min_().is_(P.lt(0.0)),
            A.in_("from_nation").count().is_(P.gte(3)),
        )
        .values("name").df()
    )
    # verify against a direct computation
    import pyspark.sql.functions as F

    v, e = tg.graph.vertices, tg.graph.edges
    members = (
        e.filter(F.col("label") == "from_nation")
        .join(v.select(F.col("vid").alias("src"), "acctbal"), "src")
        .groupBy("dst")
        .agg(F.min("acctbal").alias("mn"), F.count("*").alias("cnt"))
        .filter((F.col("mn") < 0.0) & (F.col("cnt") >= 3))
        .select(F.col("dst").alias("vid"))
    )
    want = sorted(
        r["name"] for r in members.join(v, "vid").select("name").collect()
    )
    assert got == want


# Q7: g.V().has(f1).as('a').union(out(l1), out(l2).out(l3)).in(l4)
#     .where(neq('a')).has(f2).order(p).limit(n)
def test_q7_shape(tg):
    df = (
        tg.V().hasLabel("supplier").has("acctbal", P.gt(0.0)).as_("a")
        .union(A.out("supplies"), A.out("from_nation").in_("from_nation").out("supplies"))
        .in_("supplies")
        .where(P.neq("a"))
        .has("acctbal", P.gt(0.0))
        .values("acctbal")
        .order(direction=Order.decr)
        .limit(10)
        .df()
    )
    vals = [r[0] for r in df.collect()]
    assert len(vals) <= 10 and vals == sorted(vals, reverse=True)


# Q8: g.V().has(f1).aggregate('a').in(l1).out(l2).has(f2).where(without('a'))
def test_q8_shape(tg):
    got = (
        tg.V().hasLabel("order").has("totalprice", P.gt(150000.0)).aggregate("a")
        .in_("placed").out("placed").has("orderstatus", P.eq("F"))
        .where(P.without("a")).dedup().count().to_list()
    )
    assert got[0] >= 0


# ---- string-vs-fluent parity across the step surface ----

PAIRS = [
    ('g.V().hasNot("acctbal").count()',
     lambda t: t.V().hasNot("acctbal").count()),
    ('g.V().hasKey("acctbal").hasLabel("supplier").count()',
     lambda t: t.V().hasKey("acctbal").hasLabel("supplier").count()),
    ('g.V().hasValue("ASIA").label()',
     lambda t: t.V().hasValue("ASIA").label()),
    ('g.V().hasLabel("region").values("name").order()',
     lambda t: t.V().hasLabel("region").values("name").order()),
    ('g.V().hasLabel("region").order("name", decr).values("name")',
     lambda t: t.V().hasLabel("region").order("name", Order.decr).values("name")),
    ('g.V().hasLabel("nation").values("name").order().range(2, 4)',
     lambda t: t.V().hasLabel("nation").values("name").order().range_(2, 4)),
    ('g.V().hasLabel("nation").count().is(gte(25))',
     lambda t: t.V().hasLabel("nation").count().is_(P.gte(25))),
    ('g.V().hasLabel("customer").values("acctbal").mean()',
     lambda t: t.V().hasLabel("customer").values("acctbal").mean()),
    ('g.V().hasLabel("customer").values("acctbal").sum()',
     lambda t: t.V().hasLabel("customer").values("acctbal").sum_()),
    ('g.V().hasLabel("region").as("r").out("in_region").count()',
     lambda t: t.V().hasLabel("region").as_("r").out("in_region").count()),
    ('g.V().hasLabel("nation").where(not(in("from_nation"))).count()',
     lambda t: t.V().hasLabel("nation").not_(A.in_("from_nation")).count()),
    ('g.V().hasLabel("region").properties("name")',
     lambda t: t.V().hasLabel("region").properties("name")),
    ('g.V().hasLabel("region").key()',
     lambda t: t.V().hasLabel("region").key()),
    ('g.V().hasLabel("nation").group("label", "name")',
     lambda t: t.V().hasLabel("nation").group("label", "name")),
    ('g.V().hasLabel("region").values("name").aggregate("x").cap("x")',
     lambda t: t.V().hasLabel("region").values("name").aggregate("x").cap("x")),
    ('g.E().hasLabel("in_region").outV().dedup().count()',
     lambda t: t.E().hasLabel("in_region").outV().dedup().count()),
    ('g.E().hasLabel("contains").has("quantity", between(10, 20)).count()',
     lambda t: t.E().hasLabel("contains").has("quantity", P.between(10, 20)).count()),
    ('g.V().hasLabel("region").repeat(in("in_region")).count()',
     lambda t: t.V().hasLabel("region").repeat(A.in_("in_region")).count()),
]


@pytest.mark.parametrize("qstr", [p[0] for p in PAIRS])
def test_string_fluent_parity(tg, qstr):
    fluent = dict((p[0], p[1]) for p in PAIRS)[qstr]
    got_s = sorted([tuple(r) for r in tg.query(qstr).collect()], key=str)
    got_f = sorted([tuple(r) for r in fluent(tg).df().collect()], key=str)
    assert got_s == got_f, f"{qstr}: string {got_s[:3]} != fluent {got_f[:3]}"


def test_where_two_label_form(tg):
    # where('a', eq('b')) — compare two history labels
    got = (
        tg.V().hasLabel("supplier").as_("a").out("supplies").in_("supplies").as_("b")
        .where("a", P.eq("b")).count().to_list()
    )
    # (a == b) pairs = supplier reaching itself through a shared part
    got2 = (
        tg.V().hasLabel("supplier").as_("a").out("supplies").in_("supplies")
        .where(P.eq("a")).count().to_list()
    )
    assert got == got2


def test_dedup_multi_label(tg):
    got = (
        tg.V().hasLabel("supplier").as_("a").out("supplies").as_("b").in_("supplies")
        .dedup("a", "b").count().to_list()
    )
    # one row per distinct (supplier, part) pair — the supplies edge count
    want = tg.E().hasLabel("supplies").count().to_list()
    assert got == want
