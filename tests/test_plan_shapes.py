"""Plan-shape regression tests — the scale contract.

These assert Catalyst does what the architecture relies on (SURVEY.md
§4.1): label filters constant-fold through the projection union and
prune to single table scans; property predicates reach the parquet
scan; small-side traversal joins broadcast."""

import re

import pytest

from grasper_spark import G, P
from grasper_spark.sources import load_tpch_graph

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tg(spark):
    # other test modules may have cached an identical projection plan;
    # CacheManager would then swap InMemoryRelation in for our scans and
    # hide the FileScan shapes these tests assert on.
    spark.catalog.clearCache()
    return G(load_tpch_graph(spark, SF))


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_label_filter_prunes_union_to_one_scan(tg):
    df = tg.V().hasLabel("customer").has("acctbal", P.gt(5000.0)).values("name").df()
    scans = re.findall(r"FileScan parquet \[[^\]]*\]", _plan(df))
    assert len(scans) == 1, f"expected 1 scan, got {scans}"
    # column pruning: only the two needed columns read
    assert "c_name" in scans[0] and "c_acctbal" in scans[0]
    assert "c_mktsegment" not in scans[0]


def test_predicate_reaches_parquet_scan(tg):
    df = tg.V().hasLabel("part").has("retailprice", P.between(900.0, 1100.0)).values("name").df()
    plan = _plan(df)
    assert re.search(r"PushedFilters: \[.*GreaterThanOrEqual\(p_retailprice", plan)


def test_edge_label_filter_prunes_edge_union(tg):
    df = tg.V().has("name", "NATION_3").in_("from_nation").hasLabel("customer").values("acctbal").df()
    plan = _plan(df)
    # only customer-FK and supplier-FK edge branches survive; no
    # lineitem-derived edge scans should remain
    assert "lineitem" not in plan
    assert re.search(r"BroadcastHashJoin", plan)


def test_count_uses_partial_aggregation(tg):
    df = tg.V().count().df()
    plan = _plan(df)
    # partial (map-side) + final HashAggregate — the Catalyst-native
    # analogue of the reference's sender-side partial counts
    assert plan.count("HashAggregate") >= 2


def test_no_python_udfs_in_graph_plans(tg):
    df = (
        tg.V().hasLabel("supplier").as_("a").out("supplies").in_("supplies")
        .where(P.neq("a")).dedup().count().df()
    )
    plan = _plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bare_skip_no_global_window(tg):
    # unordered skip: the full-stream window must be hash-partitioned by
    # the slice bucket; the only SinglePartition exchange is the
    # <=256-row per-bucket offsets rollup (compiler._hashed_slice)
    df = tg.V().hasLabel("customer").skip(5).df()
    plan = _plan(df)
    assert re.search(r"Exchange hashpartitioning\(_sb", plan)
    singles = plan.count("Exchange SinglePartition")
    assert singles <= 1, f"expected only the offsets rollup, got {singles}"


def test_ordered_skip_two_phase(tg):
    # order().skip(n): boundary from TakeOrdered(n); tie resolution in a
    # window partitioned on the sort key — never a global row_number
    df = tg.V().hasLabel("customer").values("acctbal").order().skip(5).df()
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "Exchange SinglePartition" not in plan


def test_ordered_range_is_takeordered(tg):
    # range(a,b) after order(): per-partition top-k, residual window only
    # over the <= b+1 retained rows
    df = tg.V().hasLabel("customer").values("acctbal").order().range_(3, 7).df()
    plan = _plan(df)
    assert "TakeOrderedAndProject(limit=8" in plan


def test_line_dedup_no_cartesian_no_window(spark):
    from grasper_spark.functions.dedup import line_dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(line_dedup(docs, max_df=2))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "Window" not in plan  # reassembly is array_sort, not a window


def test_quota_sample_single_exchange(spark):
    from grasper_spark.functions.sampling import quota_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(quota_sample(docs, "lang", 50).select("doc_id", "lang"))
    assert plan.count("Exchange hashpartitioning") == 1
    # projection pruning reaches the scan despite the window
    scan = re.search(r"FileScan parquet \[[^\]]*\]", plan).group(0)
    assert "text" not in scan


def test_match_floating_pattern_prunes_scans(tg):
    from grasper_spark.plans.api import A

    df = tg.V().hasLabel("supplier").match(
        A.as_("a").has("name", "Supplier#000000001").out("supplies").as_("p"),
        A.as_("b").hasLabel("supplier").out("supplies").as_("p"),
    ).where("b", P.neq("a")).dedup("a", "b").select("a", "b").df()
    scans = re.findall(r"FileScan parquet \[[^\]]*\]", _plan(df))
    # supplier scans + lineitem-derived supplies scans only — the label
    # filters keep the 6-way vertex union and 6-way edge union pruned
    assert 0 < len(scans) <= 4, scans
    assert all(("s_" in s) or ("l_" in s) for s in scans), scans


def test_unigram_lm_no_driver_vocab_no_cartesian(spark):
    from grasper_spark.functions.text import unigram_lm_score

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(unigram_lm_score(docs))
    assert "CartesianProduct" not in plan  # the 1-row total broadcasts


def test_small_side_effect_store_broadcasts_via_aqe(g):
    # where(within('x')) carries NO static broadcast hint (a forced hint
    # is honored until it OOMs at scale); for a small store AQE must
    # still pick a broadcast semi join at RUNTIME from actual stats
    t = (
        g.V().hasLabel("person").values("age").aggregate("x")
        .is_(P.gt(0)).where(P.within("x"))
    )
    df = t.df()
    df.collect()  # finalize the adaptive plan
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in optimized  # no static hint anywhere
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final
    assert "BroadcastHashJoin" in final and "LeftSemi" in final
