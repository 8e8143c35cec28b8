"""Golden tests on the TinkerPop 'modern' graph (FIXTURES.md §1).

Hand-computed expected answers; graph picture:
/root/reference/data/graph-example-1.jpg.
"""

from conftest import vals

from grasper_spark import P
from grasper_spark.plans.api import A, Order


def test_v_count(g):
    assert vals(g.V().count()) == [6]


def test_e_count(g):
    assert vals(g.E().count()) == [6]


def test_haslabel_count(g):
    assert vals(g.V().hasLabel("person").count()) == [4]


def test_first_real_query(g):
    # the SURVEY.md §7 phase-1 spine query
    assert vals(g.V().has("name", "marko").out("knows").values("age")) == [27, 32]


def test_has_gt(g):
    assert vals(g.V().has("age", P.gt(29)).values("name")) == ["josh", "peter"]


def test_out_dedup_count(g):
    assert vals(g.V().out("created").dedup().count()) == [2]


def test_edge_weight_filter(g):
    assert vals(g.E().has("weight", P.gte(0.5)).count()) == [3]


def test_both(g):
    # lop's neighbors via both(): in-edges from 1,4,6 (created); no out
    assert vals(g.V().has("name", "lop").both().values("name")) == [
        "josh",
        "marko",
        "peter",
    ]


def test_in_traversal(g):
    assert vals(g.V().has("name", "lop").in_("created").values("name")) == [
        "josh",
        "marko",
        "peter",
    ]


def test_oute_inv(g):
    assert vals(g.V().has("name", "marko").outE("knows").inV().values("name")) == [
        "josh",
        "vadas",
    ]


def test_outv_from_edges(g):
    assert vals(g.E().has("weight", P.eq(1.0)).outV().values("name")) == [
        "josh",
        "marko",
    ]


def test_bothv(g):
    assert vals(g.E().has("weight", P.eq(0.5)).bothV().values("name")) == [
        "marko",
        "vadas",
    ]


def test_values_missing_key_drops(g):
    # only persons have age; software rows are DROPPED, not null
    assert vals(g.V().values("age")) == [27, 29, 32, 35]


def test_values_multi(g):
    assert vals(g.V().has("name", "lop").values("name", "lang")) == ["java", "lop"]


def test_label_step(g):
    assert vals(g.V().label()) == ["person"] * 4 + ["software"] * 2


def test_key_step(g):
    assert vals(g.V().has("name", "marko").key()) == ["age", "name"]


def test_properties_format(g):
    # reference format: {key:value} (utils/tool.hpp:295-301)
    assert vals(g.V().has("name", "marko").properties()) == ["{age:29}", "{name:marko}"]


def test_properties_double_format(g):
    # DebugString double rendering (utils/tool.hpp:334-368)
    assert vals(g.E().has("weight", P.eq(0.5)).properties("weight")) == ["{weight:0.500000}"]
    assert vals(
        g.V().has("name", "josh").outE("created").has("weight", P.eq(1.0)).properties("weight")
    ) == ["{weight:1}"]


def test_is_pred(g):
    assert vals(g.V().values("age").is_(P.inside(27, 32))) == [29]


def test_is_between(g):
    assert vals(g.V().values("age").is_(P.between(27, 32))) == [27, 29, 32]


def test_is_outside(g):
    assert vals(g.V().values("age").is_(P.outside(27, 32))) == [35]


def test_within_literal(g):
    assert vals(g.V().has("name", P.within("marko", "lop")).label()) == [
        "person",
        "software",
    ]


def test_hasnot(g):
    assert vals(g.V().hasNot("age").values("name")) == ["lop", "ripple"]


def test_haskey(g):
    assert vals(g.V().hasKey("lang").count()) == [2]


def test_hasvalue(g):
    assert vals(g.V().hasValue("java").values("name")) == ["lop", "ripple"]


def test_sum_mean_max_min(g):
    assert vals(g.V().values("age").sum_()) == [123.0]
    assert vals(g.V().values("age").max_()) == [35.0]
    assert vals(g.V().values("age").min_()) == [27.0]
    assert vals(g.V().values("age").mean()) == [30.75]


def test_dedup_values(g):
    assert vals(g.V().out("created").values("lang").dedup()) == ["java"]


def test_order_values(g):
    assert g.V().values("age").order().to_list() == [27, 29, 32, 35]
    assert g.V().values("age").order(direction=Order.decr).to_list() == [35, 32, 29, 27]


def test_order_by_key(g):
    # order('age') drops elements without the key, sorts by it
    assert g.V().order("age").values("name").to_list() == [
        "vadas",
        "marko",
        "josh",
        "peter",
    ]


def test_limit_after_order(g):
    assert g.V().values("age").order(direction=Order.decr).limit(2).to_list() == [35, 32]


def test_range_after_order(g):
    # range(a,b) inclusive (barrier_expert.hpp:870-958)
    assert g.V().values("age").order().range_(1, 2).to_list() == [29, 32]


def test_skip_after_order(g):
    assert g.V().values("age").order().skip(2).to_list() == [32, 35]


def test_skip_after_order_desc(g):
    assert g.V().values("age").order(direction=Order.decr).skip(2).to_list() == [29, 27]


def test_skip_with_boundary_ties(g):
    # all four created-edges point at 'java' software: the skip boundary
    # value ties with every row — exactly n must be dropped
    assert g.V().out("created").values("lang").order().skip(3).to_list() == ["java"]
    assert g.V().out("created").values("lang").order().skip(4).to_list() == []


def test_skip_past_end(g):
    assert g.V().values("age").order().skip(9).to_list() == []


def test_bare_skip_and_range(g):
    # no declared order: positional slice over a deterministic
    # arbitrary order (reference slices arrival order)
    assert g.V().skip(2).df().count() == 4
    assert g.V().range_(1, 3).df().count() == 3
    a = sorted(r[0] for r in g.V().range_(1, 3).df().collect())
    b = sorted(r[0] for r in g.V().range_(1, 3).df().collect())
    assert a == b  # deterministic across runs
    # positions partition the stream: [1,3] and skip(4) are disjoint,
    # and together with position 0 cover all 6 vertices
    mid = set(r[0] for r in g.V().range_(1, 3).df().collect())
    tail = set(r[0] for r in g.V().skip(4).df().collect())
    assert not mid & tail and len(mid | tail) == 5


def test_as_where_neq(g):
    # marko's created targets' creators, excluding marko himself
    assert vals(
        g.V().has("name", "marko").as_("a").out("created").in_("created")
        .where(P.neq("a")).values("name")
    ) == ["josh", "peter"]


def test_as_select_single(g):
    # select('a') returns the recorded vid per surviving traverser
    assert vals(
        g.V().hasLabel("person").as_("a").out("knows").select("a")
    ) == [1, 1]


def test_select_multi_format(g):
    # "[a:v, b:v]" formatting (select_expert.hpp:70-138)
    assert vals(
        g.V().has("name", "marko").as_("a").out("knows").has("age", 32).as_("b").select("a", "b")
    ) == ["[a:1, b:4]"]


def test_dedup_by_history(g):
    # one row per distinct 'a' (first per group)
    assert vals(
        g.V().hasLabel("person").as_("a").out("created").dedup("a").count()
    ) == [3]


def test_group_count_label(g):
    assert vals(g.V().groupCount("label")) == ["person:4", "software:2"]


def test_group_count_by_value(g):
    assert vals(g.V().out("created").groupCount()) == ["3:3", "5:1"]


def test_group_key_value(g):
    assert vals(g.V().hasLabel("person").group("label", "name")) == [
        "person:[josh, marko, peter, vadas]"
    ]


def test_group_by_prop(g):
    assert vals(g.V().hasLabel("software").group("lang", "name")) == [
        "java:[lop, ripple]"
    ]


def test_aggregate_where_without(g):
    # persons marko knows, then persons NOT in that set
    assert vals(
        g.V().has("name", "marko").out("knows").aggregate("x")
        .in_("knows").out("knows").where(P.without("x")).values("name")
    ) == []  # marko knows vadas+josh; in(knows) of them = marko; out again = vadas,josh → all within


def test_aggregate_where_within(g):
    assert vals(
        g.V().has("name", "marko").out("knows").aggregate("x")
        .in_("knows").out("knows").where(P.within("x")).values("name")
    ) == ["josh", "josh", "vadas", "vadas"]  # multiplicity: 2 traversers re-expand


def test_cap_format(g):
    # "x:[v1, v2]" (barrier_expert.hpp:366-430); ours sorts values
    assert vals(g.V().hasLabel("person").values("age").aggregate("x").cap("x")) == [
        "x:[27, 29, 32, 35]"
    ]


def test_union(g):
    assert vals(
        g.V().has("name", "marko").union(A.out("knows"), A.out("created")).values("name")
    ) == ["josh", "lop", "vadas"]


def test_union_scalar(g):
    assert vals(
        g.V().has("name", "marko").union(A.values("age"), A.out("knows").values("age"))
    ) == [27, 29, 32]


def test_repeat_is_union_single_pass(g):
    # reference repeat == single pass (core/parser.cpp:1305-1318)
    assert vals(g.V().has("name", "marko").repeat(A.out("knows")).values("name")) == [
        "josh",
        "vadas",
    ]


def test_repeat_times_extension(g):
    assert vals(g.V().has("name", "marko").repeat(A.out(), times=2).values("name")) == [
        "lop",
        "ripple",
    ]


def test_and_branches(g):
    # persons who both know someone and created something: only marko
    # (josh creates but knows nobody — knows edges are 1→2, 1→4 only)
    got = vals(g.V().hasLabel("person").and_(A.out("knows"), A.out("created")).values("name"))
    assert got == ["marko"]


def test_or_branches(g):
    got = vals(g.V().hasLabel("person").or_(A.out("knows"), A.out("created")).values("name"))
    assert got == ["josh", "marko", "peter"]


def test_not_branch(g):
    got = vals(g.V().hasLabel("person").not_(A.out()).values("name"))
    assert got == ["vadas"]


def test_and_with_barrier_per_traverser(g):
    # Q6 shape: barrier inside labelled branch groups per input traverser
    # (get_branch_key, barrier_expert.hpp:70-99)
    got = vals(
        g.V().hasLabel("person")
        .and_(A.out("created").count().is_(P.gte(2)))
        .values("name")
    )
    assert got == ["josh"]


def test_where_subquery_is_and(g):
    got = vals(g.V().hasLabel("person").where(A.out("created")).values("name"))
    assert got == ["josh", "marko", "peter"]


def test_coin_seeded(g):
    n = g.V().coin(0.5).count().to_list()[0]
    assert 0 <= n <= 6


def test_string_query_parity(g):
    df = g.query('g.V().has("name","marko").out("knows").values("age")')
    assert sorted(r[0] for r in df.collect()) == [27, 32]


def test_string_query_predicates(g):
    df = g.query("g.V().has('age', gt(29)).values('name')")
    assert sorted(r[0] for r in df.collect()) == ["josh", "peter"]


def test_string_query_union_where(g):
    df = g.query(
        "g.V().has('name','marko').as('a').union(out('knows'), out('created')).where(neq('a')).count()"
    )
    assert [r[0] for r in df.collect()] == [3]


def test_string_query_order_limit(g):
    df = g.query("g.V().values('age').order(decr).limit(2)")
    assert [r[0] for r in df.collect()] == [35, 32]


def test_string_query_groupcount(g):
    df = g.query("g.V().groupCount('label')")
    assert sorted(r[0] for r in df.collect()) == ["person:4", "software:2"]


def test_build_index_command(g):
    assert g.query("BuildIndex(V, 'name')").collect()[0][0] == "Index is enabled"


def test_set_config_command(g):
    assert g.query("SetConfig('caching', 'true')").collect()[0][0] == "Config modified"


def test_build_index_converts_point_lookup(modern):
    from grasper_spark import G

    gi = G(modern)
    assert gi.query("BuildIndex(V, 'name')").collect()[0][0] == "Index is enabled"
    # point has() right after V(): 1/6 elements match < ratio 0.2 → the
    # scan converts to a posting-list lookup (parser.cpp:991-1081)
    t = gi.V().has("name", "marko").out("knows").values("age")
    c, stream = t._compile()
    assert c.index_hits == 1
    df = c.result_df(stream)
    assert sorted(r[0] for r in df.collect()) == [27, 32]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan  # reads the cached posting relation
    # non-selective predicate (6/6 match ≥ ratio 0.2) keeps the full scan
    c2, _ = gi.V().has("name", P.neq("zzz")).count()._compile()
    assert c2.index_hits == 0
    # filters NOT in the leading run don't convert
    c3, s3 = gi.V().out("knows").has("name", "vadas")._compile()
    assert c3.index_hits == 0
    assert sorted(r[0] for r in c3.result_df(s3).collect()) == [2]
    # path mode never converts (the initial location must be recorded)
    c4, s4 = gi.V().has("name", "marko").out("knows").path()._compile()
    assert c4.index_hits == 0
    assert sorted(r[0] for r in c4.result_df(s4).collect()) == ["[1, 2]", "[1, 4]"]


def test_build_index_respects_indexing_config(modern):
    from grasper_spark import G

    gi = G(modern)
    gi.query("SetConfig('indexing', 'false')")
    assert gi.query("BuildIndex(V, 'name')").collect()[0][0] == "Index is disabled"
    gi.query("SetConfig('indexing', 'true')")
    assert gi.query("BuildIndex(V, 'name')").collect()[0][0] == "Index is enabled"
    c, _ = gi.V().has("name", "marko").count()._compile()
    assert c.index_hits == 1
    # disabling indexing after the build observably stops conversion
    gi.query("SetConfig('indexing', 'false')")
    c2, s2 = gi.V().has("name", "marko").count()._compile()
    assert c2.index_hits == 0
    assert [r[0] for r in c2.result_df(s2).collect()] == [1]


def test_set_config_caching_observable(modern):
    from grasper_spark import G

    gi = G(modern)
    q = "g.V().count()"
    assert gi.query(q) is gi.query(q)  # plan cache hit
    gi.query("SetConfig('caching', 'false')")
    assert gi.query(q) is not gi.query(q)  # observably disabled
    gi.query("SetConfig('caching', 'true')")
    assert gi.query(q) is gi.query(q)


def test_fluent_plan_cache(modern):
    # fluent traversals share G.query's plan cache: identical step
    # chains return the SAME DataFrame (plan construction reused;
    # execution still runs per count/collect), and every invalidation
    # channel — SetConfig, BuildIndex, refresh — drops the entry
    from grasper_spark import G

    gi = G(modern)
    d1 = gi.V().hasLabel("person").count().df()
    assert gi.V().hasLabel("person").count().df() is d1
    # different steps / different seed miss
    assert gi.V().hasLabel("software").count().df() is not d1
    gi.query("SetConfig('seed', '7')")
    d2 = gi.V().hasLabel("person").count().df()
    assert d2 is not d1  # epoch bumped + seed in key
    gi.query("BuildIndex(V, 'name')")
    assert gi.V().hasLabel("person").count().df() is not d2
    gi.query("SetConfig('caching', 'false')")
    d3 = gi.V().hasLabel("person").count().df()
    assert gi.V().hasLabel("person").count().df() is not d3
    gi.query("SetConfig('caching', 'true')")
    # results are correct through the cache
    assert gi.V().hasLabel("person").count().to_list() == [4]
    assert gi.V().hasLabel("person").count().to_list() == [4]


def test_set_config_seed_rewires_coin(modern):
    from grasper_spark import G

    gi = G(modern)
    gi.query("SetConfig('seed', '7')")
    assert gi.V()._seed == 7


def test_set_config_rejects_unknown_key(modern):
    import pytest

    from grasper_spark import G

    gi = G(modern)
    with pytest.raises(ValueError, match="valid keys"):
        gi.query("SetConfig('cachng', 'true')")  # typo must not be stored
    assert "cachng" not in gi._config
    # the reference's inert knobs are accepted without effect
    gi.query("SetConfig('core_bind', 'true')")
    assert gi._config["core_bind"] == "true"


def test_set_config_step_reorder_observable(modern):
    from grasper_spark import G

    gi = G(modern)
    fused = gi.V().dedup().count()
    plan_on = fused.df()._jdf.queryExecution().optimizedPlan().toString()
    assert "row_number" not in plan_on  # dedup().count() fused to distinct
    gi.query("SetConfig('step_reorder', 'false')")
    plan_off = gi.V().dedup().count().df()._jdf.queryExecution().optimizedPlan().toString()
    assert "row_number" in plan_off  # literal dedup survivor window kept
    # same answer either way
    assert gi.V().dedup().count().to_list() == [6]
    gi.query("SetConfig('step_reorder', 'true')")
    assert gi.V().dedup().count().to_list() == [6]


def test_ill_typed_chain_raises_compile_error(g):
    import pytest

    from grasper_spark.plans.compiler import CompileError

    # out() on a scalar stream — rejected at plan time like the
    # reference's io_type state machine (core/parser.cpp:161-215)
    with pytest.raises(CompileError, match="out"):
        g.V().values("age").out("knows").df()
    with pytest.raises(CompileError, match="is"):
        g.V().is_(__import__("grasper_spark").P.gt(1)).df()
    with pytest.raises(CompileError, match="select"):
        g.V().select("nosuchlabel").df()


def test_inject_appends_scalar_traversers(g):
    import pytest

    from grasper_spark.plans.compiler import CompileError

    # values + injected literals flow through downstream barriers
    got = sorted(g.V().values("age").inject(99, 1).to_list())
    base = sorted(g.V().values("age").to_list())
    assert got == sorted(base + [99, 1])
    assert g.V().values("age").inject(99).count().to_list() == [len(base) + 1]
    # string-surface parity
    assert sorted(
        r.val for r in g.query('g.V().values("name").inject("zzz")').collect()
    ) == sorted(g.V().values("name").to_list() + ["zzz"])
    # injected traversers carry no history: where() drops them
    aged = (
        g.V().as_("a").values("age").inject(99)
        .where(P.neq("a")).df().count()
    )
    assert aged == g.V().as_("a").values("age").where(P.neq("a")).df().count()
    # union typing rules
    with pytest.raises(CompileError, match="inject"):
        g.V().values("age").inject("not-a-number").df()
    with pytest.raises(CompileError, match="scalar"):
        g.V().inject(1).df()


def test_math_on_string_stream_raises_compile_error(g):
    import pytest

    from grasper_spark.plans.compiler import CompileError

    with pytest.raises(CompileError, match="numeric"):
        g.V().label().max_().df()
    with pytest.raises(CompileError, match="numeric"):
        g.V().values("name").sum_().df()


def test_cross_class_predicates_never_match(g):
    # numeric predicate on a string property / string stream: the
    # reference's mismatched-type compare is never equal
    # (base/predicate.cpp:28-44) — no ANSI cast error, no match;
    # neq of a PRESENT value against a different class is true
    from grasper_spark import P

    assert g.V().has("name", P.eq(0)).df().count() == 0
    assert g.V().has("name", P.gt(5)).df().count() == 0
    assert g.V().has("name", P.between(1, 9)).df().count() == 0
    n = g.V().has("name").df().count()
    assert g.V().has("name", P.neq(0)).df().count() == n
    assert g.V().label().is_(P.eq(3)).df().count() == 0
    lbls = g.V().label().df().count()
    assert g.V().label().is_(P.neq(3)).df().count() == lbls
    # within considers only same-class members; without is its complement
    assert g.V().has("name", P.within(1, "marko", 2)).to_list() != []
    assert (
        g.V().has("name", P.within(1, 2)).df().count() == 0
    )
    assert g.V().has("name", P.without(1, 2)).df().count() == n


def test_union_branch_dtype_mismatch_raises_compile_error(g):
    import pytest

    from grasper_spark.plans.api import A
    from grasper_spark.plans.compiler import CompileError

    # numeric vs string scalar branches — plan-time rejection (io_type
    # parity) instead of a deep Spark unionByName analysis error
    with pytest.raises(CompileError, match="dtype"):
        g.V().union(A.values("age"), A.values("name")).df()
    # numeric widths may mix (Spark coerces int/double)
    g.V().union(A.values("age"), A.values("age")).df()


def test_path_extension(g):
    # parity-plus: path() records each traverser location
    got = vals(g.V().has("name", "marko").out("knows").path())
    assert got == ["[1, 2]", "[1, 4]"]
    got2 = vals(g.V().has("name", "marko").outE("knows").inV().values("name").path())
    assert got2 == ["[1, 1->2, 2, vadas]", "[1, 1->4, 4, josh]"]
    got3 = sorted(
        r[0] for r in g.query('g.V().has("name","marko").out("created").path()').collect()
    )
    assert got3 == ["[1, 3]"]


def test_path_after_barrier_rejected(g):
    import pytest

    from grasper_spark.plans.compiler import CompileError

    with pytest.raises(CompileError, match="path"):
        g.V().count().path().df()


def test_optional_extension(g):
    # persons take their out('knows') neighbors if any, else stay
    got = vals(g.V().hasLabel("person").optional(A.out("knows")).values("name"))
    # marko → {vadas, josh}; vadas/josh/peter have no knows → themselves
    assert got == ["josh", "josh", "peter", "vadas", "vadas"]
    got2 = sorted(r[0] for r in g.query(
        'g.V().hasLabel("person").optional(out("knows")).values("name")').collect())
    assert got2 == got


def test_select_scalar_history_type(g):
    # as() after values() captures a scalar; select must keep its type
    df = (
        g.V().hasLabel("person").values("name").as_("n").select("n").df()
    )
    assert dict(df.dtypes)["val"] == "string"
    assert sorted(r[0] for r in df.collect()) == ["josh", "marko", "peter", "vadas"]


def test_choose_pred_extension(g):
    # ages >30 route to sum() (32+35=67.0); the rest to count() (2)
    got = sorted(
        r[0]
        for r in g.V().hasLabel("person").values("age")
        .choose(P.gt(30), A.sum_(), A.count())
        .df().collect()
    )
    assert got == [2.0, 67.0]


def test_choose_subquery_extension(g):
    # persons who created something -> names; else -> label
    got = sorted(r[0] for r in (
        g.V().hasLabel("person")
        .choose(A.out("created"), A.values("name"), A.label())
        .df().collect()))
    assert got == ["josh", "marko", "person", "peter"]  # vadas -> 'person'


def test_choose_string_form(g):
    got = sorted(r[0] for r in g.query(
        'g.V().hasLabel("person").choose(out("created"), values("name"), label())'
    ).collect())
    assert got == ["josh", "marko", "person", "peter"]


def test_select_multi_double_format(g):
    # DebugString parity for doubles captured in history
    got = vals(
        g.E().has("weight", P.eq(0.5)).values("weight").as_("w")
        .select("w", "w")
    )
    assert got == ["[w:0.500000, w:0.500000]"]


# ---------- project().by() modulators (TinkerPop extension) ----------


def test_project_props_and_subtraversal(g):
    df = (
        g.V().hasLabel("person").project("name", "deg")
        .by("name").by(A.out().count()).df()
    )
    rows = sorted((r["name"], r["deg"]) for r in df.collect())
    # vadas has no out edges -> fast-nothing drops the traverser
    assert rows == [("josh", 2), ("marko", 3), ("peter", 1)]


def test_project_default_by_is_current_value(g):
    df = g.V().has("name", "marko").project("vid", "n").by().by("name").df()
    assert [(r["vid"], r["n"]) for r in df.collect()] == [(1, "marko")]


def test_project_string_query(g):
    df = g.query(
        "g.V().hasLabel('person').project('n','age').by('name').by(values('age'))"
    )
    rows = sorted((r["n"], r["age"]) for r in df.collect())
    assert rows == [("josh", 32), ("marko", 29), ("peter", 35), ("vadas", 27)]


def test_project_vertex_branch_takes_min(g):
    # element-valued branch: deterministic minimum vid stands in for
    # Gremlin's arbitrary 'first'
    df = (
        g.V().has("name", "marko").project("me", "minknow")
        .by("name").by(A.out("knows")).df()
    )
    assert [(r["me"], r["minknow"]) for r in df.collect()] == [("marko", 2)]


def test_group_by_modulators(g):
    assert g.query("g.V().group().by('lang').by('name')").collect()[0][0] == (
        "java:[lop, ripple]"
    )
    got = sorted(r[0] for r in g.query("g.V().groupCount().by('lang')").collect())
    assert got == ["java:2"]


def test_order_by_modulator(g):
    got = [r[0] for r in g.query(
        "g.V().order().by('age', decr).values('name')"
    ).collect()]
    assert got == ["peter", "josh", "marko", "vadas"]


def test_by_modulator_errors(g):
    import pytest
    from grasper_spark.plans.parser import ParseError

    with pytest.raises(ParseError):
        g.query("g.V().by('x')")
    with pytest.raises(ParseError):
        g.V().project("a").by("x").by("y")
    with pytest.raises(ValueError):
        g.V().project("a", "a")


def test_union_branch_barriers(g):
    # group/groupCount/cap are per-branch barriers inside union():
    # each branch runs its own aggregation before the merge
    # (branch-grouped barrier, barrier_expert.hpp applied per sub-plan)
    assert vals(
        g.V().hasLabel("person").union(A.groupCount("age"), A.groupCount("name"))
    ) == sorted(["27:1", "29:1", "32:1", "35:1"] + [
        "josh:1", "marko:1", "peter:1", "vadas:1"
    ])
    # scalar barriers (count/max/min) per branch
    assert vals(
        g.V().union(A.out("knows").count(), A.out("created").count())
    ) == [2, 4]
    # cap over a side-effect store collected before the union
    assert vals(
        g.V().hasLabel("person").values("age").aggregate("x")
        .union(A.cap("x"), A.cap("x"))
    ) == ["x:[27, 29, 32, 35]", "x:[27, 29, 32, 35]"]


def test_sample_deterministic_subset(g):
    # sample(n): n pseudorandom traversers, deterministic per seed,
    # always a subset of the unsampled stream (extension step)
    full = set(vals(g.V().values("name")))
    s1 = vals(g.V().sample(3).values("name"))
    s2 = vals(g.V().sample(3).values("name"))
    assert s1 == s2 and len(s1) == 3 and set(s1) <= full
    # string-query surface
    s3 = sorted(r[0] for r in g.query('g.V().sample(3).values("name")').collect())
    assert s3 == s1
    # n >= stream size keeps everything
    assert len(vals(g.V().sample(100))) == 6


def test_by_traversal_modulators(g):
    # by(sub-traversal) on group/groupCount/order: per-traverser branch
    # value via the tid machinery; traversers with an empty branch drop
    assert vals(
        g.V().hasLabel("person").groupCount().by(A.out("created").count())
    ) == ["1:2", "2:1"]
    assert vals(
        g.V().hasLabel("person").group().by(A.out().count()).by(A.values("name"))
    ) == ["1:[peter]", "2:[josh]", "3:[marko]"]
    # ordered by branch value descending — vadas (0 created) drops
    got = [
        r[0]
        for r in g.query(
            'g.V().hasLabel("person").order().by(out().count(), decr).values("name")'
        ).collect()
    ]
    assert got == ["marko", "josh", "peter"]


def test_match_forward_chain(g):
    # a knows b, b older than 30 → only marko→josh
    got = vals(
        g.V().match(
            A.as_("a").out("knows").as_("b"),
            A.as_("b").has("age", P.gt(30)),
        ).select("a", "b")
    )
    assert got == ["[a:1, b:4]"]


def test_match_cocreator_floating(g):
    # the classic BGP: a and b created the same software — pattern 2's
    # start is never bound forward, so it joins on the shared 'c'
    got = vals(
        g.V().match(
            A.as_("a").out("created").as_("c"),
            A.as_("b").out("created").as_("c"),
        ).where("a", P.neq("b")).select("a", "b")
    )
    assert got == [
        "[a:1, b:4]", "[a:1, b:6]", "[a:4, b:1]",
        "[a:4, b:6]", "[a:6, b:1]", "[a:6, b:4]",
    ]


def test_match_solver_reorder(g):
    # pattern 2 anchors at 'c', which only pattern 3 binds — the solver
    # defers it; software has lang=java so both (b,c) rows survive
    got = vals(
        g.V().match(
            A.as_("a").out("knows").as_("b"),
            A.as_("c").has("lang", "java"),
            A.as_("b").out("created").as_("c"),
        ).select("a", "b", "c")
    )
    assert got == ["[a:1, b:4, c:3]", "[a:1, b:4, c:5]"]


def test_match_string_parser(g):
    got = sorted(
        r[0]
        for r in g.query(
            'g.V().match(as("a").out("knows").as("b"), '
            'as("b").has("age", gt(30))).select("a", "b")'
        ).collect()
    )
    assert got == ["[a:1, b:4]"]


def test_match_cartesian_rejected(g):
    from grasper_spark.plans.compiler import CompileError
    import pytest

    with pytest.raises(CompileError, match="cartesian"):
        g.V().match(
            A.as_("a").out("knows").as_("b"),
            A.as_("x").out("created").as_("y"),
        ).select("a", "x").df()


def test_union_dtype_mismatch_is_plan_time(g):
    # numeric-vs-string branch merge must fail at compile, not deep in
    # Spark analysis (reference parser io_type parity)
    from grasper_spark.plans.compiler import CompileError
    import pytest

    with pytest.raises(CompileError, match="scalar dtype"):
        g.V().union(A.values("age"), A.values("name")).df()


def test_coalesce_first_nonempty_branch(g):
    # creators emit their creations' names; vadas(2) created nothing ->
    # the identity-ish fallback branch fires for him alone
    got = vals(
        g.V().hasLabel("person").coalesce(
            A.out("created").values("name"),
            A.values("name"),
        )
    )
    assert got == ["lop", "lop", "lop", "ripple", "vadas"]


def test_coalesce_three_branches_and_parser(g):
    got = sorted(
        r[0] for r in g.query(
            'g.V().has("name","vadas").coalesce(out("created").values("name"), '
            'out("knows").values("name"), values("name"))'
        ).collect()
    )
    assert got == ["vadas"]  # vadas: no created, no knows -> own name


def test_coalesce_kind_mismatch_rejected(g):
    import pytest
    from grasper_spark.plans.compiler import CompileError

    with pytest.raises(CompileError):
        g.V().coalesce(A.out("created"), A.values("age")).df()


def test_tail_after_order(g):
    got = [r[0] for r in
           g.V().hasLabel("person").values("age").order().tail(2).df().collect()]
    assert got == [32, 35]  # last two of 27,29,32,35 — ascending emission


def test_tail_after_order_desc_and_parser(g):
    got = [r[0] for r in
           g.query('g.V().values("age").order(decr).tail(3)').collect()]
    assert got == [32, 29, 27]  # last 3 of 35,32,29,27 in decr emission


def test_tail_bare_is_deterministic_subset(g):
    a = sorted(r[0] for r in g.V().hasLabel("person").tail(2).df().collect())
    b = sorted(r[0] for r in g.V().hasLabel("person").tail(2).df().collect())
    assert a == b and len(a) == 2


def test_order_multi_key_by_chain(g):
    # primary: created-count desc; secondary: name asc breaks the tie
    # between marko/peter/vadas-ish groups deterministically
    got = [r[0] for r in
           g.V().hasLabel("person")
           .order().by(A.out("created").count(), Order.decr).by("name")
           .values("name").df().collect()]
    # vadas created nothing -> by(sub-traversal) drops him (fast-nothing)
    assert got == ["josh", "marko", "peter"]


def test_order_multi_key_string_parser(g):
    got = [r[0] for r in g.query(
        'g.V().hasLabel("person").order().by(out("created").count(), decr)'
        '.by("name", decr).values("name")'
    ).collect()]
    assert got == ["josh", "peter", "marko"]


def test_order_multi_key_skip_boundary(g):
    # skip past the composite boundary: josh(2 created) first, then
    # marko/peter (1 each, name asc) — skip(2) drops josh+marko; the
    # boundary tie (count=1) resolves by the secondary name key
    got = [r[0] for r in
           g.V().hasLabel("person")
           .order().by(A.out("created").count(), Order.decr).by("name")
           .values("name").skip(2).df().collect()]
    assert got == ["peter"]


def test_order_multi_key_tail(g):
    got = [r[0] for r in
           g.V().hasLabel("person")
           .order().by(A.out("created").count(), Order.decr).by("name")
           .values("name").tail(2).df().collect()]
    assert got == ["marko", "peter"]


def test_textp_predicates(g):
    assert vals(g.V().has("name", P.containing("ark")).values("name")) == ["marko"]
    assert vals(g.V().hasLabel("software").has("name", P.startingWith("lo"))
                .values("name")) == ["lop"]
    assert vals(g.V().has("name", P.endingWith("pple")).values("name")) == ["ripple"]
    assert vals(g.V().hasLabel("person").has("name", P.notContaining("a"))
                .values("name")) == ["josh", "peter"]


def test_textp_string_parser(g):
    got = sorted(r[0] for r in g.query(
        'g.V().has("name", containing("o")).values("name")').collect())
    assert got == ["josh", "lop", "marko"]
    got = sorted(r[0] for r in g.query(
        'g.V().has("name", startingWith("v")).values("name")').collect())
    assert got == ["vadas"]


def test_path_by_property(g):
    got = vals(
        g.V().has("name", "marko").out("knows").path().by("name")
    )
    assert got == ["[marko, josh]", "[marko, vadas]"]


def test_path_by_string_parser_mixed_locations(g):
    # values() locations are scalars — they keep their raw rendering;
    # vertex hops re-render through 'name'
    got = sorted(r[0] for r in g.query(
        'g.V().has("name","marko").out("created").values("lang").path().by("name")'
    ).collect())
    assert got == ["[marko, lop, java]"]


def test_v_point_start(g):
    assert vals(g.V(1).values("name")) == ["marko"]
    assert vals(g.V(1, 4).out("created").values("name")) == ["lop", "lop", "ripple"]
    got = sorted(r[0] for r in g.query('g.V(2, 6).values("name")').collect())
    assert got == ["peter", "vadas"]


def test_e_args_rejected(g):
    import pytest
    from grasper_spark.plans.compiler import CompileError

    with pytest.raises(CompileError):
        g.query("g.E(1).count()").collect()
