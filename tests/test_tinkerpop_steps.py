"""id()/valueMap()/elementMap()/simplePath()/cyclicPath() — TinkerPop
steps beyond the reference's 43-step whitelist (extensions; the
reference has none of these, SURVEY.md §2.7)."""

import pytest

from grasper_spark.plans.api import A
from grasper_spark.plans.parser import ParseError


def vals(t):
    return [r.val for r in t.df().collect()]


def test_id_on_vertices(g):
    got = sorted(vals(g.V().hasLabel("software").id()))
    assert got == [3, 5]


def test_id_on_edges_bitpack(g):
    got = sorted(vals(g.E().id()))
    assert len(got) == 6
    # eid = src<<32 | dst (base/type.hpp bit-pack parity)
    assert (1 << 32) | 2 in got
    assert (6 << 32) | 3 in got


def test_id_rejects_scalar_stream(g):
    from grasper_spark.plans.compiler import CompileError

    with pytest.raises(CompileError, match="id\\(\\)"):
        g.V().values("name").id().df()


def test_value_map_all_keys(g):
    got = vals(g.V().has("name", "marko").valueMap())
    assert got == ["{name:marko, age:29}"]  # lang missing -> skipped


def test_value_map_selected_keys(g):
    got = vals(g.V().has("name", "lop").valueMap("lang"))
    assert got == ["{lang:java}"]


def test_element_map_includes_identity(g):
    got = vals(g.V().has("name", "marko").elementMap())
    assert got == ["{id:1, label:person, name:marko, age:29}"]


def test_element_map_on_edges(g):
    got = vals(
        g.E().hasLabel("knows").has("weight", 1.0).elementMap()
    )
    assert got == [f"{{id:{(1 << 32) | 4}, label:knows, weight:1}}"]


def test_simple_path_filters_backtrack(g):
    # marko -created-> lop <-created- {marko, josh, peter}: simplePath
    # drops the backtrack to marko himself
    got = sorted(
        vals(
            g.V().has("name", "marko").out("created").in_("created")
            .simplePath().values("name")
        )
    )
    assert got == ["josh", "peter"]


def test_cyclic_path_is_complement(g):
    got = vals(
        g.V().has("name", "marko").out("created").in_("created")
        .cyclicPath().values("name")
    )
    assert got == ["marko"]


def test_simple_path_parses_from_query_string(g):
    got = sorted(
        r.val
        for r in g.query(
            'g.V().has("name","marko").out("created").in("created")'
            ".simplePath().values(\"name\")"
        ).collect()
    )
    assert got == ["josh", "peter"]


def test_value_map_parses_from_query_string(g):
    got = [r.val for r in g.query('g.V().has("name","ripple").valueMap()').collect()]
    assert got == ["{name:ripple, lang:java}"]


def test_new_step_arity_errors(g):
    with pytest.raises(ParseError, match="takes no arguments"):
        g.query("g.V().id(3)")
    with pytest.raises(ParseError, match="string property keys"):
        g.query("g.V().valueMap(5)")
    with pytest.raises(ParseError, match="takes no arguments"):
        g.query("g.V().out().simplePath(1)")


def test_simple_path_no_join_no_shuffle(g):
    # the path-distinctness filter is column arithmetic: no extra join
    # beyond the traversal's own equi-joins, no added exchange
    plan = (
        g.V().has("name", "marko").out("created").in_("created")
        .simplePath().df()
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "array_distinct" in plan


def test_profile_reports_per_step_rows(g):
    prof = {
        r.step: (r.name, r.rows)
        for r in g.profile('g.V().hasLabel("person").out("knows").values("age")').collect()
    }
    assert prof[1] == ("V", 6)
    assert prof[2] == ("hasLabel", 4)
    assert prof[3] == ("out", 2)
    assert prof[4] == ("values", 2)


def test_value_map_on_edges(g):
    got = vals(g.E().hasLabel("knows").has("weight", 0.5).valueMap())
    # DebugString double parity: abs<1 keeps %.6f (tool.hpp:334-368)
    assert got == ["{weight:0.500000}"]


def test_repeat_until_label(g):
    # each traverser exits at its FIRST software position; traversers
    # landing on a person (marko->vadas, marko->josh) keep looping:
    # round 1 exits lop (marko), ripple+lop (josh), lop (peter);
    # round 2 the marko->josh traverser exits at ripple+lop again.
    got = sorted(
        vals(
            g.V().hasLabel("person")
            .repeat(A.out()).until(A.hasLabel("software"))
            .values("name")
        )
    )
    assert got == ["lop", "lop", "lop", "lop", "ripple", "ripple"]


def test_repeat_emit_times(g):
    # emit() outputs every intermediate position across 2 passes
    got = sorted(
        vals(
            g.V().has("name", "marko")
            .repeat(A.out("knows")).times(2).emit()
            .values("name")
        )
    )
    # pass 1: vadas, josh; pass 2: (vadas/josh have no knows-out) -> none
    assert got == ["josh", "vadas"]


def test_repeat_until_query_string(g):
    got = sorted(
        r.val
        for r in g.query(
            'g.V().hasLabel("person").repeat(out()).until(hasLabel("software")).label()'
        ).collect()
    )
    assert got == ["software"] * 6


def test_until_without_repeat_rejected(g):
    with pytest.raises(ParseError, match="must follow repeat"):
        g.query('g.V().until(hasLabel("software"))')


def test_repeat_until_no_match_terminates_empty(g):
    # a condition no traverser ever satisfies must terminate at the
    # bound with zero rows, not loop forever
    got = vals(
        g.V().has("name", "marko").repeat(A.out("knows")).until(A.hasLabel("nosuch"))
    )
    assert got == []


@pytest.mark.slow  # runs repeat to the iteration bound; repeat_until_label/query_string keep the cover
def test_repeat_until_cycle_errors_at_bound(spark):
    # a 2-cycle keeps traversers alive forever: the implicit bound must
    # raise a pointed error, not spin or silently discard
    from grasper_spark import G, PropertyGraph
    from grasper_spark.plans.api import A
    from grasper_spark.plans.compiler import CompileError

    v = spark.createDataFrame([(1, "x"), (2, "x")], "vid long, label string")
    e = spark.createDataFrame(
        [(1, 2, "loop"), (2, 1, "loop")], "src long, dst long, label string"
    )
    gc = G(PropertyGraph(v, e))
    with pytest.raises(CompileError, match="live traversers"):
        gc.V().repeat(A.out("loop")).until(A.hasLabel("nosuch")).df()
    # an explicit times(k) bound keeps whichever-first semantics: no error
    got = gc.V().repeat(A.out("loop"), times=3).until(A.hasLabel("nosuch")).df()
    assert got.count() == 0


def test_hasid_forms(g):
    from grasper_spark import P

    # id filter: ints, multiple ids, predicates, and string literals
    # (class-gated to nothing — ids are bigint)
    assert vals(g.V().hasId(1).values("name")) == ["marko"]
    assert sorted(vals(g.V().hasId(1, 4).values("name"))) == ["josh", "marko"]
    assert vals(g.V().hasId(P.gt(4)).count()) == [2]
    assert [r.val for r in g.query("g.V().hasId(3).label()").collect()] == ["software"]
    assert g.query('g.V().hasId("zz").count()').collect()[0][0] == 0
    # edge ids are the packed (src,dst) pair
    assert g.E().hasId(P.gt(0)).count().to_list() == [6]
    import pytest as _pt

    from grasper_spark.plans.parser import ParseError

    with _pt.raises(ParseError, match="hasId"):
        g.query("g.V().hasId()")


def test_fold_scalars(g):
    got = vals(g.V().hasLabel("person").values("age").fold())
    assert got == ["[27, 29, 32, 35]"]


def test_fold_vertices_and_query_string(g):
    got = [r.val for r in g.query('g.V().hasLabel("software").fold()').collect()]
    assert got == ["[3, 5]"]


def test_constant_step(g):
    got = vals(g.V().hasLabel("person").constant(7))
    assert got == [7, 7, 7, 7]
    got2 = vals(g.V().has("name", "marko").constant("x"))
    assert got2 == ["x"]


def test_fold_constant_arity_errors(g):
    with pytest.raises(ParseError, match="takes no arguments"):
        g.query("g.V().fold(3)")
    with pytest.raises(ParseError, match="exactly one literal"):
        g.query("g.V().constant()")


def test_store_is_aggregate_alias(g):
    # TinkerPop store(x) ≡ aggregate(x) under batch compilation — both
    # string and fluent surfaces produce the same cap() snapshot
    via_store = [r.val for r in g.query('g.V().values("age").store("x").cap("x")').collect()]
    via_agg = [r.val for r in g.query('g.V().values("age").aggregate("x").cap("x")').collect()]
    assert via_store == via_agg
    assert g.V().values("age").store("x").cap("x").to_list() == via_agg


def test_to_subgraph_extracts_queryable_graph(g):
    from grasper_spark import G
    from grasper_spark.plans.compiler import CompileError

    sub = G(g.E().hasLabel("knows").to_subgraph("knows-only"))
    # modern graph: marko-knows->vadas, marko-knows->josh
    assert sorted(r.src for r in sub.graph.edges.collect()) == [1, 1]
    assert sorted(r.vid for r in sub.graph.vertices.collect()) == [1, 2, 4]
    # the subgraph is a normal graph: queries run on it
    assert sub.V().count().to_list() == [3]
    assert sorted(sub.query('g.V().out("knows").values("name")').toPandas().val) == [
        "josh", "vadas"
    ]
    # vertex properties ride along through the induced semi-join
    assert sorted(sub.V().has("name", "marko").out("knows").values("age").to_list()) == [27, 32]
    with pytest.raises(CompileError, match="edge stream"):
        g.V().to_subgraph()
