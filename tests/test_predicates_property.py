"""Property-based tests: the predicate kernel matches a direct Python
evaluation of the reference semantics (base/predicate.cpp:100-150), and
filter order never changes results (the reorder-equivalence the
reference's ReOrderSteps rewrite relies on, core/parser.cpp:495-532)."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from grasper_spark import G, P, PropertyGraph

VALS = st.integers(min_value=-50, max_value=50)


def _py_eval(op, args, v):
    if v is None:
        return False
    if op == "eq":
        return v == args[0]
    if op == "neq":
        return v != args[0]
    if op == "lt":
        return v < args[0]
    if op == "lte":
        return v <= args[0]
    if op == "gt":
        return v > args[0]
    if op == "gte":
        return v >= args[0]
    if op == "inside":
        return args[0] < v < args[1]
    if op == "outside":
        return v < args[0] or v > args[1]
    if op == "between":
        return args[0] <= v <= args[1]
    if op == "within":
        return v in args
    if op == "without":
        return v not in args
    raise AssertionError(op)


PRED_1 = ["eq", "neq", "lt", "lte", "gt", "gte"]
PRED_2 = ["inside", "outside", "between"]
PRED_N = ["within", "without"]


@st.composite
def pred_strategy(draw):
    kind = draw(st.sampled_from(["1", "2", "n"]))
    if kind == "1":
        return draw(st.sampled_from(PRED_1)), (draw(VALS),)
    if kind == "2":
        a, b = sorted([draw(VALS), draw(VALS)])
        return draw(st.sampled_from(PRED_2)), (a, b)
    n = draw(st.integers(min_value=1, max_value=4))
    return draw(st.sampled_from(PRED_N)), tuple(draw(VALS) for _ in range(n))


@st.composite
def graph_rows(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    rows = []
    for i in range(1, n + 1):
        v = draw(st.one_of(st.none(), VALS))
        label = draw(st.sampled_from(["a", "b"]))
        rows.append((i, label, v))
    return rows


@pytest.fixture(scope="module")
def mk_graph(spark):
    def make(rows):
        v = spark.createDataFrame(rows, "vid long, label string, x int")
        e = spark.createDataFrame([], "src long, dst long, label string")
        return G(PropertyGraph(v, e))

    return make


@given(rows=graph_rows(), pred=pred_strategy())
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_has_matches_python_semantics(mk_graph, rows, pred):
    op, args = pred
    g = mk_graph(rows)
    got = sorted(r[0] for r in g.V().has("x", P.__dict__[op].__func__(*args)).df().collect())
    want = sorted(vid for vid, _, v in rows if _py_eval(op, args, v))
    assert got == want


@given(rows=graph_rows(), pred=pred_strategy(), label=st.sampled_from(["a", "b"]))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_filter_order_invariance(mk_graph, rows, pred, label):
    op, args = pred
    g = mk_graph(rows)
    p = P.__dict__[op].__func__(*args)
    a = sorted(r[0] for r in g.V().has("x", p).hasLabel(label).df().collect())
    b = sorted(r[0] for r in g.V().hasLabel(label).has("x", p).df().collect())
    assert a == b
