"""Property-based traversal tests: on random small graphs, the compiled
out/in/both/dedup/count pipelines must match a direct Python adjacency
computation (multiset semantics included)."""

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from grasper_spark import G, PropertyGraph


@st.composite
def graph_strategy(draw):
    n = draw(st.integers(min_value=2, max_value=8))
    vids = list(range(1, n + 1))
    possible = [(a, b) for a in vids for b in vids if a != b]
    edges = draw(
        st.lists(st.sampled_from(possible), max_size=12, unique=True)
    )
    labels = {e: draw(st.sampled_from(["x", "y"])) for e in edges}
    return vids, [(a, b, labels[(a, b)]) for a, b in edges]


@pytest.fixture(scope="module")
def mk(spark):
    def make(vids, edges):
        v = spark.createDataFrame([(i, "n") for i in vids], "vid long, label string")
        e = spark.createDataFrame(edges, "src long, dst long, label string")
        return G(PropertyGraph(v, e))

    return make


@given(g=graph_strategy(), elabel=st.sampled_from([None, "x", "y"]))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_out_multiset(mk, g, elabel):
    vids, edges = g
    t = mk(vids, edges).V()
    t = t.out() if elabel is None else t.out(elabel)
    got = Counter(r[0] for r in t.df().collect())
    want = Counter(b for a, b, lb in edges if elabel in (None, lb))
    assert got == want


@given(g=graph_strategy())
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_two_hop_multiset(mk, g):
    vids, edges = g
    got = Counter(r[0] for r in mk(vids, edges).V().out().out().df().collect())
    adj = {}
    for a, b, _ in edges:
        adj.setdefault(a, []).append(b)
    want = Counter(c for a in vids for b in adj.get(a, []) for c in adj.get(b, []))
    assert got == want


@given(g=graph_strategy())
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_both_dedup_count(mk, g):
    vids, edges = g
    got = mk(vids, edges).V().both().dedup().count().to_list()[0]
    touched = {b for _, b, _ in edges} | {a for a, _, _ in edges}
    # both() reaches any vertex with at least one incident edge
    want = len({x for a, b, _ in edges for x in (a, b)})
    assert got == want


@given(g=graph_strategy())
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_not_out_equals_sinks(mk, g):
    from grasper_spark.plans.api import A

    vids, edges = g
    got = sorted(r[0] for r in mk(vids, edges).V().not_(A.out()).df().collect())
    want = sorted(v for v in vids if not any(a == v for a, _, _ in edges))
    assert got == want


@given(g=graph_strategy())
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_coalesce_covers_every_traverser_once(mk, g):
    # coalesce(out(), identity-ish) must produce, per input vertex,
    # either its out-neighbors (if any) or the vertex itself — so the
    # result multiset equals out-neighbors of non-sinks + sinks
    from collections import Counter

    from grasper_spark.plans.api import A

    vids, edges = g
    t = mk(vids, edges).V().coalesce(A.out(), A.both().in_().out())
    # branch 2 is never reached for vertices with out-edges; for sinks it
    # yields both().in().out() — compute the same in python
    adj_out = {v: [b for a, b, _ in edges if a == v] for v in vids}
    adj_in = {v: [a for a, b, _ in edges if b == v] for v in vids}
    adj_both = {v: adj_out[v] + adj_in[v] for v in vids}
    want = Counter()
    for v in vids:
        if adj_out[v]:
            want.update(adj_out[v])
        else:
            for w in adj_both[v]:
                for x in adj_in[w]:
                    want.update(adj_out[x])
    got = Counter(r[0] for r in t.df().collect())
    assert got == want


@given(g=graph_strategy(), n=st.integers(min_value=1, max_value=5))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_tail_is_suffix_of_order(mk, g, n):
    vids, edges = g
    t = mk(vids, edges).V().tail(n)
    got = sorted(r[0] for r in t.df().collect())
    assert len(got) == min(n, len(vids))
    assert set(got) <= set(vids)
