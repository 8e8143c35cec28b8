"""Labelled-branch common-prefix factoring (compiler._labelled_filter).

and()/or() branches sharing a pure traversal prefix evaluate that
prefix ONCE: filter-only suffixes collapse into a single flag
aggregation over the shared expansion; generic suffixes read a
persisted prefix. These tests pin both the semantics (factored results
equal the per-branch existential definition on the modern graph) and
the plan shape (one expansion scan, not one per branch).

Reference semantics: /root/reference/expert/labelled_branch_expert.hpp
184-289 (pass iff all/any/none branches yield >=1 result per
traverser) — the factoring is a pure plan rewrite.
"""

import re

import pytest

from grasper_spark import P
from grasper_spark.plans.api import A

def _names(g, trav):
    return sorted(trav.values("name").to_list())


def test_and_common_prefix_filter_suffixes(g):
    # who created BOTH a java artifact AND lop: created targets are
    # all java, so this is "created lop" = marko, josh, peter
    got = _names(
        g,
        g.V().and_(
            A.out("created").has("lang", "java"),
            A.out("created").has("name", "lop"),
        ),
    )
    assert got == ["josh", "marko", "peter"]


def test_and_common_prefix_disjoint_filters(g):
    # knows someone older than 30 AND someone younger than 30: only
    # marko (knows vadas 27 and josh 32) — per-branch existential,
    # NOT a single row satisfying both (no such row exists)
    got = _names(
        g,
        g.V().and_(
            A.out("knows").has("age", P.gt(30)),
            A.out("knows").has("age", P.lt(30)),
        ),
    )
    assert got == ["marko"]


def test_or_common_prefix(g):
    got = _names(
        g,
        g.V().or_(
            A.out("created").has("name", "ripple"),
            A.out("created").has("name", "lop"),
        ),
    )
    assert got == ["josh", "marko", "peter"]


def test_and_identical_branches_empty_suffix(g):
    # both branches factor entirely into the prefix (empty suffixes):
    # equivalent to a single existential out("knows")
    got = _names(g, g.V().and_(A.out("knows"), A.out("knows")))
    assert got == ["marko"]


def test_and_generic_suffix_falls_back(g):
    # suffix out("created") is NOT a row-local filter: the generic
    # per-branch path runs over the persisted prefix — semantics
    # unchanged (marko knows josh, who created; josh is the only
    # known person older than 30)
    got = _names(
        g,
        g.V().and_(
            A.out("knows").out("created"),
            A.out("knows").has("age", P.gt(30)),
        ),
    )
    assert got == ["marko"]


def test_and_no_common_prefix_unchanged(g):
    # different first steps: nothing factors; plain per-branch path
    got = _names(
        g,
        g.V().and_(
            A.out("created").has("lang", "java"),
            A.out("knows").has("age", P.gt(30)),
        ),
    )
    assert got == ["marko"]


def test_and_matches_per_branch_intersection(g):
    # differential: factored and() == intersection of single-branch
    # and()s (single branches never factor)
    b1 = A.out("created").has("lang", "java")
    b2 = A.out("created").has("name", "ripple")
    joint = set(_names(g, g.V().and_(b1, b2)))
    s1 = set(_names(g, g.V().and_(b1)))
    s2 = set(_names(g, g.V().and_(b2)))
    assert joint == (s1 & s2) == {"josh"}


def test_or_matches_per_branch_union(g):
    b1 = A.out("created").has("name", "ripple")
    b2 = A.out("created").has("name", "lop")
    joint = set(_names(g, g.V().or_(b1, b2)))
    s1 = set(_names(g, g.V().and_(b1)))
    s2 = set(_names(g, g.V().and_(b2)))
    assert joint == (s1 | s2)


def test_and_factored_plan_single_expansion(g):
    # the flag path touches the edge relation ONCE for the whole
    # branch set — per-branch evaluation would expand it twice
    df = (
        g.V().and_(
            A.out("created").has("lang", "java"),
            A.out("created").has("name", "lop"),
        ).values("name").df()
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # the modern fixture is cached: expansions show as joins against
    # the edge relation; count join nodes as the expansion proxy
    njoin = len(re.findall(r"(?m)^[\s:+-]*Join ", plan))
    # one expansion join + one props re-attach + one passing semi join
    assert njoin <= 3, f"expected <=3 joins in factored plan, got {njoin}:\n{plan}"


def test_mixed_prop_suffixes_keep_dangling_edge_witnesses(spark):
    # REGRESSION (r8 review): or(out(e), out(e).has(k, p)) with a
    # dangling edge (dst has no vertex row). The flag fast path's
    # props attach is an inner vertex join — with a MIXED branch set
    # (one branch needs no props) it must NOT engage, or the bare
    # branch loses its dangling witness. Per-branch semantics: the
    # bare out() sees the edge, so 'solo' passes the or().
    from pyspark.sql import types as T

    from grasper_spark import G, PropertyGraph, P
    from grasper_spark.plans.api import A

    v_schema = T.StructType([
        T.StructField("vid", T.LongType()),
        T.StructField("label", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("age", T.IntegerType()),
    ])
    e_schema = T.StructType([
        T.StructField("src", T.LongType()),
        T.StructField("dst", T.LongType()),
        T.StructField("label", T.StringType()),
    ])
    v = spark.createDataFrame(
        [(1, "person", "marko", 29), (2, "person", "vadas", 27),
         (7, "person", "solo", 40)], v_schema
    )
    e = spark.createDataFrame(
        [(1, 2, "knows"), (7, 99, "knows")], e_schema  # 99 dangles
    )
    gg = G(PropertyGraph(v, e, name="dangling").cache())
    got = sorted(
        gg.V().or_(
            A.out("knows"),
            A.out("knows").has("age", P.gt(0)),
        ).values("name").to_list()
    )
    assert got == ["marko", "solo"]
    # the all-branches-need-props case stays on the fast path and
    # correctly drops the dangling witness
    got = sorted(
        gg.V().or_(
            A.out("knows").has("age", P.gt(100)),
            A.out("knows").has("age", P.gt(0)),
        ).values("name").to_list()
    )
    assert got == ["marko"]


def test_where_not_rewrite_still_green(g):
    # where(not(...)) routes through _labelled_filter with ONE branch:
    # factoring must not engage (needs >=2 branches)
    got = _names(g, g.V().hasLabel("person").not_(A.out("created")))
    assert got == ["vadas"]
