#!/usr/bin/env python
"""Randomized differential soak: run the test_differential generators
(vertex/edge/ext/relational pipelines + the parser renderer) with fresh
random seeds at a configurable example budget — the out-of-band deep
hunt behind the derandomized CI tests.

Usage:
    python tools/soak.py [--examples 200]

Exit code 0 = all families clean; failures print hypothesis' falsifying
examples (add them to test_differential.py as regressions).
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--examples", type=int, default=200)
    args = ap.parse_args()

    import test_differential as td
    from hypothesis import HealthCheck, assume, given, settings
    from hypothesis import strategies as st

    from grasper_spark import G, PropertyGraph, get_spark

    spark = get_spark("soak", master="local[8]", shuffle_partitions=8)
    v = spark.createDataFrame(td.VERTS, "vid long, label string, age long, name string")
    e = spark.createDataFrame(td.EDGES, "src long, dst long, label string, w long")
    pg = PropertyGraph(v, e)
    pg.vertices.cache().count()
    pg.edges.cache().count()
    g = G(pg)

    fails: list[str] = []
    fams = [
        ("vertex", td.pipeline()),
        ("edge", td.edge_pipeline()),
        ("ext", td.ext_pipeline()),
        ("rel", td.rel_pipeline()),
    ]
    for name, strat in fams:

        @given(steps=strat)
        @settings(
            max_examples=args.examples, deadline=None, derandomize=False,
            print_blob=True, suppress_health_check=list(HealthCheck),
        )
        def run(steps):
            td._check(g, steps)

        try:
            run()
            print(f"{name}: OK ({args.examples})")
        except Exception:
            traceback.print_exc()
            fails.append(name)
            print(f"{name}: FAILURE")

    @given(steps=st.one_of(td.pipeline(), td.ext_pipeline()))
    @settings(
        max_examples=args.examples, deadline=None, derandomize=False,
        print_blob=True, suppress_health_check=list(HealthCheck),
    )
    def run_parse(steps):
        q = td._render(steps)
        assume(q is not None and "groupCount" not in q)
        assert td._got(g.query(q)) == td._got(td._apply(g.V(), steps).df()), q

    try:
        run_parse()
        print(f"parse: OK ({args.examples})")
    except Exception:
        traceback.print_exc()
        fails.append("parse")
        print("parse: FAILURE")

    # prepared serving parity (plans/prepared.py) — fresh random shapes,
    # every domain value compared against the per-query compile, on the
    # module's OWN graph (its edge labels differ from td's)
    import test_prepared_differential as tpd

    v2 = spark.createDataFrame(tpd.VERTS, "vid long, label string, age long, name string")
    e2 = spark.createDataFrame(tpd.EDGES, "src long, dst long, label string, w long")
    pg2 = PropertyGraph(v2, e2)
    pg2.vertices.cache().count()
    pg2.edges.cache().count()
    g2 = G(pg2)

    pd_examples = max(10, args.examples // 5)  # each example checks ~15 values

    @given(shape=tpd.point_shape())
    @settings(
        max_examples=pd_examples, deadline=None, derandomize=False,
        print_blob=True, suppress_health_check=list(HealthCheck),
    )
    def run_prepared(shape):
        tpd.test_prepared_matches_per_query_on_every_domain_value.hypothesis.inner_test(g2, shape)

    try:
        run_prepared()
        print(f"prepared: OK ({pd_examples})")
    except Exception:
        traceback.print_exc()
        fails.append("prepared")
        print("prepared: FAILURE")

    print("DONE fails:", fails)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
