"""Capture .explain('formatted') for declared queries into plans/r09/.

Usage:
    python tools/capture_plans.py before [q1,q2,...]
    python tools/capture_plans.py after  [q1,q2,...]

Writes plans/r09/<query>_<tag>.txt. Defaults to the bench HEADLINE set;
pass an explicit comma list to capture others.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")

    import __spark_entry__ as entry
    from grasper_spark import get_spark

    import bench

    spark = get_spark("capture-plans", master=f"local[{cpus}]")
    qs = entry.queries()
    names = only or bench.HEADLINE
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r09")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # capture the failure instead of dying
            txt = f"EXPLAIN FAILED: {ex!r}\n"
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
