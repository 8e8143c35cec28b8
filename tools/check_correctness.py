"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables (default sf0.01), then compares
row count, schema (column names sorted), and a value hash (rows sorted,
columns ordered by name — the driver's documented compare).

Usage:
    python tools/check_correctness.py [--sf DIR] [--only q1,q2,...] [--skip q3,...]

The sf1 sweep (generated tables, tools/gen_sf.py) runs WITHOUT skips:
    python tools/check_correctness.py --sf .bench_data/sf1
Round 4 made the two previously-skipped algo oracles sf1-feasible:
pagerank's chained CTEs are AS MATERIALIZED (DuckDB inlines plain
CTEs — each round referenced twice re-expanded the chain
exponentially), and the triangle oracle uses the same degree-ordered
compact-forward orientation as algos.triangle_count instead of a
naive self-join over hub wedges.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # driver-style stable float rendering: repr round-trips doubles
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _hash_rows(cols, rows) -> str:
    """Order-insensitive exact value hash: per-row md5 summed mod 2^128
    (commutative, so no sort materialization — equal multisets of rows
    ⇔ equal hash up to md5 collisions). Accepts any iterable, so both
    engines can stream: the sf1 sweep's largest entry compares ~55M
    rows per side, which the old sort-all-lines hash could not hold in
    memory (that, not the oracle SQL, was the round-3 'infeasibility'
    tail)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    total = 0
    for r in rows:
        line = "\x1f".join(_norm_cell(r[i]) for i in order)
        total = (total + int.from_bytes(
            hashlib.md5(line.encode()).digest(), "big"
        )) % (1 << 128)
    return f"{total:032x}"


def _iter_duck(cur, batch: int = 65536):
    while True:
        rows = cur.fetchmany(batch)
        if not rows:
            return
        yield from rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    ap.add_argument("--skip", default="")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("check-correctness")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.isdir(p):  # Spark-written parquet directory
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')"
            )
        elif os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    only = {s for s in args.only.split(",") if s}
    skip = {s for s in args.skip.split(",") if s}

    results: dict[str, dict] = {}
    n_bad = 0
    for name, fn in qs.items():
        if name in skip:
            continue
        if only and name not in only:
            continue
        rec: dict = {}
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf)
            scols = sdf.columns
            # stream: count + commutative hash in one pass, no full
            # driver materialization (sf1's largest entry is ~55M rows)
            sn = 0

            def _count_spark(it):
                nonlocal sn
                for r in it:
                    sn += 1
                    yield r

            shash = _hash_rows(scols, _count_spark(sdf.toLocalIterator()))
            rec["spark_rows"] = sn
        except Exception as e:
            rec["err"] = f"spark: {type(e).__name__}: {e}"
            traceback.print_exc()
            results[name] = rec
            n_bad += 1
            print(f"  {name}: SPARK ERROR {e}")
            continue
        sql = oracles.get(name)
        if sql is None:
            rec["err"] = "no_oracle"
            results[name] = rec
            print(f"  {name}: no_oracle ({sn} rows)  [{time.time()-t0:.1f}s]")
            continue
        try:
            cur = con.execute(sql)
            ocols = [d[0] for d in cur.description]
            on = 0

            def _count_duck(it):
                nonlocal on
                for r in it:
                    on += 1
                    yield r

            ohash = _hash_rows(ocols, _count_duck(_iter_duck(cur)))
        except Exception as e:
            rec["err"] = f"oracle: {type(e).__name__}: {e}"
            results[name] = rec
            n_bad += 1
            print(f"  {name}: ORACLE ERROR {e}")
            continue
        rec["oracle_rows"] = on
        rec["rows_match"] = sn == on
        rec["schema_match"] = sorted(scols) == sorted(ocols)
        rec["hash_match"] = rec["schema_match"] and shash == ohash
        ok = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
        if not ok:
            n_bad += 1
            detail = ""
            if not rec["schema_match"]:
                detail = f" spark={sorted(scols)} oracle={sorted(ocols)}"
            elif not rec["rows_match"]:
                detail = f" {sn} vs {on} rows"
            elif sn <= 200_000:
                # re-materialize small results to show the first diff
                so = sorted(range(len(scols)), key=lambda i: scols[i])
                oo = sorted(range(len(ocols)), key=lambda i: ocols[i])
                sl = sorted(
                    "\x1f".join(_norm_cell(r[i]) for i in so)
                    for r in sdf.collect()
                )
                ol = sorted(
                    "\x1f".join(_norm_cell(r[i]) for i in oo)
                    for r in con.execute(sql).fetchall()
                )
                for a, b in zip(sl, ol):
                    if a != b:
                        detail = f"\n    spark : {a[:220]}\n    oracle: {b[:220]}"
                        break
            else:
                detail = " value-hash mismatch (result too large to diff)"
        else:
            detail = ""
        print(
            f"  {name}: {'OK' if ok else 'FAIL'} ({sn} rows)"
            f"  [{time.time()-t0:.1f}s]{detail}"
        )
        results[name] = rec

    print(f"\n{len(results) - n_bad}/{len(results)} green", flush=True)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=2)
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
