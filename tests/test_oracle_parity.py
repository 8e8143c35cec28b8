"""Differential tests: every __spark_entry__ query vs its DuckDB oracle.

Mimics the driver's t2 gate (row-count + schema-shape + order-insensitive
values) at sf0.001 so mismatches surface before the real run at sf0.01.
"""

import math
import os

import duckdb
import pytest

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def entry():
    import __spark_entry__ as e

    return e


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
                if v == -0.0:
                    v = 0.0
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


QUERY_NAMES = None


def _names():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    return sorted(qs), qs, os_


@pytest.mark.parametrize("name", _names()[0])
def test_query_matches_oracle(name, entry, ddb, spark):
    qs = entry.queries()
    oracles = entry.oracle_sql()
    sdf = qs[name](spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    if name not in oracles:
        assert len(s_rows) >= 0  # rows-only check
        return
    o = ddb.execute(oracles[name])
    o_cols = [d[0] for d in o.description]
    o_rows = o.fetchall()
    assert sorted(s_cols) == sorted(o_cols), f"{name}: column names differ"
    assert len(s_rows) == len(o_rows), (
        f"{name}: row count {len(s_rows)} vs oracle {len(o_rows)}"
    )
    sn, on = _normalize(s_rows, s_cols), _normalize(o_rows, o_cols)
    mismatches = [
        (a, b) for a, b in zip(sn, on)
        if not _row_eq(a, b)
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def _row_eq(a, b):
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if isinstance(x, float) and isinstance(y, float):
            if not math.isclose(x, y, rel_tol=0, abs_tol=1e-9):
                return False
        elif x != y:
            return False
    return True
