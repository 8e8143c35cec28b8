"""tools/gen_sf.py: deterministic synthesis, schema/marginal parity with
the driver's testdata conventions."""

import os

import pytest
from pyspark.sql import functions as F

from tools.gen_sf import generate_sf

SRC = "/root/testdata/sf0.1"


@pytest.fixture(scope="module")
def gen_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("gen") / "sf0.002")
    generate_sf(spark, out, sf=0.002, base_sf_dir=SRC)
    return out


@pytest.mark.slow  # generates a second SF corpus; test_generation_is_deterministic keeps the cover
def test_generated_row_counts_follow_sf(spark, gen_dir):
    want = {
        "customer": 300, "supplier": 20, "part": 400, "orders": 3000,
        "events": 2000, "region": 5, "nation": 25,
    }
    for t, n in want.items():
        got = spark.read.parquet(os.path.join(gen_dir, f"{t}.parquet")).count()
        assert got == n, t
    li = spark.read.parquet(os.path.join(gen_dir, "lineitem.parquet"))
    assert 3000 <= li.count() <= 3000 * 7  # 1..7 lines/order


def test_generated_schemas_match_source(spark, gen_dir):
    for t in ("customer", "supplier", "part", "orders", "lineitem", "events"):
        src = dict(spark.read.parquet(f"{SRC}/{t}.parquet").dtypes)
        got = dict(spark.read.parquet(os.path.join(gen_dir, f"{t}.parquet")).dtypes)
        assert got == src, t


def test_generation_is_deterministic(spark, gen_dir, tmp_path):
    out2 = str(tmp_path / "again")
    generate_sf(spark, out2, sf=0.002, base_sf_dir=SRC)
    for t in ("customer", "orders", "lineitem", "events"):
        a = spark.read.parquet(os.path.join(gen_dir, f"{t}.parquet"))
        h1 = a.select(F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in sorted(a.columns)])).alias("h")) \
              .agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("decimal(38,0)"))).first()[0]
        b = spark.read.parquet(os.path.join(out2, f"{t}.parquet"))
        h2 = b.select(F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in sorted(b.columns)])).alias("h")) \
              .agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("decimal(38,0)"))).first()[0]
        assert h1 == h2, t


def test_generated_values_respect_domains(spark, gen_dir):
    cust = spark.read.parquet(os.path.join(gen_dir, "customer.parquet"))
    assert cust.filter(~F.col("c_nationkey").between(0, 24)).count() == 0
    segs = {r[0] for r in cust.select("c_mktsegment").distinct().collect()}
    assert segs <= {"AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"}
    orders = spark.read.parquet(os.path.join(gen_dir, "orders.parquet"))
    # every order references an existing customer (FK integrity)
    assert orders.join(cust, orders.o_custkey == cust.c_custkey, "left_anti").count() == 0
    li = spark.read.parquet(os.path.join(gen_dir, "lineitem.parquet"))
    assert li.filter(~F.col("l_quantity").between(1, 50)).count() == 0
