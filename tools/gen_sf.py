"""Deterministic sf-scaled test-table generator.

Synthesizes a FULL dataset (all ten tables) at an arbitrary scale factor
with the same schemas, naming conventions, and value marginals as the
driver's `/root/testdata/sf*` tables (TESTDATA.md) — used by bench.py's
sf1 section, since the driver only ships sf ≤ 0.1 and its generator is
not available. Everything is hash-derived from (table, row id) under a
fixed seed: fully distributed generation (spark.range + column
expressions, no driver loops, no RNG state), reproducible across runs
and partitionings.

Dimension AND fact tables scale together (customers 150k·sf, orders
1.5M·sf, lineitem ~6M·sf …), unlike bench.py's `_ensure_scaled`, which
replicates only the fact tables for the observed-scaling ratio section.
`documents` is scaled by word-salted replication of the sf0.1 corpus
(textually disjoint replicas — keeps shingle document-frequency shape;
see `_ensure_scaled`'s rationale) and `embeddings` by fresh unit-ish
vectors, 64-dim like the source.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

SEED = 42

MKTSEGS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
OSTATUS = ["F", "O", "P"]
OPRIO = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
RFLAG = ["A", "N", "R"]
LSTATUS = ["F", "O"]
EVTYPES = ["click", "error", "purchase", "signup", "view"]


def _h(salt: str, *cols) -> F.Column:
    """Deterministic non-negative 64-bit hash stream per (salt, cols)."""
    return F.abs(F.xxhash64(F.lit(f"{SEED}:{salt}"), *cols))


def _u(salt: str, *cols) -> F.Column:
    """Uniform double in [0, 1)."""
    return (_h(salt, *cols) % 1000000007).cast("double") / 1000000007.0


def _pick(salt: str, values: list[str], *cols) -> F.Column:
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (_h(salt, *cols) % len(values) + 1).cast("int"))


def _ntz(secs) -> F.Column:
    """Epoch seconds → timestamp_ntz, entirely in NTZ space.

    timestamp_seconds()/date_trunc()/cast(ntz) on a TIMESTAMP all read
    spark.sql.session.timeZone, so the 'reproducible across runs'
    guarantee would only hold within one session timezone. NTZ interval
    arithmetic is wall-clock math — timezone-free — and equals the UTC
    interpretation the shipped sf tables were generated under."""
    base = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    return base + F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), secs)


def generate_sf(spark, out_dir: str, sf: float = 1.0,
                base_sf_dir: str = "/root/testdata/sf0.1") -> str:
    """Write all ten tables for scale factor `sf` under `out_dir`;
    returns `out_dir`. Skips generation when the marker file exists."""
    marker = os.path.join(out_dir, "_GEN_OK")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_ev = int(1_000_000 * sf)

    def write(df, name):
        # 16 output files per table: a single snappy parquet file scans
        # as 1-2 tasks no matter how small maxPartitionBytes is (one
        # row group — observed doc_line_dedup at sf1 running its whole
        # text segmentation in 2 tasks on 32 cores). Real 100 TB tables
        # are many-file by construction; the generator should match.
        df.repartition(16).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )

    # fixed-size dimensions copy through (5 regions / 25 nations at
    # every TPC-H scale)
    for t in ("region", "nation"):
        write(spark.read.parquet(f"{base_sf_dir}/{t}.parquet"), t)

    i = F.col("id")
    write(
        spark.range(n_cust).select(
            i.alias("c_custkey"),
            F.format_string("Customer#%09d", i).alias("c_name"),
            (_h("c_nat", i) % 25).cast("int").alias("c_nationkey"),
            F.round(_u("c_bal", i) * 11000.0 - 1000.0, 2).alias("c_acctbal"),
            _pick("c_seg", MKTSEGS, i).alias("c_mktsegment"),
        ),
        "customer",
    )
    write(
        spark.range(n_supp).select(
            i.alias("s_suppkey"),
            F.format_string("Supplier#%09d", i).alias("s_name"),
            (_h("s_nat", i) % 25).cast("int").alias("s_nationkey"),
            F.round(_u("s_bal", i) * 11000.0 - 1000.0, 2).alias("s_acctbal"),
        ),
        "supplier",
    )
    write(
        spark.range(n_part).select(
            i.alias("p_partkey"),
            F.concat(_pick("p_adj", ADJ, i), F.lit(" "),
                     _pick("p_noun", NOUN, i)).alias("p_name"),
            F.concat(F.lit("Brand#"),
                     (_h("p_br", i) % 25 + 1).cast("string")).alias("p_brand"),
            _pick("p_ty", PTYPES, i).alias("p_type"),
            (_h("p_sz", i) % 50 + 1).cast("int").alias("p_size"),
            F.round(900.0 + _u("p_rp", i) * 100.0, 2).alias("p_retailprice"),
        ),
        "part",
    )
    orders = spark.range(n_ord).select(
        i.alias("o_orderkey"),
        (_h("o_cust", i) % n_cust).alias("o_custkey"),
        _pick("o_st", OSTATUS, i).alias("o_orderstatus"),
        F.round(1000.0 + _u("o_tp", i) * 499000.0, 2).alias("o_totalprice"),
        # fixed epoch literal (788918400 = 1995-01-01T00:00:00Z) + NTZ
        # arithmetic — see _ntz for why no session-TZ-dependent exprs
        _ntz(F.lit(788918400) + _h("o_dt", i) % (2405 * 86400))
        .alias("o_orderdate"),
        _pick("o_pr", OPRIO, i).alias("o_orderpriority"),
    ).withColumn(
        # date_trunc on an NTZ input is pure wall-clock truncation
        "o_orderdate",
        F.date_trunc("day", F.col("o_orderdate")).cast("timestamp_ntz"),
    )
    write(orders, "orders")

    # ~4 lines/order (1..7 like the source); line attributes hash off
    # (orderkey, linenumber)
    ok, ln = F.col("o_orderkey"), F.col("l_linenumber")
    write(
        spark.range(n_ord)
        .select(i.alias("o_orderkey"))
        .select(
            ok,
            F.explode(
                F.sequence(F.lit(1), (_h("l_n", ok) % 7 + 1).cast("int"))
            ).alias("l_linenumber"),
        )
        .select(
            ok.alias("l_orderkey"),
            (_h("l_pt", ok, ln) % n_part).alias("l_partkey"),
            (_h("l_sp", ok, ln) % n_supp).alias("l_suppkey"),
            ln,
            (_h("l_qt", ok, ln) % 50 + 1).cast("double").alias("l_quantity"),
            F.round(_u("l_ep", ok, ln) * 99000.0 + 1000.0, 2).alias("l_extendedprice"),
            F.round((_h("l_di", ok, ln) % 11).cast("double") / 100.0, 2).alias("l_discount"),
            F.round((_h("l_tx", ok, ln) % 9).cast("double") / 100.0, 2).alias("l_tax"),
            _pick("l_rf", RFLAG, ok, ln).alias("l_returnflag"),
            _pick("l_ls", LSTATUS, ok, ln).alias("l_linestatus"),
            F.date_trunc(  # 789004800 = 1995-01-02T00:00:00Z
                "day",
                _ntz(F.lit(789004800) + _h("l_sd", ok, ln) % (2497 * 86400)),
            ).cast("timestamp_ntz").alias("l_shipdate"),
        ),
        "lineitem",
    )

    write(
        spark.range(n_ev).select(
            i.alias("event_id"),
            _ntz(  # 1704067200 = 2024-01-01T00:00:00Z
                F.lit(1704067200)
                + (_h("e_ts", i) % (30 * 86400 * 1000)).cast("double") / 1000.0
            ).cast("timestamp_ntz").alias("ts"),
            (_h("e_us", i) % int(15_000 * sf)).alias("user_id"),
            _pick("e_ty", EVTYPES, i).alias("event_type"),
            # right-skewed like the source (median ~35, mean ~50)
            F.round(F.pow(_u("e_v1", i), 2.0) * 560.0, 2).alias("value"),
            F.format_string('{"k": %d}', (_h("e_k", i) % 100).cast("int")).alias("props"),
        ),
        "events",
    )

    # documents: word-salted replication (factor = sf / 0.1) — replicas
    # are textually disjoint so shingle-df shape survives the scale-up
    factor = max(1, int(round(sf / 0.1)))
    docs = spark.read.parquet(f"{base_sf_dir}/documents.parquet")
    reps = spark.range(factor).withColumnRenamed("id", "_rep")
    salted = F.array_join(
        F.transform(
            F.split(F.col("text"), " "),
            lambda w: F.concat(w, F.lit("x"), F.col("_rep").cast("string")),
        ),
        " ",
    )
    write(
        docs.crossJoin(reps)
        .withColumn("doc_id", F.col("doc_id") * factor + F.col("_rep"))
        .withColumn("text", F.when(F.col("_rep") == 0, F.col("text")).otherwise(salted))
        .withColumn("n_chars", F.length("text"))
        .drop("_rep"),
        "documents",
    )

    n_emb = int(round(2000 * sf / 0.1))
    write(
        spark.range(n_emb).select(
            i.alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda d: (
                    (_h("emb", i, d) % 2000001).cast("double") / 1000000.0 - 1.0
                ).cast("float"),
            ).alias("embedding"),
            (_h("emb_l", i) % 10).cast("int").alias("label"),
        ),
        "embeddings",
    )

    with open(marker, "w") as fh:
        fh.write("ok\n")
    return out_dir
