"""Project the driver's TPC-H-ish parquet tables into a property graph.

Projection spec lives in FIXTURES.md §2 — vid offsets keep entity id
spaces disjoint (the reference packs everything into one integer vid
space, /root/reference/base/type.hpp:102-104); at most one directed edge
per (src,dst) pair (/root/reference/base/type.hpp:156-163), so the
lineitem-derived edges are aggregated/deduped on projection.

Vertices (label ← source table):
  region(+0), nation(+10), customer(+100), supplier(+10**7),
  part(+2*10**7), order(+4*10**7)
Edges:
  in_region     nation   → region
  from_nation   customer → nation, supplier → nation
  placed        customer → order      (orderdate string prop)
  contains      order    → part       (quantity, extendedprice summed per pair)
  supplies      supplier → part       (distinct pairs from lineitem)

Scale note: the unions below are cheap narrow ops; the only shuffles are
the two lineitem aggregations (groupBy/distinct on (orderkey,partkey) /
(suppkey,partkey)) — exactly the shuffles the semantics require. At
100 TB, persist the projection once as parquet bucketed by vid/src
instead of re-deriving per query session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

OFF_REGION = 0
OFF_NATION = 10
OFF_CUSTOMER = 100
OFF_SUPPLIER = 10**7
OFF_PART = 2 * 10**7
OFF_ORDER = 4 * 10**7

# Wide vertex property schema (absent keys are NULL per label).
V_PROPS = [
    ("name", "string"),
    ("acctbal", "double"),
    ("mktsegment", "string"),
    ("brand", "string"),
    ("type", "string"),
    ("size", "int"),
    ("retailprice", "double"),
    ("orderstatus", "string"),
    ("totalprice", "double"),
    ("orderdate", "string"),
    ("orderpriority", "string"),
]
E_PROPS = [("orderdate", "string"), ("quantity", "double"), ("extendedprice", "double")]


def _with_props(df: DataFrame, present: dict[str, F.Column]) -> DataFrame:
    cols = [df["vid"], df["label"]]
    for key, dtype in V_PROPS:
        cols.append((present[key] if key in present else F.lit(None)).cast(dtype).alias(key))
    return df.select(*cols)


def load_tpch_graph(spark: SparkSession, sf_dir: str) -> "PropertyGraph":
    from grasper_spark.graph import PropertyGraph

    t = {
        name: spark.read.parquet(f"{sf_dir}/{name}.parquet")
        for name in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]
    }

    region = _with_props(
        t["region"].select(
            (F.col("r_regionkey").cast("long") + OFF_REGION).alias("vid"),
            F.lit("region").alias("label"),
            F.col("r_name"),
        ),
        {"name": F.col("r_name")},
    )
    nation = _with_props(
        t["nation"].select(
            (F.col("n_nationkey").cast("long") + OFF_NATION).alias("vid"),
            F.lit("nation").alias("label"),
            F.col("n_name"),
        ),
        {"name": F.col("n_name")},
    )
    customer = _with_props(
        t["customer"].select(
            (F.col("c_custkey").cast("long") + OFF_CUSTOMER).alias("vid"),
            F.lit("customer").alias("label"),
            "c_name",
            "c_acctbal",
            "c_mktsegment",
        ),
        {
            "name": F.col("c_name"),
            "acctbal": F.col("c_acctbal"),
            "mktsegment": F.col("c_mktsegment"),
        },
    )
    supplier = _with_props(
        t["supplier"].select(
            (F.col("s_suppkey").cast("long") + OFF_SUPPLIER).alias("vid"),
            F.lit("supplier").alias("label"),
            "s_name",
            "s_acctbal",
        ),
        {"name": F.col("s_name"), "acctbal": F.col("s_acctbal")},
    )
    part = _with_props(
        t["part"].select(
            (F.col("p_partkey").cast("long") + OFF_PART).alias("vid"),
            F.lit("part").alias("label"),
            "p_name",
            "p_brand",
            "p_type",
            "p_size",
            "p_retailprice",
        ),
        {
            "name": F.col("p_name"),
            "brand": F.col("p_brand"),
            "type": F.col("p_type"),
            "size": F.col("p_size"),
            "retailprice": F.col("p_retailprice"),
        },
    )
    orders = _with_props(
        t["orders"].select(
            (F.col("o_orderkey").cast("long") + OFF_ORDER).alias("vid"),
            F.lit("order").alias("label"),
            "o_orderstatus",
            "o_totalprice",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_s"),
            "o_orderpriority",
        ),
        {
            "orderstatus": F.col("o_orderstatus"),
            "totalprice": F.col("o_totalprice"),
            "orderdate": F.col("o_orderdate_s"),
            "orderpriority": F.col("o_orderpriority"),
        },
    )
    vertices = region.unionByName(nation).unionByName(customer).unionByName(supplier)
    vertices = vertices.unionByName(part).unionByName(orders)

    def _edge(df: DataFrame, label: str, **props: F.Column) -> DataFrame:
        cols = [
            df["src"],
            df["dst"],
            F.lit(label).alias("label"),
        ]
        for key, dtype in E_PROPS:
            cols.append((props[key] if key in props else F.lit(None)).cast(dtype).alias(key))
        return df.select(*cols)

    in_region = _edge(
        t["nation"].select(
            (F.col("n_nationkey").cast("long") + OFF_NATION).alias("src"),
            (F.col("n_regionkey").cast("long") + OFF_REGION).alias("dst"),
        ),
        "in_region",
    )
    cust_nation = _edge(
        t["customer"].select(
            (F.col("c_custkey").cast("long") + OFF_CUSTOMER).alias("src"),
            (F.col("c_nationkey").cast("long") + OFF_NATION).alias("dst"),
        ),
        "from_nation",
    )
    supp_nation = _edge(
        t["supplier"].select(
            (F.col("s_suppkey").cast("long") + OFF_SUPPLIER).alias("src"),
            (F.col("s_nationkey").cast("long") + OFF_NATION).alias("dst"),
        ),
        "from_nation",
    )
    placed_df = t["orders"].select(
        (F.col("o_custkey").cast("long") + OFF_CUSTOMER).alias("src"),
        (F.col("o_orderkey").cast("long") + OFF_ORDER).alias("dst"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("od"),
    )
    placed = _edge(placed_df, "placed", orderdate=F.col("od"))
    contains_df = (
        t["lineitem"]
        .groupBy(
            (F.col("l_orderkey").cast("long") + OFF_ORDER).alias("src"),
            (F.col("l_partkey").cast("long") + OFF_PART).alias("dst"),
        )
        .agg(
            F.sum("l_quantity").alias("qty"),
            F.sum("l_extendedprice").alias("ep"),
        )
    )
    contains = _edge(contains_df, "contains", quantity=F.col("qty"), extendedprice=F.col("ep"))
    supplies_df = (
        t["lineitem"]
        .select(
            (F.col("l_suppkey").cast("long") + OFF_SUPPLIER).alias("src"),
            (F.col("l_partkey").cast("long") + OFF_PART).alias("dst"),
        )
        .distinct()
    )
    supplies = _edge(supplies_df, "supplies")

    edges = in_region.unionByName(cust_nation).unionByName(supp_nation)
    edges = edges.unionByName(placed).unionByName(contains).unionByName(supplies)
    return PropertyGraph(vertices, edges, name=f"tpch-graph:{sf_dir}")
