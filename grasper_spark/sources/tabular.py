"""Generic tabular graph loaders: CSV / JSON / arbitrary DataFrames.

The reference only reads its own HDFS text format
(/root/reference/storage/data_store.cpp:41-268); these widen the intake
so any edge-list + vertex-table dataset loads without conversion.
Column mapping is explicit — no inference magic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from grasper_spark.graph import PropertyGraph


def from_dataframes(
    vertices: DataFrame,
    edges: DataFrame,
    vid: str = "vid",
    label: str = "label",
    src: str = "src",
    dst: str = "dst",
    elabel: str = "label",
    default_vlabel: str = "vertex",
    default_elabel: str = "edge",
    name: str = "graph",
) -> PropertyGraph:
    """Adapt arbitrary V/E DataFrames: rename key columns, default the
    label columns when absent, keep everything else as properties."""
    v = vertices.withColumnRenamed(vid, "vid")
    if label in v.columns and label != "label":
        v = v.withColumnRenamed(label, "label")
    if "label" not in v.columns:
        v = v.withColumn("label", F.lit(default_vlabel))
    v = v.withColumn("vid", F.col("vid").cast("long"))

    e = edges.withColumnRenamed(src, "src").withColumnRenamed(dst, "dst")
    if elabel in e.columns and elabel != "label":
        e = e.withColumnRenamed(elabel, "label")
    if "label" not in e.columns:
        e = e.withColumn("label", F.lit(default_elabel))
    e = e.withColumn("src", F.col("src").cast("long")).withColumn(
        "dst", F.col("dst").cast("long")
    )
    # reference constraint: at most one edge per (src,dst)
    # (/root/reference/base/type.hpp:156-184)
    e = e.dropDuplicates(["src", "dst"])
    return PropertyGraph(v, e, name=name)


def load_csv(
    spark: SparkSession,
    vertices_path: str,
    edges_path: str,
    header: bool = True,
    **mapping,
) -> PropertyGraph:
    v = spark.read.csv(vertices_path, header=header, inferSchema=True)
    e = spark.read.csv(edges_path, header=header, inferSchema=True)
    return from_dataframes(v, e, **mapping)


def load_json(
    spark: SparkSession, vertices_path: str, edges_path: str, **mapping
) -> PropertyGraph:
    v = spark.read.json(vertices_path)
    e = spark.read.json(edges_path)
    return from_dataframes(v, e, **mapping)
