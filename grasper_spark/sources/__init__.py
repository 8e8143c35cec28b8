"""Graph sources: native Grasper text format, TPC-H parquet projection."""

from grasper_spark.sources.grasper_datasource import register as register_grasper_source
from grasper_spark.sources.grasper_text import load_grasper_text
from grasper_spark.sources.tpch_graph import load_tpch_graph

__all__ = ["load_grasper_text", "load_tpch_graph", "register_grasper_source"]
