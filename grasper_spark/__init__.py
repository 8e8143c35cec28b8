"""grasper_spark — a PySpark-native property-graph OLAP engine.

A from-scratch engine with the query surface of yaobaiwei/Grasper
(Gremlin-subset over property graphs; see /root/reference and SURVEY.md),
re-expressed Spark-first: graphs are a pair of DataFrames (V, E), queries
compile to DataFrame plans optimized by Catalyst, and every Grasper
"expert" maps to a declarative DataFrame transformation.

Public API::

    from grasper_spark import PropertyGraph, G, P, Order
    g = G(PropertyGraph(v_df, e_df))
    g.V().has("name", "marko").out("knows").values("age").df()   # fluent
    g.query('g.V().has("name","marko").out("knows").values("age")')  # string

Beyond graph parity, ``grasper_spark.functions`` adds large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) and ``grasper_spark.streaming`` adds
Structured Streaming surfaces — green-field extensions, not reference
ports (reference has none: SURVEY.md §2.7).
"""

from grasper_spark.graph import PropertyGraph
from grasper_spark.plans.api import G, Order, P
from grasper_spark.session import get_spark

__all__ = ["PropertyGraph", "G", "P", "Order", "get_spark"]
__version__ = "0.1.0"
