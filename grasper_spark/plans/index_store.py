"""Index store: value → posting-list maps + selectivity-gated scan
conversion.

Reference semantics (/root/reference/core/index_store.hpp:65-257): for an
indexed property key, a map value → {elements} with per-value counts; a
`has(key, pred)` IMMEDIATELY after `g.V()`/`g.E()` converts the full
scan into an index lookup iff the predicate's match count is below
``ratio * total`` (ratio = 0.2, /root/reference/core/index_store.hpp:17;
conversion logic /root/reference/core/parser.cpp:991-1081).

Spark-native mapping (not a port): the posting list is a CACHED
DataFrame of (value, element-core-columns) pairs — distributed, so it
scales past driver memory where the reference's in-heap map cannot. The
per-value count relation is a second tiny cached DF; the plan-time
selectivity probe is a sub-100ms aggregate on it (the same work the
reference does against count_map at parse time). A converted scan reads
the in-memory posting relation instead of the base parquet — no scan,
no decode, properties re-attached lazily only if a later step needs
them.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grasper_spark.graph import PropertyGraph
from grasper_spark.plans.predicates import Pred, pred_to_condition

# compiler column names (duplicated here to avoid a circular import;
# kept in sync by tests)
_VCOL = "_v"
_ESRC, _EDST, _ELAB, _EP = "_esrc", "_edst", "_el", "_ep_"

RATIO = 0.2  # /root/reference/core/index_store.hpp:17


@dataclass
class _Index:
    pairs: DataFrame   # `_ixval` + element core columns, cached
    counts: DataFrame  # (_ixval, _cnt), cached
    total: int         # elements WITH the key + no-key elements
    with_key: int      # elements with a non-null value
    kind: str          # 'V' | 'E'


class IndexStore:
    """One store per G handle (the reference holds one per worker)."""

    def __init__(self) -> None:
        self._m: dict[tuple[str, str], _Index] = {}

    def build(self, graph: PropertyGraph, element: str, key: str) -> None:
        """BuildIndex(V|E, key): materialize + cache the posting relation
        (/root/reference/expert/index_expert.hpp:83-144)."""
        if element == "V":
            if key not in graph.vertex_keys and key != "label":
                raise KeyError(f"no vertex property '{key}'")
            src = graph.vertices
            val = F.col("label") if key == "label" else F.col(key)
            pairs = src.select(
                val.alias("_ixval"), F.col("vid").alias(_VCOL)
            ).filter(F.col("_ixval").isNotNull())
            kind = "V"
        else:
            if key not in graph.edge_keys and key != "label":
                raise KeyError(f"no edge property '{key}'")
            src = graph.edges
            val = F.col("label") if key == "label" else F.col(key)
            cols = [
                F.col("src").alias(_ESRC), F.col("dst").alias(_EDST),
                F.col("label").alias(_ELAB),
                *[F.col(k).alias(_EP + k) for k in graph.edge_keys],
            ]
            pairs = src.select(val.alias("_ixval"), *cols).filter(
                F.col("_ixval").isNotNull()
            )
            kind = "E"
        pairs = pairs.cache()
        counts = pairs.groupBy("_ixval").agg(F.count(F.lit(1)).alias("_cnt")).cache()
        with_key = pairs.count()  # materializes both caches
        counts.count()
        total = src.count()
        self._m[(element, key)] = _Index(pairs, counts, total, with_key, kind)

    def drop(self, element: str, key: str) -> None:
        idx = self._m.pop((element, key), None)
        if idx is not None:
            idx.pairs.unpersist()
            idx.counts.unpersist()

    def has(self, element: str, key: str) -> bool:
        return (element, key) in self._m

    def count_for_pred(self, element: str, key: str, pred: Pred | None) -> int:
        """Match count for the selectivity gate — the count_map probe of
        IsIndexEnabled (/root/reference/core/index_store.hpp:23-58)."""
        idx = self._m[(element, key)]
        if pred is None:
            return idx.with_key
        row = (
            idx.counts.filter(pred_to_condition(pred, F.col("_ixval")))
            .agg(F.coalesce(F.sum("_cnt"), F.lit(0)))
            .collect()
        )
        return int(row[0][0])

    def eligible(self, element: str, key: str, pred: Pred | None) -> int | None:
        """Return the match count if the scan conversion pays off
        (count < ratio * total), else None."""
        if not self.has(element, key):
            return None
        idx = self._m[(element, key)]
        count = self.count_for_pred(element, key, pred)
        if count >= idx.total * RATIO:
            return None
        return count

    def lookup(self, element: str, key: str, pred: Pred | None) -> DataFrame:
        """The converted scan: posting pairs filtered by the predicate,
        projected to the element's core stream columns."""
        idx = self._m[(element, key)]
        df = idx.pairs
        if pred is not None:
            df = df.filter(pred_to_condition(pred, F.col("_ixval")))
        return df.drop("_ixval")
