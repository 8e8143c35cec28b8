"""Property-graph data model: two DataFrames.

Reference data model (SURVEY.md §1): Grasper stores a directed property
graph in hash-partitioned KV stores — topology `v_table: vid→Vertex*`,
`e_table: eid→Edge*` (/root/reference/storage/data_store.hpp:112-113) with
dynamic per-element property lists. An edge is identified solely by its
endpoint pair (in_v, out_v) — at most one directed edge per pair, no
multigraph (/root/reference/base/type.hpp:156-184).

Spark-native mapping (a design decision, not a port):

- ``V(vid long, label string, <one column per vertex property key>)``
- ``E(src long, dst long, label string, <one column per edge property key>)``

Dynamic per-element schemas melt into a wide columnar schema; absent
keys are NULL.  Parquet + Catalyst column pruning beats the reference's
row-KV + remote property fetch: properties "ride along" only when a
plan actually reads them.

Scale notes (100 TB design):
- V is partitioned by ``vid``, E by ``src``; ``in()`` traversals join on
  ``dst`` so :meth:`PropertyGraph.edges_by_dst` exposes a dst-keyed view —
  on a real cluster persist both orientations bucketed (bucketBy(src) /
  bucketBy(dst)) so traversal joins co-locate without a shuffle.
- Vertex labels are plain string columns (reference uses interned u16
  dictionaries, /root/reference/base/type.hpp:369-380 — parquet dictionary
  encoding gives the same effect for free).
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Reserved (non-property) columns in V / E.
V_ID = "vid"
E_SRC = "src"
E_DST = "dst"
LABEL = "label"


@dataclass
class PropertyGraph:
    """A directed property graph as a pair of DataFrames."""

    vertices: DataFrame
    edges: DataFrame
    name: str = "graph"
    # Property key -> Spark simple-type string, discovered from schemas.
    vertex_keys: dict[str, str] = field(default_factory=dict)
    edge_keys: dict[str, str] = field(default_factory=dict)

    # monotonic per-instance identity token for plan-cache keys: unlike
    # id(), never reused after GC, so a stale pre-refresh traversal's
    # cached plan can never be served for a NEW graph that happens to be
    # allocated at the freed graph's address (r4 VERDICT finding #2a)
    _gen_counter = itertools.count()

    def __post_init__(self) -> None:
        self._gen = next(PropertyGraph._gen_counter)
        vcols = {f.name: f.dataType.simpleString() for f in self.vertices.schema.fields}
        ecols = {f.name: f.dataType.simpleString() for f in self.edges.schema.fields}
        assert V_ID in vcols and LABEL in vcols, f"V needs ({V_ID},{LABEL}): {vcols}"
        assert E_SRC in ecols and E_DST in ecols and LABEL in ecols, (
            f"E needs ({E_SRC},{E_DST},{LABEL}): {ecols}"
        )
        if not self.vertex_keys:
            self.vertex_keys = {k: t for k, t in vcols.items() if k not in (V_ID, LABEL)}
        if not self.edge_keys:
            self.edge_keys = {
                k: t for k, t in ecols.items() if k not in (E_SRC, E_DST, LABEL)
            }

    @property
    def spark(self) -> SparkSession:
        return self.vertices.sparkSession

    def edges_by_dst(self) -> DataFrame:
        """The dst-keyed orientation for ``in()`` traversals.

        Locally this is the same DataFrame (Catalyst shuffles on dst);
        at scale, override with a bucketed-by-dst copy of E.
        """
        return self.edges

    def cache(self) -> "PropertyGraph":
        self.vertices.cache()
        self.edges.cache()
        return self

    def edge_count(self) -> int:
        """Total |E|, computed once and cached on the instance. The
        compiler reads the CACHED value (never triggers the job itself)
        to pick the traversal-expansion join strategy: above the
        measured crossover it hints sort-merge so Catalyst's
        static file-size estimate cannot broadcast a multi-million-row
        edge relation (see compiler.EXPAND_MERGE_MIN_EDGES). Loaders
        that materialize the graph call this once at load."""
        if getattr(self, "_edge_count", None) is None:
            self._edge_count = self.edges.count()
        return self._edge_count

    def degree_stats(self) -> DataFrame:
        """Out/in degree summary — used for skew diagnostics before tuning."""
        out_deg = self.edges.groupBy(F.col(E_SRC).alias(V_ID)).agg(
            F.count("*").alias("out_deg")
        )
        in_deg = self.edges.groupBy(F.col(E_DST).alias(V_ID)).agg(
            F.count("*").alias("in_deg")
        )
        return out_deg.join(in_deg, V_ID, "full_outer").na.fill(0)
