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
scales past driver memory where the reference's in-heap map cannot.
The SELECTIVITY GATE, however, is a driver-side probe like the
reference's in-heap count_map (O(1) per compile, no Spark job):

- small value domains (<= 65536 distinct) collect the (value, count)
  map once at build time; every predicate evaluates locally;
- large domains keep only the HEAVY values (count >= ratio*total —
  at most 1/ratio of them exist by construction) plus the average
  posting size: eq/within gate exactly on the heavy set and estimate
  the rest, while range predicates fall back to one tiny aggregate on
  the cached count relation (the reference's map walk, distributed).

A converted scan reads the in-memory posting relation instead of the
base parquet — no scan, no decode, properties re-attached lazily only
if a later step needs them.
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

# value domains up to this size keep their whole count map on the
# driver (a 65k-entry dict, a few MB); larger domains keep only the
# heavy hitters + an average estimate
LOCAL_COUNTS_MAX = 65536


@dataclass
class _Index:
    pairs: DataFrame   # `_ixval` + element core columns, cached
    counts: DataFrame  # (_ixval, _cnt), cached
    total: int         # elements WITH the key + no-key elements
    with_key: int      # elements with a non-null value
    kind: str          # 'V' | 'E'
    n_distinct: int
    local_counts: dict | None   # full value→count map (small domains)
    heavy: dict                 # value→count for count >= RATIO*total
    dtype: str = "string"       # indexed value's spark type (predicate gating)


def _local_match_count(counts: dict, pred: Pred) -> int | None:
    """Evaluate a predicate against the driver-side count map; None if
    the op needs the DF fallback."""
    op, a = pred.op, list(pred.args)
    if op == "any":
        return sum(counts.values())
    if op == "none":
        return 0  # nulls are filtered out of the index
    try:
        if op == "eq":
            return counts.get(a[0], 0)
        if op == "neq":
            return sum(counts.values()) - counts.get(a[0], 0)
        if op == "within":
            return sum(counts.get(x, 0) for x in a)
        if op == "without":
            return sum(counts.values()) - sum(counts.get(x, 0) for x in a)
        if op == "lt":
            return sum(c for v, c in counts.items() if v < a[0])
        if op == "lte":
            return sum(c for v, c in counts.items() if v <= a[0])
        if op == "gt":
            return sum(c for v, c in counts.items() if v > a[0])
        if op == "gte":
            return sum(c for v, c in counts.items() if v >= a[0])
        if op == "inside":
            return sum(c for v, c in counts.items() if a[0] < v < a[1])
        if op == "outside":
            return sum(c for v, c in counts.items() if v < a[0] or v > a[1])
        if op == "between":
            return sum(c for v, c in counts.items() if a[0] <= v <= a[1])
    except TypeError:
        return 0  # cross-type comparison matches nothing
    return None


# ---------------------------------------------------------------------------
# measured-crossover calibration
# ---------------------------------------------------------------------------
#
# bench.py measures the point-query p50 through the pruned scan vs the
# posting conversion at each data scale and records it here; a new G
# handle seeds its `index_scan_min_avoided` floor from the LAST
# measured crossover instead of the reference-parity default 0 — the
# gate's floor is evidence, not folklore. SetConfig always overrides.

#: env override for the calibration file (tests, deployments)
CALIBRATION_ENV = "GRASPER_SPARK_CALIBRATION"
_CALIBRATION_DEFAULT = ".bench_data/index_crossover.json"


def _calibration_path(path: str | None = None) -> str:
    import os

    return (
        path
        or os.environ.get(CALIBRATION_ENV)
        or os.path.join(os.getcwd(), _CALIBRATION_DEFAULT)
    )


def derive_min_avoided(measurements: dict) -> int:
    """Floor (in avoided scanned rows) implied by crossover
    measurements: {tag: {n_vertices, scan_p50_ms, index_p50_ms}}.

    A size "wins" when the posting conversion beat the pruned scan by a
    >10% margin (inside the margin the two are a wash and the simpler
    scan plan should stand). The floor is the midpoint between the
    largest non-winning size and the smallest winning size; if no
    measured size won, everything measured is floored out."""
    wins, losses = [], []
    for m in measurements.values():
        n = int(m.get("n_vertices", 0))
        if n <= 0:
            continue
        if float(m["index_p50_ms"]) < 0.9 * float(m["scan_p50_ms"]):
            wins.append(n)
        else:
            losses.append(n)
    if wins:
        w = min(wins)
        lo = max([n for n in losses if n < w], default=0)
        return (lo + w) // 2 if lo else 0
    return max(losses, default=0)


def record_crossover(measurements: dict, path: str | None = None) -> None:
    """Persist a bench crossover measurement for future sessions."""
    import json
    import os

    p = _calibration_path(path)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "w") as fh:
        json.dump(
            {
                "measurements": measurements,
                "min_avoided": derive_min_avoided(measurements),
            },
            fh,
        )


def load_measured_floor(path: str | None = None) -> int | None:
    """The floor from the last recorded crossover, or None if never
    measured (→ reference-parity default 0)."""
    import json
    import os

    p = _calibration_path(path)
    if not os.path.exists(p):
        return None
    try:
        with open(p) as fh:
            data = json.load(fh)
        return max(0, int(data["min_avoided"]))
    except (OSError, ValueError, KeyError, TypeError):
        return None


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
            dtype = "string" if key == "label" else graph.vertex_keys[key]
            pairs = src.select(
                val.alias("_ixval"), F.col("vid").alias(_VCOL)
            ).filter(F.col("_ixval").isNotNull())
            kind = "V"
        else:
            if key not in graph.edge_keys and key != "label":
                raise KeyError(f"no edge property '{key}'")
            src = graph.edges
            val = F.col("label") if key == "label" else F.col(key)
            dtype = "string" if key == "label" else graph.edge_keys[key]
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
        n_distinct = counts.count()
        total = src.count()
        if n_distinct <= LOCAL_COUNTS_MAX:
            local = {r["_ixval"]: r["_cnt"] for r in counts.collect()}
            heavy = {v: c for v, c in local.items() if c >= RATIO * total}
        else:
            local = None
            heavy = {
                r["_ixval"]: r["_cnt"]
                for r in counts.filter(F.col("_cnt") >= RATIO * total).collect()
            }
        self._m[(element, key)] = _Index(
            pairs, counts, total, with_key, kind, n_distinct, local, heavy,
            dtype=dtype,
        )

    def drop(self, element: str, key: str) -> None:
        idx = self._m.pop((element, key), None)
        if idx is not None:
            idx.pairs.unpersist()
            idx.counts.unpersist()

    def has(self, element: str, key: str) -> bool:
        return (element, key) in self._m

    def count_for_pred(self, element: str, key: str, pred: Pred | None) -> int:
        """Match count for the selectivity gate — the count_map probe of
        IsIndexEnabled (/root/reference/core/index_store.hpp:23-58).
        Driver-side (no Spark job) except large-domain range predicates."""
        idx = self._m[(element, key)]
        if pred is None:
            return idx.with_key
        if idx.local_counts is not None:
            n = _local_match_count(idx.local_counts, pred)
            if n is not None:
                return n
        elif pred.op in ("eq", "within"):
            # large domain: exact for heavy values (the only ones that can
            # fail the gate), average posting size otherwise
            vals = [pred.args[0]] if pred.op == "eq" else list(pred.args)
            avg = idx.with_key // max(idx.n_distinct, 1)
            return sum(idx.heavy.get(v, avg) for v in vals)
        row = (
            idx.counts.filter(
                pred_to_condition(pred, F.col("_ixval"), dtype=idx.dtype)
            )
            .agg(F.coalesce(F.sum("_cnt"), F.lit(0)))
            .collect()
        )
        return int(row[0][0])

    def eligible(
        self, element: str, key: str, pred: Pred | None, min_avoided: int = 0
    ) -> int | None:
        """Return the match count if the scan conversion pays off
        (count < ratio * total — the reference's gate,
        /root/reference/core/index_store.hpp:17), else None.

        ``min_avoided`` is the MEASURED-crossover floor (SetConfig
        'index_scan_min_avoided', default 0 = reference parity): when
        the conversion would avoid scanning fewer than this many rows
        (total - count), the fixed cost of routing through the posting
        relation outweighs the avoided scan — measured at local[32]
        (BENCH_FULL "index_crossover") the two paths are within noise
        up to ~2M cached rows, so small relations gain nothing from
        converting and a deployment can floor it out."""
        if not self.has(element, key):
            return None
        idx = self._m[(element, key)]
        count = self.count_for_pred(element, key, pred)
        if count >= idx.total * RATIO:
            return None
        if min_avoided > 0 and (idx.total - count) < min_avoided:
            return None
        return count

    def lookup(self, element: str, key: str, pred: Pred | None) -> DataFrame:
        """The converted scan: posting pairs filtered by the predicate,
        projected to the element's core stream columns."""
        idx = self._m[(element, key)]
        df = idx.pairs
        if pred is not None:
            df = df.filter(pred_to_condition(pred, F.col("_ixval"), dtype=idx.dtype))
        return df.drop("_ixval")
