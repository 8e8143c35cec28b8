"""Arbitrary stateful streaming via Spark 4's transformWithStateInPandas.

The successor to ``applyInPandasWithState`` (see streaming/stateful.py,
kept as the 3.x-compatible twin): a ``StatefulProcessor`` gets TYPED,
NAMED state handles (ValueState / ListState / MapState, optional TTL,
timers) instead of one opaque tuple — so an operator can hold several
independent state variables per key and the state store tracks each
with its own schema + eviction.

Scale notes (the reason to prefer this API at 100 TB):

- state lives in the per-partition state store keyed by the groupBy
  key — keys never co-reside, so state size scales out with executors;
- MapState updates touch only the changed sub-key, not a whole
  serialized blob per user;
- ``ttlDurationMs`` bounds state for abandoned keys without a
  hand-rolled timer loop.

Requires the RocksDB state store provider
(``spark.sql.streaming.stateStore.providerClass`` — set by
``ensure_tws_confs``). The processor classes are defined INSIDE the
factory functions so they pickle BY VALUE (cloudpickle): the
transform_with_state driver worker is a bare Python process that cannot
import grasper_spark — the same self-contained-closure rule every UDF
in this repo follows.

Both operators are deterministic over a fixed input and have batch
twins asserted equal in tests (the project's streaming rule: every
streaming op ships with a batch twin the oracle can check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# transformWithState's state-server protocol is protobuf-based; the
# worker does `import google.protobuf` at runtime. Gate availability
# here so an environment without protobuf gets a pointed error up
# front instead of a crashed driver worker mid-query.
try:  # pragma: no cover - env-dependent
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    TWS_AVAILABLE = True
except ImportError:  # pragma: no cover - env-dependent
    TWS_AVAILABLE = False

_STATS_OUT = "user_id bigint, n_events bigint, total_value double"
_TYPES_OUT = "user_id bigint, event_type string, cnt bigint"

_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def ensure_tws_confs(spark: SparkSession) -> None:
    """transformWithState requires the RocksDB state store provider
    (the default HDFS-backed provider does not implement the
    multi-variable state schema this API needs) and the protobuf
    package (the state-server wire protocol)."""
    if not TWS_AVAILABLE:
        raise RuntimeError(
            "transformWithStateInPandas needs the 'protobuf' package "
            "(google.protobuf), which is not installed in this "
            "environment; use streaming.stateful.running_user_stats "
            "(applyInPandasWithState) instead"
        )
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", _ROCKSDB)


def running_user_stats_v2(events: DataFrame) -> DataFrame:
    """transformWithStateInPandas twin of
    streaming.stateful.running_user_stats — same output contract:
    per-user running (count, sum(value)) held in one ValueState."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class RunningStats(StatefulProcessor):
        def init(self, handle):
            self._st = handle.getValueState(
                "stats", "n_events bigint, total_value double"
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            prev = self._st.get() if self._st.exists() else (0, 0.0)
            n, total = int(prev[0]), float(prev[1])
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].fillna(0.0).sum())
            total = round(total, 6)
            self._st.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self):
            pass

    ensure_tws_confs(events.sparkSession)
    return events.groupBy("user_id").transformWithStateInPandas(
        RunningStats(), outputStructType=_STATS_OUT,
        outputMode="Update", timeMode="None",
    )


def user_event_type_counts(events: DataFrame) -> DataFrame:
    """Streaming per-user event-type histogram in a MapState — each
    event type is its own sub-key, so one update rewrites one
    (type → count) entry, not the whole per-user blob. Emits the full
    current histogram for each user seen in a micro-batch; batch twin
    is a plain groupBy(user_id, event_type).count()."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class PerTypeCounts(StatefulProcessor):
        def init(self, handle):
            self._m = handle.getMapState(
                "type_counts", "event_type string", "cnt bigint"
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            for pdf in rows:
                for etype, cnt in pdf.groupby("event_type").size().items():
                    prev = (
                        self._m.getValue((etype,))[0]
                        if self._m.containsKey((etype,))
                        else 0
                    )
                    self._m.updateValue((etype,), (prev + int(cnt),))
            pairs = sorted((k[0], v[0]) for k, v in self._m.iterator())
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(pairs),
                    "event_type": [p[0] for p in pairs],
                    "cnt": [p[1] for p in pairs],
                }
            )

        def close(self):
            pass

    ensure_tws_confs(events.sparkSession)
    return events.groupBy("user_id").transformWithStateInPandas(
        PerTypeCounts(), outputStructType=_TYPES_OUT,
        outputMode="Update", timeMode="None",
    )
