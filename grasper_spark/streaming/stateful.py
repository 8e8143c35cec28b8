"""Custom stateful streaming operator via applyInPandasWithState.

Running per-user aggregates maintained as explicit state across
micro-batches — the pattern for operators Structured Streaming's
built-in aggregations can't express (per-key custom state machines).
State schema is a single row per user; timeouts are left to the caller
(NoTimeout here — a production sessionizer would use EventTimeTimeout).

The UDF closure is self-contained (stdlib/pandas only) so executors
never need grasper_spark importable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def running_user_stats(events: DataFrame) -> DataFrame:
    """Streaming: per-user running (count, sum(value)) maintained in
    state; emits the updated row for each user seen in a batch."""

    def fn(key, pdf_iter, state):
        user_id = key[0]
        n, total = (state.get if state.exists else (lambda: (0, 0.0)))()
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, round(total, 6)))
        import pandas as pd

        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 6)]}
        )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )
