"""Incremental graph ingestion: streaming edge batches.

The reference loads a static graph once at startup
(/root/reference/driver/master.hpp, HDFS files → in-memory stores) and
is add-only thereafter. At 100 TB the adds never stop — new edges land
as files or a Kafka topic — so this extension folds an edge STREAM into
the graph without re-deriving anything:

- `append_edges_stream`: foreachBatch append into a parquet edge log —
  each micro-batch is one atomic file commit, so a `PropertyGraph`
  reading the log always sees a consistent prefix of the stream. Append
  is the only mutation, matching the reference's add-only load.
- `degree_updates`: running in/out-degree per vertex. The SAME
  DataFrame expression runs as a streaming update-mode aggregation
  (state bounded by |V|, one shuffle on vid) and as its own batch twin
  for backfills/verification — the twin pattern used by
  streaming/windows.py.

Scale: the log append is sized by the micro-batch, not the graph; the
degree agg is a partial-aggregated groupBy on vid. Neither operation
touches existing graph data. Compact the log offline (coalesce small
files into the bucketed layout of sources/sinks.write_bucketed) on
whatever cadence file counts demand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

EDGE_SCHEMA = "src long, dst long, label string"


def read_edges_stream(spark: SparkSession, src_dir: str) -> DataFrame:
    """File-source stream of edge batches (parquet drops into src_dir)."""
    return spark.readStream.schema(EDGE_SCHEMA).parquet(src_dir)


def append_edges_stream(
    edges: DataFrame, log_dir: str, checkpoint_dir: str, on_commit=None
) -> StreamingQuery:
    """Fold an edge stream into an append-only parquet edge log.

    ``on_commit``: zero-arg callable invoked after each micro-batch's
    file commit — pass a ``G.refresh`` bound method (plans/api.py) so
    the serving tier (compiled-plan cache, auto-prepared point-query
    templates) is invalidated the moment new edges land; the next point
    lookup then serves the fresh rows instead of a stale snapshot."""

    def _append(batch: DataFrame, _batch_id: int) -> None:
        batch.write.mode("append").parquet(log_dir)
        if on_commit is not None:
            try:
                on_commit()
            except Exception:
                # invalidation is best-effort: the append already
                # committed, and failing the micro-batch HERE would make
                # Structured Streaming replay it — duplicating the
                # appended edges. A missed refresh only delays freshness
                # until the next commit.
                import traceback

                traceback.print_exc()

    return (
        edges.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def degree_updates(edges: DataFrame) -> DataFrame:
    """Running (out_deg, in_deg) per vertex; works unchanged on a batch
    DataFrame (the verification twin) or a streaming one (update mode)."""
    out_ = edges.select(
        F.col("src").alias("vid"),
        F.lit(1).alias("_o"),
        F.lit(0).alias("_i"),
    )
    in_ = edges.select(
        F.col("dst").alias("vid"),
        F.lit(0).alias("_o"),
        F.lit(1).alias("_i"),
    )
    return (
        out_.unionByName(in_)
        .groupBy("vid")
        .agg(F.sum("_o").alias("out_deg"), F.sum("_i").alias("in_deg"))
    )
