"""Streaming corpus monitor: per-event-time-window intake statistics
for a document stream — doc count, token count, HLL-estimated distinct
tokens, and doc-length quantiles.

The first dashboard a streaming ingest needs: "what arrived in the last
window, how big, how diverse". All statistics are sketch/partial
aggregations (`hll_sketch_agg`, `approx_percentile` are
TypedImperativeAggregates — their serialized buffers live in the
streaming state store), so state per window is kilobytes regardless of
corpus rate, and the watermark bounds the number of live windows.

Two forms like the rest of the streaming surface: the `readStream`
production path and a batch twin with identical semantics for oracle
checks and backfills.

No reference parity to cite: Grasper has no streaming surface — this
is the training-data-pipeline extension (SURVEY.md "beyond the
reference").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grasper_spark.functions.text import token_count, tokens

#: DataSketches lgK for the per-window vocabulary estimate (4 KB each)
_LGK = 12


def _window_stats(grouped) -> DataFrame:
    # _ntok is non-null exactly once per document (see _prepared), so
    # count(_ntok) is the doc count even though rows are token-grain
    return grouped.agg(
        F.count(F.col("_ntok")).alias("n_docs"),
        F.sum(F.col("_ntok")).cast("long").alias("n_tokens"),
        F.hll_sketch_estimate(F.hll_sketch_agg("_tok_sample", F.lit(_LGK)))
        .cast("long")
        .alias("est_vocab"),
        F.approx_percentile(F.col("_ntok"), F.lit(0.5), F.lit(1000))
        .cast("long")
        .alias("p50_doc_tokens"),
        F.approx_percentile(F.col("_ntok"), F.lit(0.95), F.lit(1000))
        .cast("long")
        .alias("p95_doc_tokens"),
    )


def _prepared(docs: DataFrame, text_col: str) -> DataFrame:
    # ONE explode serves both grains: token rows feed the vocab sketch,
    # while the doc-level token count rides along only on each doc's
    # pos==0 row (null elsewhere — count/sum/approx_percentile skip
    # nulls), so doc statistics count each doc exactly once without a
    # second aggregation pass or a union branch.
    return docs.select(
        "*",
        token_count(F.col(text_col)).alias("_ntok"),
        # _outer keeps zero-token documents (they still count as docs)
        F.posexplode_outer(tokens(F.lower(F.col(text_col)))).alias(
            "_pos", "_tok_sample"
        ),
    ).withColumn(
        "_ntok",
        F.when((F.col("_pos") == 0) | F.col("_pos").isNull(), F.col("_ntok")),
    )


def corpus_monitor(
    stream_docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Streaming form: windowed intake statistics with a watermark so
    state is dropped once windows close. Append output mode works (the
    watermark finalizes windows); `complete` works for memory-sink
    tests."""
    exploded = _prepared(stream_docs.withWatermark(ts_col, watermark), text_col)
    g = exploded.groupBy(F.window(F.col(ts_col), window).alias("win"))
    return _window_stats(g).select(
        F.col("win.start").alias("window_start"),
        "n_docs",
        "n_tokens",
        "est_vocab",
        "p50_doc_tokens",
        "p95_doc_tokens",
    )


def corpus_monitor_batch(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    window: str = "1 minute",
) -> DataFrame:
    """Batch twin: identical statistics over the same windows."""
    exploded = _prepared(docs, text_col)
    g = exploded.groupBy(F.window(F.col(ts_col), window).alias("win"))
    return _window_stats(g).select(
        F.col("win.start").alias("window_start"),
        "n_docs",
        "n_tokens",
        "est_vocab",
        "p50_doc_tokens",
        "p95_doc_tokens",
    )
