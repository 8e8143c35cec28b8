"""Streaming document curation: the batch `curate()` gates applied to
an unbounded stream — quality score + language filter are stateless
projections (they ride the micro-batch scan), exact dedup is the
watermark-bounded fingerprint state of `dedup_stream`.

This is the ingest-time shape of a training-data pipeline: documents
arrive continuously, junk is dropped before it is ever stored, and the
only state held is the dedup fingerprint set inside the watermark
horizon. Near-dup removal (MinHash-LSH) does not fit a single stateful
operator (OR-across-band-buckets); it streams as micro-batch
incremental compaction against a persistent bucket store — see
streaming/neardup.py — or periodically in batch over the curated
output (`functions.curation.curate` with a threshold).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grasper_spark.functions.text import (
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)


def curate_stream(
    docs: DataFrame,
    min_quality: float = 0.3,
    languages: tuple[str, ...] = ("en",),
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming twin of `functions.curation.curate` (sans near-dup):
    audit columns + quality/language gates + first-seen-fingerprint
    dedup. With `ts_col`, dedup state is bounded by the watermark."""
    t = F.col(text_col)
    scored = docs.withColumns(
        {
            "lang_pred": lang_id(t),
            "quality": quality_score(t),
            "n_tokens": token_count(t).cast("long"),
            "fingerprint": fingerprint(t),
        }
    )
    gated = scored.filter(
        (F.col("quality") >= min_quality) & F.col("lang_pred").isin(list(languages))
    )
    if ts_col is not None:
        gated = gated.withWatermark(ts_col, watermark)
        return gated.dropDuplicatesWithinWatermark(["fingerprint"])
    return gated.dropDuplicates(["fingerprint"])
