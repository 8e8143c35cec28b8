"""End-to-end document curation — the composite pipeline the individual
operators exist for: quality gate → language filter → exact dedup →
(optionally) near-dup removal → token accounting.

One declarative plan: Catalyst fuses the quality/language expressions
into the scan, the dedup is a single hash-shuffle, and near-dup removal
reuses the LSH machinery. Returns the surviving documents with their
audit columns, so downstream training jobs can re-check the gates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from grasper_spark.functions.text import (
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)


def curate(
    docs: DataFrame,
    min_quality: float = 0.3,
    languages: tuple[str, ...] = ("en",),
    near_dup_threshold: float | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Returns (doc_id, lang_pred, quality, n_tokens, fingerprint) for
    surviving documents: quality ≥ min_quality, predicted language in
    `languages`, one representative (min id) per exact-duplicate group,
    and — when near_dup_threshold is set — near-duplicate groups
    collapsed to their min-id representative via MinHash-LSH."""
    t = F.col(text_col)
    scored = docs.select(
        F.col(id_col),
        t.alias("__text"),
        lang_id(t).alias("lang_pred"),
        quality_score(t).alias("quality"),
        token_count(t).cast("long").alias("n_tokens"),
        fingerprint(t).alias("fingerprint"),
    )
    gated = scored.filter(
        (F.col("quality") >= min_quality) & F.col("lang_pred").isin(list(languages))
    )
    w = Window.partitionBy("fingerprint").orderBy(id_col)
    exact_kept = (
        gated.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if near_dup_threshold is not None:
        from grasper_spark.functions.dedup import minhash_lsh_pairs

        pairs = minhash_lsh_pairs(
            exact_kept, text_col="__text", id_col=id_col,
            threshold=near_dup_threshold,
        )
        # drop the larger id of every near-dup pair (keep min-id rep)
        losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
        exact_kept = exact_kept.join(losers, id_col, "left_anti")
    return exact_kept.drop("__text")
