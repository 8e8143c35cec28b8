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
    # one representative (min id) per exact-duplicate group via
    # min(struct(id, ...)): id is the FIRST struct field and unique, so
    # struct ordering picks exactly the min-id row — same result as the
    # old row_number() window, but min() partial-aggregates map-side
    # (each task ships at most one row per fingerprint it saw) where the
    # window shuffled and sorted EVERY surviving row including the text
    # payload.
    others = [c for c in gated.columns if c not in (id_col, "fingerprint")]
    exact_kept = (
        gated.groupBy("fingerprint")
        .agg(F.min(F.struct(id_col, *others)).alias("_r"))
        .select(F.col(f"_r.{id_col}").alias(id_col), *[
            F.col(f"_r.{c}").alias(c) for c in others
        ], "fingerprint")
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


def full_pipeline(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    out_path: str | None = None,
    min_quality: float = 0.3,
    languages: tuple[str, ...] = ("en", "de"),
    near_dup_threshold: float = 0.5,
    line_dedup_max_df: int = 2,
    chunk_tokens: int = 64,
    pack_tokens: int | None = None,
    num_shards: int = 8,
    contamination_n: int = 5,
    contamination_min_hits: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, dict]:
    """The WHOLE training-data flow as one composition of the proven
    operators: Gopher repetition gates → PII redaction → intra-doc
    repeated-line removal → cross-corpus line dedup → quality/language
    curation with near-dup collapse →
    benchmark decontamination (when `benchmark` is given) → token-window
    chunking → (optionally, with `pack_tokens`) sharded first-fit
    sequence packing into fixed-size training contexts → deterministic
    shard assignment (written out when `out_path` is given).

    Returns (chunks_df, stats) where stats counts survivors per stage —
    the audit trail a data-governance review asks for. Every stage is
    declarative; the only materializations are the stage counts (driver
    scalars) and the optional shard write.
    """
    from grasper_spark.functions.contamination import decontaminate
    from grasper_spark.functions.dedup import intra_doc_line_dedup, line_dedup
    from grasper_spark.functions.sampling import export_shards, write_training_shards
    from grasper_spark.functions.text import chunk_documents, gopher_quality, redact_pii

    stats: dict[str, int] = {"input": docs.count()}

    gated = gopher_quality(docs, text_col=text_col, id_col=id_col)
    survivors = gated.filter(F.col("pass")).select(id_col)
    cur = docs.join(survivors, id_col, "left_semi")
    stats["gopher_pass"] = cur.count()

    cur = redact_pii(cur, text_col=text_col, id_col=id_col).select(
        id_col, F.col("clean_text").alias(text_col)
    )

    # within-doc repeats first (zero-shuffle, rides the scan), then the
    # cross-corpus hot-line strip
    cur = intra_doc_line_dedup(cur, text_col=text_col, id_col=id_col).select(
        id_col, text_col
    )
    deduped_lines = line_dedup(cur, text_col=text_col, id_col=id_col,
                               max_df=line_dedup_max_df)
    cur = deduped_lines.filter(F.length(F.trim(text_col)) > 0).select(id_col, text_col)
    stats["line_dedup_nonempty"] = cur.count()

    kept = curate(
        cur, min_quality=min_quality, languages=languages,
        near_dup_threshold=near_dup_threshold, text_col=text_col, id_col=id_col,
    )
    cur = cur.join(kept.select(id_col), id_col, "left_semi")
    stats["curated"] = cur.count()

    if benchmark is not None:
        # 5-gram / 3-hit gate by default: a 3-gram single-hit gate is
        # the right paranoia for real web text but wipes a synthetic
        # small-vocabulary corpus (every doc shares some 3-gram by
        # chance) — callers tune per corpus
        cur = decontaminate(
            cur, benchmark, text_col=text_col, id_col=id_col,
            n=contamination_n, min_hits=contamination_min_hits,
        )
        stats["decontaminated"] = cur.count()

    chunks = chunk_documents(cur, window=chunk_tokens,
                             stride=max(1, chunk_tokens * 3 // 4),
                             text_col=text_col, id_col=id_col)
    stats["chunks"] = chunks.count()

    if pack_tokens is not None:
        from grasper_spark.functions.packing import pack_sequences, packing_stats

        packed = pack_sequences(
            chunks.select(id_col, "chunk_id", "chunk", "n_chunk_tokens"),
            max_tokens=pack_tokens,
            len_col="n_chunk_tokens",
            id_cols=(id_col, "chunk_id"),
            num_shards=num_shards,
        )
        ps = packing_stats(packed, pack_tokens).collect()[0]
        stats["bins"] = int(ps.n_bins)
        stats["mean_fill"] = float(ps.mean_fill)
        if out_path is not None:
            packed.write.mode("overwrite").partitionBy("shard").parquet(out_path)
        return packed, stats

    sharded = export_shards(
        chunks.select(
            F.concat_ws("#", F.col(id_col).cast("string"), F.col("chunk_id").cast("string")
                        ).alias(id_col),
            F.col("chunk").alias(text_col),
        ),
        id_col=id_col, num_shards=num_shards,
    )
    if out_path is not None:
        write_training_shards(
            sharded.select(id_col, text_col), out_path, id_col=id_col,
            num_shards=num_shards,
        )
    return sharded, stats
