"""Sketch-based corpus statistics: HLL cardinality, mergeable per-shard
sketches, one-pass column profiling.

The first thing a 100 TB intake runs is not dedup — it is "how big is
this, how many distinct tokens, what do the columns look like". Exact
answers need a full shuffle of every distinct value; sketches need one
scan with partial aggregation, and only KILOBYTES of sketch bytes cross
the wire per partition. All of these stay JVM-side (Spark 4 ships the
Apache DataSketches HLL aggregates as built-in SQL functions — no UDF).

Why sketches are the 100 TB design and not a shortcut:

- ``hll_sketch_agg`` is algebraic: executors build per-partition
  sketches, the final reduce unions ~num_partitions × 2^lgk bytes.
  ``approx_count_distinct`` (HLL++) has the same shape; we expose the
  DataSketches form because its BINARY sketch is a value you can STORE
  (per shard / per day) and re-union later without rescanning — the
  incremental-ingest pattern (`shard_token_sketches` +
  `merge_token_sketches`).
- ``approx_percentile`` (KLL-ish quantile summary) replaces a global
  sort: a length distribution over 10^11 documents costs one partial
  agg instead of a total order.
- ``theta_sketch_agg`` adds what HLL cannot: set INTERSECTION and
  DIFFERENCE. Corpus-overlap questions ("how much of snapshot B is
  already in A") become set algebra over kilobyte sketches instead of
  a distinct-join of two token streams (`corpus_overlap`,
  `source_overlap_matrix`).
- ``kll_sketch_agg_bigint`` is the storable/mergeable form of a
  quantile summary: persist one blob per shard, answer global
  quantiles later without rescanning (`shard_length_sketches` +
  `merge_length_sketches`).

No reference parity to cite: Grasper has no approximate aggregates —
this module is part of the training-data-pipeline extension surface
(SURVEY.md "beyond the reference" bullet).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from grasper_spark.functions.text import token_count, tokens

#: default DataSketches lgK (2^12 = 4096 buckets ≈ 1.6% relative error,
#: 4 KB per sketch — per-partition cost at any data scale)
DEFAULT_LGK = 12


def _token_stream(docs: DataFrame, text_col: str) -> DataFrame:
    # explode is line-rate work but stays in whole-stage codegen; the
    # aggregate downstream is partial, so no token-level shuffle of
    # values — only sketch bytes
    return docs.select(
        F.explode(tokens(F.lower(F.col(text_col)))).alias("token")
    ).filter(F.length("token") > 0)


def vocab_summary(
    docs: DataFrame, text_col: str = "text", lgk: int = DEFAULT_LGK
) -> DataFrame:
    """One-row corpus summary: document count, total token count,
    HLL-estimated distinct-token (vocabulary) count, and approximate
    doc-length quantiles (p50/p95 tokens per doc).

    One scan for the doc-level stats + one for the token stream; both
    are partial aggregations — nothing but sketch/scalar bytes shuffles.
    """
    ntok = token_count(F.col(text_col))
    doc_stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(ntok).cast("long").alias("n_tokens"),
        F.approx_percentile(ntok, F.lit(0.5), F.lit(1000))
        .cast("long")
        .alias("p50_doc_tokens"),
        F.approx_percentile(ntok, F.lit(0.95), F.lit(1000))
        .cast("long")
        .alias("p95_doc_tokens"),
    )
    vocab = _token_stream(docs, text_col).agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("token", F.lit(lgk)))
        .alias("est_vocab")
    )
    # two 1-row relations — the crossJoin is a driver-free no-op join
    return doc_stats.crossJoin(vocab)


def shard_token_sketches(
    docs: DataFrame,
    shard_col: str = "shard",
    text_col: str = "text",
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """Per-shard distinct-token HLL sketches:
    (shard, sketch binary, est_distinct).

    The sketch column is the STORED artifact: persist it next to each
    ingested shard/day, and cardinality questions about any shard union
    become `merge_token_sketches` over kilobytes instead of a rescan of
    terabytes.
    """
    return (
        docs.select(F.col(shard_col).alias("shard"), F.col(text_col).alias("text"))
        .select("shard", F.explode(tokens(F.lower(F.col("text")))).alias("token"))
        .filter(F.length("token") > 0)
        .groupBy("shard")
        .agg(F.hll_sketch_agg("token", F.lit(lgk)).alias("sketch"))
        .select(
            "shard",
            "sketch",
            F.hll_sketch_estimate("sketch").cast("long").alias("est_distinct"),
        )
    )


def merge_token_sketches(sketches: DataFrame, sketch_col: str = "sketch") -> DataFrame:
    """Union per-shard sketches into one global cardinality estimate —
    the incremental-ingest read path (no rescan of the shards)."""
    return sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col, F.lit(True)))
        .cast("long")
        .alias("est_distinct")
    )


def corpus_overlap(
    docs_a: DataFrame,
    docs_b: DataFrame,
    text_col: str = "text",
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """Estimated token-set overlap between two corpora WITHOUT a join:
    one row (est_a, est_b, est_intersection, est_union, jaccard,
    containment_a_in_b, containment_b_in_a).

    Theta sketches support set INTERSECTION and DIFFERENCE, which HLL
    cannot: each side is one scan + partial ``theta_sketch_agg`` (only
    sketch bytes shuffle), and the set algebra runs on two kilobyte
    sketches driver-free. This is the planning probe you run BEFORE
    paying for pairwise dedup or a decontamination join at 100 TB —
    "how much of corpus B is already in corpus A" for kilobytes of I/O.
    Pairs with `dedup.pair_mass_estimate` (how expensive would the join
    be) the way a cost model pairs with an optimizer.
    """
    sa = _token_stream(docs_a, text_col).agg(
        F.theta_sketch_agg("token", F.lit(lgk)).alias("sk")
    )
    sb = _token_stream(docs_b, text_col).agg(
        F.theta_sketch_agg("token", F.lit(lgk)).alias("sk")
    )
    both = sa.select(F.col("sk").alias("sk_a")).crossJoin(
        sb.select(F.col("sk").alias("sk_b"))
    )
    est = both.select(
        F.theta_sketch_estimate("sk_a").alias("est_a"),
        F.theta_sketch_estimate("sk_b").alias("est_b"),
        F.theta_sketch_estimate(
            F.theta_intersection("sk_a", "sk_b")
        ).alias("est_intersection"),
        F.theta_sketch_estimate(F.theta_union("sk_a", "sk_b")).alias("est_union"),
    )
    return est.select(
        "est_a",
        "est_b",
        "est_intersection",
        "est_union",
        F.round(F.col("est_intersection") / F.greatest(F.col("est_union"), F.lit(1.0)), 6)
        .alias("jaccard"),
        F.round(F.col("est_intersection") / F.greatest(F.col("est_a"), F.lit(1.0)), 6)
        .alias("containment_a_in_b"),
        F.round(F.col("est_intersection") / F.greatest(F.col("est_b"), F.lit(1.0)), 6)
        .alias("containment_b_in_a"),
    )


def source_overlap_matrix(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """Pairwise estimated token-set Jaccard/containment between every
    pair of sources in one table: (source_a, source_b, est_a, est_b,
    est_intersection, jaccard, containment_a_in_b).

    One scan builds a per-source theta sketch (partial agg, sketch bytes
    only); the pairwise set algebra is a self-join of the K-row sketch
    relation — K² sketch intersections over kilobytes, independent of
    corpus size. The standard "which of my 30 crawl snapshots duplicate
    each other" probe: the quadratic part runs on sketches, never rows.
    """
    per_src = (
        docs.select(F.col(source_col).alias("src"), F.col(text_col).alias("text"))
        .select("src", F.explode(tokens(F.lower(F.col("text")))).alias("token"))
        .filter(F.length("token") > 0)
        .groupBy("src")
        .agg(F.theta_sketch_agg("token", F.lit(lgk)).alias("sk"))
    )
    a = per_src.select(F.col("src").alias("source_a"), F.col("sk").alias("sk_a"))
    b = per_src.select(F.col("src").alias("source_b"), F.col("sk").alias("sk_b"))
    pairs = a.join(b, F.col("source_a") < F.col("source_b"))
    return pairs.select(
        "source_a",
        "source_b",
        F.theta_sketch_estimate("sk_a").alias("est_a"),
        F.theta_sketch_estimate("sk_b").alias("est_b"),
        F.theta_sketch_estimate(
            F.theta_intersection("sk_a", "sk_b")
        ).alias("est_intersection"),
        F.round(
            F.theta_sketch_estimate(F.theta_intersection("sk_a", "sk_b"))
            / F.greatest(
                F.theta_sketch_estimate(F.theta_union("sk_a", "sk_b")), F.lit(1.0)
            ),
            6,
        ).alias("jaccard"),
        F.round(
            F.theta_sketch_estimate(F.theta_intersection("sk_a", "sk_b"))
            / F.greatest(F.theta_sketch_estimate("sk_a"), F.lit(1.0)),
            6,
        ).alias("containment_a_in_b"),
    )


def shard_length_sketches(
    docs: DataFrame,
    shard_col: str = "shard",
    text_col: str = "text",
    k: int = 200,
) -> DataFrame:
    """Per-shard KLL sketch of the doc-length (token count)
    distribution: (shard, kll binary, n). The stored-quantiles twin of
    `shard_token_sketches`: persist one KLL blob per ingested shard and
    any later quantile question about any union of shards is answered by
    `merge_length_sketches` over kilobytes — ``approx_percentile``
    cannot do this because its summary is not a storable/mergeable
    column value.
    """
    ntok = token_count(F.col(text_col)).cast("bigint")
    return (
        docs.select(F.col(shard_col).alias("shard"), ntok.alias("n_tokens"))
        .groupBy("shard")
        .agg(F.kll_sketch_agg_bigint("n_tokens", F.lit(k)).alias("kll"))
        .select(
            "shard", "kll", F.kll_sketch_get_n_bigint("kll").alias("n")
        )
    )


def merge_length_sketches(
    sketches: DataFrame,
    quantiles: tuple[float, ...] = (0.1, 0.5, 0.9, 0.99),
    kll_col: str = "kll",
) -> DataFrame:
    """Merge per-shard KLL sketches and read global doc-length
    quantiles: one row (n, q_10, q_50, q_90, q_99, ...) — the
    incremental-ingest read path, no rescan of the shards."""
    merged = sketches.agg(F.kll_merge_agg_bigint(kll_col).alias("kll"))
    cols = [F.kll_sketch_get_n_bigint("kll").alias("n")] + [
        F.kll_sketch_get_quantile_bigint("kll", F.lit(q)).alias(
            f"q_{int(q * 100):02d}"
        )
        for q in quantiles
    ]
    return merged.select(*cols)


def shard_frequency_sketches(
    docs: DataFrame,
    shard_col: str = "shard",
    text_col: str = "text",
    eps: float = 1e-4,
    confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """Per-shard count-min sketch of token frequencies:
    (shard, cms binary, n_tokens).

    The FREQUENCY member of the mergeable-sketch family (HLL =
    cardinality, theta = set algebra, KLL = quantiles): ~(2/eps) ×
    ln(1/(1-confidence)) counters per shard, built with one partial
    aggregation — token values never shuffle, only sketch bytes. Store
    one blob per shard/day; any later "how often does token X appear in
    shards S" is `probe_token_frequencies` over kilobytes. Estimates
    overcount only (est ≥ true, est ≤ true + eps·N at `confidence`).
    """
    toks = (
        docs.select(F.col(shard_col).alias("shard"), F.col(text_col).alias("text"))
        .select("shard", F.explode(tokens(F.lower(F.col("text")))).alias("token"))
        .filter(F.length("token") > 0)
    )
    return toks.groupBy("shard").agg(
        F.count_min_sketch(
            "token", F.lit(eps), F.lit(confidence), F.lit(seed)
        ).alias("cms"),
        F.count(F.lit(1)).alias("n_tokens"),
    )


def probe_token_frequencies(
    sketches: DataFrame, probe_tokens: list[str], cms_col: str = "cms"
) -> DataFrame:
    """Merge per-shard CMS blobs and estimate each probe token's global
    count: (token, est_count).

    The merge+probe runs DRIVER-SIDE on Spark's own
    `org.apache.spark.util.sketch.CountMinSketch` — the sketches are
    kilobytes regardless of corpus size, so this is the same
    "collect the tiny summary" shape as BuildIndex's count map, not a
    driver-side data scan. All shards must share (eps, confidence,
    seed) or the underlying merge raises IncompatibleMergeException.
    """
    spark = sketches.sparkSession
    blobs = [bytes(r[cms_col]) for r in sketches.select(cms_col).collect()]
    if not blobs:
        return spark.createDataFrame([], "token string, est_count bigint")
    jvm = spark._jvm
    merged = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(blobs[0])
    for b in blobs[1:]:
        merged.mergeInPlace(jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(b))
    rows = [(t, int(merged.estimateCount(t))) for t in probe_tokens]
    return spark.createDataFrame(rows, "token string, est_count bigint")


def _numeric(dtype: str) -> bool:
    return dtype in ("tinyint", "smallint", "int", "bigint", "float", "double") or (
        dtype.startswith("decimal")
    )


def profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One-pass, long-format column profile: for every column its
    non-null count, null count, approximate distinct count, and (for
    numerics) min / max / approximate median.

    Exactly ONE aggregate over one scan — all per-column statistics are
    partial-aggregated together, then the single wide row is unpivoted
    to (column, stat, value) rows with `stack` (driver-free). The
    pattern replaces the N-scans-for-N-columns profiler loop that never
    survives a 100 TB table.
    """
    names = cols or df.columns
    dtypes = dict(df.dtypes)
    aggs: list[Column] = []
    for c in names:
        aggs.append(F.count(F.col(c)).cast("double").alias(f"{c}__n"))
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("double")
            .alias(f"{c}__nulls")
        )
        aggs.append(
            F.approx_count_distinct(c).cast("double").alias(f"{c}__distinct")
        )
        if _numeric(dtypes[c]):
            aggs.append(F.min(c).cast("double").alias(f"{c}__min"))
            aggs.append(F.max(c).cast("double").alias(f"{c}__max"))
            aggs.append(
                F.approx_percentile(F.col(c), F.lit(0.5), F.lit(1000))
                .cast("double")
                .alias(f"{c}__p50")
            )
    wide = df.agg(*aggs)
    pieces = []
    for c in wide.columns:
        col_name, stat = c.rsplit("__", 1)
        pieces.append(f"'{col_name}', '{stat}', `{c}`")
    n = len(pieces)
    stacked = wide.select(
        F.expr(f"stack({n}, {', '.join(pieces)}) AS (column, stat, value)")
    )
    return stacked
