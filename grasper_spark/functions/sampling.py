"""Dataset sampling/splitting for training pipelines.

- `hash_split`: deterministic train/val/test assignment from a
  md5-derived bucket of the id — stable across runs, engines, and
  cluster sizes (reproducible in DuckDB, oracle-checked).
- `stratified_sample`: per-stratum fractions via sampleBy (seeded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from grasper_spark.functions.text import _md5_int

BUCKETS = 10_000


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """Adds a `split` column by hashing the id into 10k buckets and
    cutting at the cumulative weight boundaries. Deterministic: the
    same id always lands in the same split, anywhere."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    assert abs(sum(weights.values()) - 1.0) < 1e-9, "weights must sum to 1"
    bucket = _md5_int(F.col(id_col).cast("string")) % BUCKETS
    expr = F.lit(None).cast("string")
    cum = 0.0
    for name, w in weights.items():
        lo, cum = cum, cum + w
        cond = (bucket >= int(round(lo * BUCKETS))) & (bucket < int(round(cum * BUCKETS)))
        expr = F.when(cond, F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame, stratum_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-stratum sampling (e.g. language-balanced subsets)."""
    return df.sampleBy(stratum_col, fractions, seed=seed)


def export_shards(
    df: DataFrame, id_col: str = "doc_id", num_shards: int = 8
) -> DataFrame:
    """Deterministic training-data ordering: assign every row a shard
    and a position within it, stable across runs, engines, and cluster
    sizes (md5-derived, reproducible in DuckDB).

    This is the global-shuffle step before writing training shards: a
    downstream writer does partitionBy(shard) + sort by pos. Positions
    are a per-shard window — pick num_shards well above the executor
    count at scale (e.g. 10k) so each window partition stays bounded;
    there is no global single-partition ordering anywhere."""
    from pyspark.sql import Window

    h = _md5_int(F.col(id_col).cast("string"))
    shard = F.pmod(h, F.lit(num_shards)).cast("int")
    w = Window.partitionBy("shard").orderBy(F.col("_h"), F.col(id_col))
    return (
        df.withColumn("_h", h)
        .withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w))
        .drop("_h")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    num_shards: int = 8,
    fmt: str = "parquet",
) -> None:
    """Materialize a dataset as `num_shards` deterministic training
    shards: shard subdirectories (partitionBy) whose files hold rows in
    the stable `export_shards` order.

    Scale shape: one shuffle (repartition on shard) + a within-partition
    sort — no global ordering, no driver collect. Readers stream shard
    directories independently; `pos` rides along so any reader can
    verify or re-establish order."""
    sharded = export_shards(df, id_col, num_shards)
    (
        sharded.repartition(num_shards, "shard")
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .format(fmt)
        .save(path)
    )


def read_training_shards(spark, path: str, fmt: str = "parquet") -> DataFrame:
    """Read shards back; per-shard order is recoverable via `pos`."""
    return spark.read.format(fmt).load(path)


def write_shard_manifest(spark, path: str, id_col: str = "doc_id",
                         fmt: str = "parquet") -> dict:
    """Write a `_MANIFEST.json` next to the shards: per-shard row count
    and an order-insensitive content checksum (xor/sum of xxhash64 of
    the id+pos pair), plus totals. Readers verify a transfer or a
    re-materialization without re-reading the producer's session —
    the integrity half of exactly-once shard delivery (the write side
    is idempotent: same input → byte-identical shard contents).

    One aggregation job; the manifest relation is one row per shard."""
    import json
    import os as _os

    df = read_training_shards(spark, path, fmt)
    per = (
        df.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            # decimal(38,0) sum: ANSI mode overflows a LongType sum of
            # 64-bit hashes; decimal is exact and order-insensitive
            F.sum(
                F.xxhash64(F.col(id_col).cast("string"), F.col("pos"))
                .cast("decimal(38,0)")
            ).alias("checksum"),
        )
        .collect()
    )
    manifest = {
        "shards": {
            str(r["shard"]): {"rows": r["rows"], "checksum": str(r["checksum"])}
            for r in per
        },
        "total_rows": int(sum(r["rows"] for r in per)),
        "num_shards": len(per),
    }
    with open(_os.path.join(path, "_MANIFEST.json"), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    return manifest


def verify_shard_manifest(spark, path: str, id_col: str = "doc_id",
                          fmt: str = "parquet") -> bool:
    """Recompute the manifest and compare — True iff every shard's row
    count and checksum match (a failed/partial copy shows up as a
    missing shard or a checksum drift)."""
    import json
    import os as _os

    with open(_os.path.join(path, "_MANIFEST.json")) as fh:
        want = json.load(fh)
    df = read_training_shards(spark, path, fmt)
    per = (
        df.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            # decimal(38,0) sum: ANSI mode overflows a LongType sum of
            # 64-bit hashes; decimal is exact and order-insensitive
            F.sum(
                F.xxhash64(F.col(id_col).cast("string"), F.col("pos"))
                .cast("decimal(38,0)")
            ).alias("checksum"),
        )
        .collect()
    )
    now = {
        str(r["shard"]): {"rows": r["rows"], "checksum": str(r["checksum"])}
        for r in per
    }
    return now == want["shards"]


def quota_sample(
    df: DataFrame, group_col: str, n_per_group: int, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic per-group quota sampling (language/source balancing
    for training-data mixes): keep the `n_per_group` rows with the
    smallest md5-derived rank within each group. No RNG — the sample is
    reproducible across runs, engines, and partitionings (md5 of the id,
    ties broken by id), so a rebalanced corpus can be re-derived
    bit-identically anywhere.

    Scale: one hash-partitioned window per group — groups are the
    parallelism unit and per-group state is O(n_per_group) with rank
    early-stop. A single giant group is the pathological case; cap it
    upstream or sample in two phases (per-partition top-n, then global).
    """
    from pyspark.sql import Window

    r = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(group_col).orderBy(r, F.col(id_col))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_group)
        .drop("_rk")
    )


def mix_sources(
    df: DataFrame,
    weights: dict[str, float],
    total_tokens: int,
    source_col: str = "lang",
    len_col: str = "n_tokens",
    id_col: str = "doc_id",
    buckets: int = 256,
) -> DataFrame:
    """Source-weighted mixture to a token budget: keep a deterministic
    md5-ranked prefix of each source so that kept tokens per source stay
    ≤ weight-share of `total_tokens` (sources without a weight drop).

    Semantics: source s gets budget_s = total_tokens·w_s/Σw; a doc is
    kept iff its cumulative token END (in md5-rank order) ≤ budget_s —
    strictly under budget, deterministic across runs/engines/cluster
    sizes. Under-full sources keep everything; no rebalancing (declared
    mixture ratios, DoReMi-style, are the caller's contract).

    Scale shape — the cumulative cut WITHOUT a per-source global window
    (a hot source would serialize into one partition): docs hash into
    `buckets` md5 sub-buckets per source; per-(source,bucket) token
    sums (one partial-agg groupBy over ≤ sources×buckets rows) produce
    running bucket offsets on the tiny side, broadcast back. Buckets
    wholly under budget keep all docs with NO window; only the single
    boundary bucket per source runs an exact within-bucket cumulative
    window (~1/buckets of that source's rows).
    """
    share = {s: w / sum(weights.values()) for s, w in weights.items()}
    budget = F.create_map(
        *[x for s, w in share.items()
          for x in (F.lit(s), F.lit(float(int(total_tokens * w))))]
    )
    h = F.md5(F.col(id_col).cast("string"))
    d = (
        df.filter(F.col(source_col).isin(list(weights)))
        .withColumn("_h", h)
        .withColumn("_bk", (_md5_int(F.col(id_col).cast("string")) % buckets))
        .withColumn("_budget", budget[F.col(source_col)])
    )
    bucket_sums = (
        d.groupBy(source_col, "_bk")
        .agg(F.sum(len_col).cast("double").alias("_bsum"))
    )
    w_off = (
        Window.partitionBy(source_col).orderBy("_bk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bucket_sums.withColumn(
        "_before", F.coalesce(F.sum("_bsum").over(w_off), F.lit(0.0))
    )
    d = d.join(F.broadcast(offsets), [source_col, "_bk"])
    # whole buckets strictly inside the budget: keep with no window
    inside = d.filter(F.col("_before") + F.col("_bsum") <= F.col("_budget"))
    # the boundary bucket: exact cumulative cut within the bucket only
    wb = (
        Window.partitionBy(source_col, "_bk").orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    boundary = (
        d.filter(
            (F.col("_before") < F.col("_budget"))
            & (F.col("_before") + F.col("_bsum") > F.col("_budget"))
        )
        .withColumn("_cum", F.sum(len_col).over(wb))
        .filter(F.col("_before") + F.col("_cum") <= F.col("_budget"))
        .drop("_cum")
    )
    drop = ["_h", "_bk", "_budget", "_bsum", "_before"]
    return inside.unionByName(boundary).drop(*drop)


def importance_sample(
    df: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    floor: float = 0.1,
    power: float = 1.0,
) -> DataFrame:
    """Deterministic quality-weighted downsampling: keep a row with
    probability p = clamp(score^power, floor, 1) — high-quality docs
    always survive, low-quality ones thin out, and the "coin flip" is
    the md5 of the id, so the SAME corpus gives the SAME sample on any
    engine, partitioning, or cluster size (no RNG state to ship).

    `score_col` is expected in [0, 1] (e.g. text.quality_score);
    `power` > 1 sharpens the preference, `floor` guarantees minimum
    representation of the low end (the DoReMi-ish smoothing knob).
    Pure column arithmetic — scan-speed, zero shuffle.

    Small integer powers expand to repeated multiplication: each
    multiply is a single correctly-rounded IEEE op, identical on any
    engine, while pow() may route through exp/ln on some platforms and
    drift a ulp — enough to flip the keep/drop threshold comparison for
    a boundary row in a cross-engine exact-compare gate."""
    if float(power).is_integer() and 1 <= int(power) <= 4:
        powed = F.col(score_col)
        for _ in range(int(power) - 1):
            powed = powed * F.col(score_col)
    else:
        powed = F.pow(F.col(score_col), F.lit(float(power)))
    p = F.least(F.lit(1.0), F.greatest(F.lit(float(floor)), powed))
    u = (_md5_int(F.col(id_col).cast("string")) % BUCKETS) / F.lit(float(BUCKETS))
    return df.filter(u < p)
