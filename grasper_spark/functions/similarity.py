"""Similarity search over embedding columns (array<float>).

- `cosine_topk`: brute-force exact top-k for a (small) query set —
  broadcast the queries, one pass over the corpus, per-query top-k via
  window. The baseline every ANN variant is measured against.
- `lsh_topk`: random-hyperplane LSH bucketing (deterministic md5-derived
  planes) — the scale path: the corpus is bucketed once; queries probe
  only their bucket (+ optional multi-probe neighbors).

All arithmetic is JVM-side (`F.zip_with`/`F.aggregate` fold, double
precision, left-to-right), rounded to 6 dp for presentation. NOTE:
6-dp rounding is NOT bit-stable across engines (fold order and the
rounding step itself both differ) — exact-compare gates should use the
`qint_*` integer-exact variants below instead of hashing these floats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return F.round(_dot(a, b) / (_norm(a) * _norm(b)), 6)


def cosine_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query vector (excluding self).

    Returns (query_id, neighbor_id, sim, rank). Ties broken by
    neighbor_id for determinism."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def _plane(dim: int, j: int) -> list[float]:
    """Deterministic pseudo-random hyperplane from md5 — reproducible
    anywhere: component i = (md5int(f"p{j}_{i}") / 2^31) - 1."""
    import hashlib

    out = []
    for i in range(dim):
        h = int(hashlib.md5(f"p{j}_{i}".encode()).hexdigest()[:8], 16)
        out.append(h / 2**31 - 1.0)
    return out


def lsh_bucket(vec: Column, dim: int, num_planes: int = 8, plane_offset: int = 0) -> Column:
    """Sign-pattern bucket id from `num_planes` fixed hyperplanes.

    `plane_offset` selects a disjoint plane family — banded LSH uses
    offset b*planes_per_band for band b so bands are independent."""
    bucket = F.lit(0)
    for j in range(num_planes):
        plane = _plane(dim, plane_offset + j)
        dot = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(p) for p in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def cosine_neardup_pairs(
    corpus: DataFrame, threshold: float = 0.95,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim ≥ t).

    Exact all-pairs — correct but O(n²); at corpus scale, generate
    candidates with lsh_topk/ivf_topk buckets first and verify with
    this on the candidate set only."""
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return (
        pairs.select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def lsh_neardup_pairs(
    corpus: DataFrame, threshold: float = 0.4, dim: int = 64,
    num_planes: int = 16, bands: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs at scale: banded hyperplane-LSH
    candidates verified by exact cosine (id_a < id_b, sim ≥ threshold).

    `num_planes` planes split into `bands` bands; a pair is a candidate
    iff it collides in ≥1 band. Candidate mass ~ Σ_band Σ_bucket n_b² —
    bucketed, never all-pairs (the fix for cosine_neardup_pairs'
    O(n²) join). Recall per pair = 1-(1-(1-θ/π)^ppb)^bands, tunable:
    more planes/band → fewer candidates, lower recall. Verification is
    exact, so precision is 1.0 vs the threshold."""
    ppb = num_planes // bands
    assert ppb * bands == num_planes, "num_planes must divide evenly into bands"
    buckets = corpus.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    lsh_bucket(F.col(vec_col), dim, ppb, plane_offset=b * ppb).alias("bucket"),
                )
                for b in range(bands)
            ])
        ).alias("bk"),
    ).select("id", "bk.band", "bk.bucket")
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.id") < F.col("b.id")), "inner")
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    va = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        cand.join(va, "id_a").join(vb, "id_b")
        .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def semantic_dedup(
    corpus: DataFrame, threshold: float = 0.4, dim: int = 64,
    num_planes: int = 16, bands: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
    assigned: DataFrame | None = None, pairs: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): mark every vector that has a semantically
    near-identical smaller-id neighbor as a drop candidate.

    Returns one row per corpus vector: ``(id, keep, nn_sim)`` —
    ``keep = false`` iff some neighbor with a smaller id has
    ``cosine ≥ threshold`` (greedy min-id survivor, the same
    deterministic rule as exact_dedup's min-id keeper); ``nn_sim`` is
    the best such similarity (NULL for kept rows).

    Candidate generation (never all-pairs):
    - default: banded hyperplane-LSH pairs (`lsh_neardup_pairs`) —
      md5-deterministic, so an engine-independent oracle can mirror it;
    - ``assigned=`` an `ivf_index` assignment (id, cluster): candidates
      are within-cluster pairs — the paper's k-means scoping; pair mass
      is Σ n_c², controlled by n_clusters;
    - ``pairs=`` precomputed (id_a, id_b, sim) to reuse an existing
      near-dup relation.

    Scale shape: bucketed candidate join + one partial-aggregated
    groupBy(id_b) + one left join back to the id set — no quadratic
    stage, no driver-side state.
    """
    if pairs is None:
        if assigned is not None:
            a = assigned.select(F.col(id_col).alias("id_a"),
                                F.col(vec_col).alias("va"), "cluster")
            b = assigned.select(F.col(id_col).alias("id_b"),
                                F.col(vec_col).alias("vb"), "cluster")
            pairs = (
                a.join(b, ["cluster"])
                .filter(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b",
                        cosine(F.col("va"), F.col("vb")).alias("sim"))
                .filter(F.col("sim") >= threshold)
            )
        else:
            pairs = lsh_neardup_pairs(
                corpus, threshold, dim, num_planes, bands, id_col, vec_col
            )
    worst = pairs.groupBy(F.col("id_b").alias(id_col)).agg(
        F.max("sim").alias("nn_sim")
    )
    return (
        corpus.select(id_col)
        .join(worst, id_col, "left")
        .select(id_col, F.col("nn_sim").isNull().alias("keep"), "nn_sim")
    )


def ivf_index(
    corpus: DataFrame, n_clusters: int = 16, id_col: str = "vec_id",
    vec_col: str = "embedding", seed: int = 42, max_iter: int = 20,
):
    """Train an IVF (inverted-file) index: seeded KMeans centroids +
    cluster assignment for every corpus vector.

    Returns (assigned_df, centroids) where assigned_df adds a `cluster`
    column and centroids is a list[(cluster_id, vector)]. At scale the
    assignment is written out partitioned by cluster so a probe reads
    only its clusters' files."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    ml_df = corpus.select(
        F.col(id_col), F.col(vec_col),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    model = KMeans(
        k=n_clusters, seed=seed, maxIter=max_iter, featuresCol="features"
    ).fit(ml_df)
    assigned = model.transform(ml_df).withColumnRenamed("prediction", "cluster").drop(
        "features"
    )
    centroids = [(i, c.tolist()) for i, c in enumerate(model.clusterCenters())]
    return assigned, centroids


def ivf_topk(
    assigned: DataFrame, centroids: list, queries: DataFrame, k: int = 10,
    n_probe: int = 4, id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score each query only against the `n_probe`
    clusters whose centroids are closest (by cosine) to the query.

    Probing is a broadcast join of (query, cluster) pairs against the
    cluster-partitioned corpus — the IVF pruning that makes ANN linear
    in |probed clusters| instead of |corpus|."""
    spark = assigned.sparkSession
    cent_df = spark.createDataFrame(centroids, ["cluster", "centroid"])
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    q_scored = q.crossJoin(F.broadcast(cent_df)).select(
        "query_id", "qv", "cluster",
        cosine(F.col("qv"), F.col("centroid").cast("array<double>")).alias("csim"),
    )
    w_probe = Window.partitionBy("query_id").orderBy(F.col("csim").desc(), F.col("cluster"))
    probes = (
        q_scored.withColumn("pr", F.row_number().over(w_probe))
        .filter(F.col("pr") <= n_probe)
        .select("query_id", "qv", "cluster")
    )
    c = assigned.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "cluster"
    )
    scored = (
        c.join(F.broadcast(probes), "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def lsh_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10, dim: int = 64,
    num_planes: int = 8, id_col: str = "vec_id", vec_col: str = "embedding",
    multi_probe: bool = False,
) -> DataFrame:
    """Approximate top-k: probe the query's LSH bucket; with
    multi_probe, also every 1-bit-flip neighbor bucket (the standard
    multi-probe recall/cost trade: ×(num_planes+1) probed buckets, no
    extra corpus passes — near-misses on ONE hyperplane are the dominant
    recall loss, and a single flip recovers them).

    At scale the corpus side is bucketed/partitioned once and reused;
    recall is tunable via num_planes (fewer planes → bigger buckets)
    and multi_probe."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        lsh_bucket(F.col(vec_col), dim, num_planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        lsh_bucket(F.col(vec_col), dim, num_planes).alias("bucket"),
    )
    if multi_probe:
        probes = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(num_planes)],
        )
        q = q.withColumn("bucket", F.explode(probes))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("sim"))
    )
    if multi_probe:
        # a (query, neighbor) pair can match in several probed buckets
        scored = scored.distinct()
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


# ---------------------------------------------------------------------------
# Integer-exact (bit-reproducible) LSH top-k
# ---------------------------------------------------------------------------
#
# Cross-engine regression gates (Spark vs DuckDB/Presto/…) cannot hash
# float similarities: float FOLDS are order-sensitive (an engine may sum
# a list pairwise instead of left-to-right) and decimal ROUNDING differs
# between exact-decimal HALF_UP (Spark) and multiply-based rounding (C
# engines) even on bit-identical inputs. The `qint_*` variants make the
# whole pipeline exact: components are quantized by a POWER-OF-TWO scale
# (`floor(v * 4096)` — the multiply is exact, no rounding step at all),
# every dot/norm/bucket is an int64 fold (commutative, fold-order-free),
# and the ranking key is sign(d) * (d² div n) — pure integer arithmetic,
# so any engine reproduces identical rows bit-for-bit.
#
# Bounds at QINT_SCALE=4096 and dim 64 with |v| ≤ 1: |q_i| ≤ 4096,
# |dot| ≤ 64·4096² ≈ 1.07e9, dot² ≈ 1.15e18 < 2^63 (8× headroom).

QINT_SCALE = 4096


def _check_qint_bounds(scale: int, dim: int, den: int) -> None:
    """int64-overflow guard for the qint operators: with |v| ≤ 1 the
    worst dot is dim·scale², and the ranking/threshold tests square it
    (×den²). Spark longs wrap SILENTLY outside ANSI mode — reject
    configurations that could, instead of returning wrong integers."""
    worst_dot = dim * scale * scale
    if worst_dot * worst_dot > (2**63 - 1) // max(den * den, 1):
        raise ValueError(
            f"qint scale {scale} with dim {dim} (den {den}) can overflow "
            f"int64 in dot²·den² — use a smaller scale"
        )


def quantize_vec(vec: Column, scale: int = QINT_SCALE) -> Column:
    """`floor(v_i * scale)` as array<long>. With a power-of-two scale the
    multiply is exact in IEEE double, so the result depends only on the
    input bits — reproducible on any engine."""
    return F.transform(vec, lambda x: F.floor(x.cast("double") * F.lit(float(scale))))


def int_dot(a: Column, b: Column) -> Column:
    """Exact int64 dot product of two array<long> columns (fold-order-free)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def qint_lsh_bucket(
    qvec: Column, dim: int, num_planes: int = 8, plane_offset: int = 0,
    scale: int = QINT_SCALE,
) -> Column:
    """Sign-pattern bucket over the quantized components against
    integer-quantized hyperplanes — the exact-arithmetic twin of
    :func:`lsh_bucket` (bit differences only where a float plane dot is
    within quantization noise of zero)."""
    import math

    bucket = F.lit(0)
    for j in range(num_planes):
        pq = [math.floor(p * scale) for p in _plane(dim, plane_offset + j)]
        dot = int_dot(qvec, F.array(*[F.lit(v).cast("long") for v in pq]))
        bucket = bucket + F.when(dot > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def qint_lsh_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10, dim: int = 64,
    num_planes: int = 8, id_col: str = "vec_id", vec_col: str = "embedding",
    scale: int = QINT_SCALE,
) -> DataFrame:
    """Integer-exact LSH top-k: same bucket-probe shape as
    :func:`lsh_topk`, but every hashed quantity is an int64 and the
    per-query ranking is by the exact integer key
    ``sign(dot) * (dot² div ‖c‖²)`` (monotone in cos for a fixed query,
    since the query norm is constant within a partition), ties broken by
    neighbor_id. Returns (query_id, neighbor_id, dot_q, norm_q, rank) —
    all integers, safe to hash-compare across engines.

    Scale path is identical to lsh_topk: corpus bucketed once, queries
    broadcast, candidates only — never all-pairs."""
    c = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            quantize_vec(F.col(vec_col), scale).alias("cq"),
        )
        .withColumn("bucket", qint_lsh_bucket(F.col("cq"), dim, num_planes, scale=scale))
        .withColumn("norm_q", int_dot(F.col("cq"), F.col("cq")))
        .filter(F.col("norm_q") > 0)
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        quantize_vec(F.col(vec_col), scale).alias("qq"),
    ).withColumn("bucket", qint_lsh_bucket(F.col("qq"), dim, num_planes, scale=scale))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            int_dot(F.col("qq"), F.col("cq")).alias("dot_q"), "norm_q",
        )
    )
    key = F.when(
        F.col("dot_q") >= 0, F.expr("(dot_q * dot_q) div norm_q")
    ).otherwise(-F.expr("(dot_q * dot_q) div norm_q"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("qkey").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("qkey", key)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "dot_q", "norm_q", "rank")
    )


def qint_cosine_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    scale: int = QINT_SCALE,
) -> DataFrame:
    """Integer-exact twin of :func:`cosine_topk`: brute-force top-k with
    the per-query ranking key ``sign(dot)·(dot² div ‖c‖²)`` and the
    reported similarity ``sign(dot)·(dot² div (‖q‖²·‖c‖² div 1e6))``
    (quantized cos²·1e6) — pure int64 end to end, so any engine
    reproduces identical rows. Same scale shape: queries broadcast, one
    corpus pass, per-query top-k window.

    Returns (query_id, neighbor_id, dot_q, sim_q, rank)."""
    _check_qint_bounds(scale, 64, 1)
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            quantize_vec(F.col(vec_col), scale).alias("qq"),
        )
        .withColumn("na", int_dot(F.col("qq"), F.col("qq")))
        .filter(F.col("na") > 0)
    )
    c = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            quantize_vec(F.col(vec_col), scale).alias("cq"),
        )
        .withColumn("nb", int_dot(F.col("cq"), F.col("cq")))
        .filter(F.col("nb") > 0)
        # exchange barrier: without it the quantize+norm projection
        # fuses INTO the crossJoin and recomputes per (query, corpus)
        # pair instead of once per corpus row (measured 2x on the
        # broadcast-queries shape). At corpus scale qv would be a
        # precomputed stored column instead.
        .repartition(F.col("neighbor_id"))
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            int_dot(F.col("qq"), F.col("cq")).alias("dot_q"), "na", "nb",
        )
    )
    key = F.when(
        F.col("dot_q") >= 0, F.expr("(dot_q * dot_q) div nb")
    ).otherwise(-F.expr("(dot_q * dot_q) div nb"))
    simq = F.when(
        F.col("dot_q") >= 0,
        F.expr("(dot_q * dot_q) div greatest((na * nb) div 1000000, 1)"),
    ).otherwise(
        -F.expr("(dot_q * dot_q) div greatest((na * nb) div 1000000, 1)")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qkey").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("qkey", key)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "dot_q",
            simq.cast("long").alias("sim_q"), "rank",
        )
    )


#: scale for the near-dup variant: the threshold test multiplies dot²
#: by den² (≤ 25), so the quantized dot must stay ≤ ~6e8 to keep
#: den²·dot² inside int64 — 2048 does (dim 64, |v| ≤ 1 → dot ≤ 2.7e8).
QINT_NEARDUP_SCALE = 2048


#: quantized cos²·1e6 as an exact int64 over named columns (d, na, nb):
#: pure integer `div` ops — ~6 significant digits, identical on any
#: engine (a float division of ints past 2^53 would NOT be exact)
_SIM_Q_EXPR = (
    "CASE WHEN {d} < 0 THEN CAST(0 AS BIGINT) "
    "ELSE ({d} * {d}) div greatest(({na} * {nb}) div 1000000, 1) END"
)


def qint_lsh_neardup_pairs(
    corpus: DataFrame, threshold_num: int = 2, threshold_den: int = 5,
    dim: int = 64, num_planes: int = 16, bands: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
    scale: int = QINT_NEARDUP_SCALE,
) -> DataFrame:
    """Integer-exact twin of :func:`lsh_neardup_pairs` for
    exact-compare gates and engine-migration audits: banded buckets
    from integer plane dots, and the cosine-threshold test evaluated
    WITHOUT floats — ``cos ≥ num/den`` ⇔ ``dot ≥ 0 ∧ den²·dot² ≥
    num²·‖a‖²·‖b‖²`` over the quantized components, all int64 at the
    default scale. Any engine computes the identical pair set — no
    boundary pair can flip on a libm/fold quirk (the sf1 corpus has a
    candidate within 1e-6 of 0.4; the float form is one ulp drift away
    from a row-count mismatch).

    Returns (id_a, id_b, dot_q, sim_q): sim_q = quantized cos²·1e6 as
    int64. Default threshold 2/5 = 0.4. Same candidates-only scale
    shape as the float form: bucketed band self-join, never all-pairs."""
    _check_qint_bounds(scale, dim, threshold_den)
    ppb = num_planes // bands
    assert ppb * bands == num_planes, "num_planes must divide evenly into bands"
    q = (
        corpus.select(
            F.col(id_col).alias("id"), quantize_vec(F.col(vec_col), scale).alias("qv")
        )
        .withColumn("nq", int_dot(F.col("qv"), F.col("qv")))
        .filter(F.col("nq") > 0)
    )
    buckets = q.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    qint_lsh_bucket(
                        F.col("qv"), dim, ppb, plane_offset=b * ppb, scale=scale
                    ).alias("bucket"),
                )
                for b in range(bands)
            ])
        ).alias("bk"),
    ).select("id", "bk.band", "bk.bucket")
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.id") < F.col("b.id")), "inner")
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    va = q.select(F.col("id").alias("id_a"), F.col("qv").alias("qa"), F.col("nq").alias("na"))
    vb = q.select(F.col("id").alias("id_b"), F.col("qv").alias("qb"), F.col("nq").alias("nb"))
    num2, den2 = threshold_num * threshold_num, threshold_den * threshold_den
    scored = (
        cand.join(va, "id_a").join(vb, "id_b")
        .select(
            "id_a", "id_b",
            int_dot(F.col("qa"), F.col("qb")).alias("dot_q"), "na", "nb",
        )
    )
    return (
        scored.filter(
            (F.col("dot_q") >= 0)
            & (F.col("dot_q") * F.col("dot_q") * F.lit(den2)
               >= F.col("na") * F.col("nb") * F.lit(num2))
        )
        .select(
            "id_a", "id_b", "dot_q",
            F.expr(
                _SIM_Q_EXPR.format(d="dot_q", na="na", nb="nb")
            ).cast("long").alias("sim_q"),
        )
    )


def group_centroids(
    emb: DataFrame, group_col: str, vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Per-group embedding centroid: (group, centroid array<double>, n).
    The semantic-drift / topic-summary primitive — e.g. per-language or
    per-source centroids to monitor a corpus, or seed centroids for IVF.

    Scale: ONE partial-aggregated groupBy — the vector unpacks to `dim`
    sum columns (JVM-side, codegen'd; no explode, no UDF) and repacks to
    an array afterwards, so the shuffle carries one row per group, not
    per element. Cross-row float sums are order-nondeterministic at the
    ulp level; centroids are rounded to 6 dp like every other similarity
    value."""
    sums = emb.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.col(vec_col)[i].cast("double")).alias(f"_s{i}")
            for i in range(dim)
        ],
    )
    centroid = F.array(*[F.round(F.col(f"_s{i}") / F.col("n"), 6) for i in range(dim)])
    return sums.select(F.col(group_col), centroid.alias("centroid"), "n")


def write_ivf_index(
    assigned: DataFrame, centroids: list, path: str, vec_col: str = "embedding"
) -> None:
    """Persist an IVF index: the assignment parquet PARTITIONED BY
    cluster (each probe then reads only its clusters' files — Spark
    partition pruning, not a filter over the whole corpus) + the
    shared versioned manifest (ann_index.py) holding the centroid
    table."""
    from grasper_spark.functions.ann_index import data_dir, write_manifest

    assigned.write.mode("overwrite").partitionBy("cluster").parquet(
        data_dir(path, "ivf")
    )
    write_manifest(
        path, "ivf", centroids=centroids, n_clusters=len(centroids),
        vec_col=vec_col,
    )


def read_ivf_index(spark, path: str):
    """(assigned_df, centroids) — inverse of write_ivf_index, with
    manifest validation (pointed errors on a missing/alien/newer
    index). The returned assignment is the partition-pruned read path:
    pass it straight to ivf_topk."""
    from grasper_spark.functions.ann_index import data_dir, read_manifest

    doc = read_manifest(path, expect_kind="ivf")
    assigned = spark.read.parquet(data_dir(path, "ivf"))
    return assigned, doc["centroids"]


def ivf_append(
    spark, path: str, new_vectors: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Incrementally ingest vectors into a persisted IVF index: assign
    each new vector to its nearest stored centroid (broadcast centroid
    table, argmax cosine — no retraining) and APPEND to the cluster-
    partitioned assignment. Centroids drift only on an explicit
    re-train (`ivf_index` + `write_ivf_index`) — the standard IVF
    ingest/retrain split. Returns the new rows' assignment."""
    from grasper_spark.functions.ann_index import data_dir, read_manifest

    # upgrade=True: a legacy (sidecar-only) index gets its manifest
    # written on this append, honoring the ann_index upgrade contract
    centroids = read_manifest(path, expect_kind="ivf", upgrade=True)["centroids"]
    cent_df = spark.createDataFrame(centroids, ["cluster", "centroid"])
    scored = (
        new_vectors.select(id_col, vec_col)
        .crossJoin(F.broadcast(cent_df))
        .select(
            id_col, vec_col, "cluster",
            cosine(F.col(vec_col), F.col("centroid").cast("array<double>")).alias("csim"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("csim").desc(), F.col("cluster"))
    assigned = (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(id_col, vec_col, "cluster")
    )
    assigned.write.mode("append").partitionBy("cluster").parquet(
        data_dir(path, "ivf")
    )
    return assigned


def ivf_append_stream(path: str, id_col: str = "vec_id", vec_col: str = "embedding"):
    """foreachBatch processor for STREAMING ingest into a persisted IVF
    index — each micro-batch broadcast-assigns against the stored
    centroids and appends its partitioned parquet:

        q = (vec_stream.writeStream
             .foreachBatch(ivf_append_stream(index_path))
             .option("checkpointLocation", ckpt).start())

    Exactly-once per batch rides the streaming checkpoint (a replayed
    batch re-appends — pair with a dedup on id at read time if the
    source can replay)."""

    def process(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ivf_append(batch_df.sparkSession, path, batch_df, id_col, vec_col)

    return process
