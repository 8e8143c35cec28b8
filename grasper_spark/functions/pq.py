"""Product quantization (PQ) for embedding columns — the faiss-style
compressed ANN representation, Spark-native.

A d-dim float vector splits into `m` subvectors; each subvector is
replaced by the id of its nearest codeword from a per-subspace codebook
of k=2^nbits centroids. A 64-dim float64 array (512 B) becomes m=8
1-byte codes — a 64× cut on every downstream scan and shuffle, with
query-time scoring by asymmetric distance computation (ADC): the query
precomputes one m×k lookup table of exact sub-dot-products, and a
corpus row's score is just m table lookups + adds.

Why this is the 100 TB design:
- the ENCODE pass is one Arrow-batched vectorized numpy argmin per
  partition (a pandas UDF is the right tool here — the per-row work is
  a (m·k × dsub) matrix product, exactly what BLAS batching is for);
- the SCORE pass is pure JVM column arithmetic: the per-query LUT
  rides in as a broadcast literal column and each of the m lookups is
  a static `element_at` expression — whole-stage codegen, no Python,
  no HOF lambdas on the hot path;
- codes compose with the IVF layout (`similarity.write_ivf_index`):
  partition the CODES by cluster and a probe reads a few small files
  of byte codes — the IVF-PQ architecture.

Training uses the same seeded KMeans as `similarity.ivf_index` (m
independent fits over the subspaces); at scale you fit on a sampled
DataFrame and encode the full corpus.

No reference parity to cite: Grasper has no vector surface — this is
the training-data-pipeline extension (SURVEY.md "beyond the
reference").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pq_train(
    corpus: DataFrame,
    m: int = 8,
    nbits: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> list[list[list[float]]]:
    """Train per-subspace codebooks: returns m codebooks of 2^nbits
    codewords each (plain nested lists — kilobytes, store them next to
    the index). Seeded KMeans per subspace, like `ivf_index`."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    assert dim % m == 0, f"dim {dim} must split evenly into m={m} subspaces"
    dsub = dim // m
    k = 1 << nbits
    codebooks: list[list[list[float]]] = []
    base = corpus.select(F.col(vec_col).cast("array<double>").alias("v"))
    for j in range(m):
        sub = base.select(
            array_to_vector(F.slice("v", j * dsub + 1, dsub)).alias("features")
        )
        model = KMeans(k=k, seed=seed + j, featuresCol="features").fit(sub)
        codebooks.append([c.tolist() for c in model.clusterCenters()])
    return codebooks


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<smallint>) — nearest codeword per subspace.

    One Arrow-batched pandas UDF: per batch, a single
    (rows·m, dsub) × (k, dsub) distance computation + argmin in numpy.
    The closure carries the codebooks (kilobytes) — self-contained,
    no driver state beyond the broadcast of the literal."""
    import numpy as np
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    cb = [[list(map(float, c)) for c in book] for book in codebooks]
    m = len(cb)
    dsub = len(cb[0][0])

    @pandas_udf(T.ArrayType(T.ShortType()))
    def _encode(vecs):
        import numpy as np  # noqa: F811 — self-contained closure

        import pandas as pd

        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        books = np.asarray(cb)  # (m, k, dsub)
        x = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        n = x.shape[0]
        xs = x.reshape(n, m, dsub)
        codes = np.empty((n, m), dtype=np.int16)
        for j in range(m):
            # ||x - c||² = ||x||² - 2x·c + ||c||²; ||x||² is constant
            # within the argmin, so skip it
            dots = xs[:, j, :] @ books[j].T  # (n, k)
            norms = (books[j] ** 2).sum(axis=1)  # (k,)
            codes[:, j] = (norms[None, :] - 2.0 * dots).argmin(axis=1)
        return pd.Series([row.tolist() for row in codes])

    return corpus.select(
        F.col(id_col), _encode(F.col(vec_col).cast("array<double>")).alias("codes")
    )


def pq_topk(
    codes_df: DataFrame,
    codebooks: list[list[list[float]]],
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank_with: DataFrame | None = None,
    shortlist: int | None = None,
) -> DataFrame:
    """Approximate top-k by ADC inner product over PQ codes:
    (query_id, neighbor_id, score, rank).

    Driver builds each query's flattened m×K LUT of exact
    sub-dot-products (kilobytes per query); scoring is m static
    `element_at` lookups + adds per corpus row — whole-stage codegen,
    the corpus never decompresses. On L2-normalized embeddings the ADC
    inner product approximates cosine.

    PQ quantization blurs fine-grained ranking (near-ties inside a
    tight cluster reorder); pass `rerank_with=corpus` for the standard
    two-stage design: ADC prunes the corpus to a `shortlist` (default
    4k) of candidates per query, then exact cosine reranks ONLY those —
    full-precision vectors are touched for shortlist·|Q| rows, never
    the whole corpus."""
    import numpy as np

    books = np.asarray(codebooks)  # (m, K, dsub)
    m, K, dsub = books.shape
    spark = codes_df.sparkSession
    q_rows = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>")
    ).collect()
    luts = []
    for r in q_rows:
        qv = np.asarray(r[1], dtype=np.float64).reshape(m, dsub)
        lut = np.einsum("jd,jkd->jk", qv, books).reshape(m * K)  # (m*K,)
        luts.append((r["query_id"], [float(x) for x in lut]))
    if not luts:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, score double, rank int"
        )
    lut_df = spark.createDataFrame(luts, ["query_id", "lut"])

    c = codes_df.select(F.col(id_col).alias("neighbor_id"), "codes")
    # score = Σ_j lut[j*K + codes[j]] — m static JVM expressions
    score = None
    for j in range(m):
        term = F.element_at(
            F.col("lut"),
            (F.lit(j * K) + F.element_at(F.col("codes"), j + 1).cast("int") + F.lit(1)),
        )
        score = term if score is None else score + term
    scored = (
        c.crossJoin(F.broadcast(lut_df))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.round(score, 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    if rerank_with is None:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "score", "rank")
        )
    from grasper_spark.functions.similarity import cosine

    cand = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= (shortlist or 4 * k))
        .select("query_id", "neighbor_id")
    )
    vecs = rerank_with.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    exact = (
        cand.join(vecs, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("score"),
        )
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def write_ivfpq_index(
    corpus: DataFrame,
    path: str,
    n_clusters: int = 16,
    m: int = 8,
    nbits: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> None:
    """Persist the IVF-PQ layout: PQ codes partitioned by IVF cluster
    (+ the shared versioned manifest holding centroids and codebooks,
    ann_index.py).

    The faiss IVF-PQ architecture as a parquet layout: a probe reads
    only its clusters' FILES (Spark partition pruning) and those files
    hold m-byte codes, not vectors — probed bytes shrink by
    (corpus/probed clusters) × (vector bytes/m)."""
    from grasper_spark.functions.ann_index import data_dir, write_manifest
    from grasper_spark.functions.similarity import ivf_index

    assigned, centroids = ivf_index(
        corpus, n_clusters, id_col=id_col, vec_col=vec_col, seed=seed
    )
    books = pq_train(
        corpus, m=m, nbits=nbits, dim=dim, id_col=id_col, vec_col=vec_col, seed=seed
    )
    codes = pq_encode(corpus, books, id_col=id_col, vec_col=vec_col)
    coded = assigned.select(id_col, "cluster").join(codes, id_col)
    coded.write.mode("overwrite").partitionBy("cluster").parquet(
        data_dir(path, "ivfpq")
    )
    write_manifest(
        path, "ivfpq", centroids=centroids, codebooks=books,
        n_clusters=n_clusters, m=m, nbits=nbits, dim=dim, vec_col=vec_col,
    )


def ivfpq_topk(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank_with: DataFrame | None = None,
    shortlist: int | None = None,
) -> DataFrame:
    """Probe a persisted IVF-PQ index: per query, pick the `n_probe`
    closest centroids (driver-side numpy over the kilobyte centroid
    table), read ONLY the union of probed cluster partitions,
    ADC-score the codes, and optionally exact-rerank a shortlist.

    The cluster filter is an `isin` over the partition column, so the
    scan's PartitionFilters prune unprobed files (plan-asserted in
    tests)."""
    import numpy as np

    from grasper_spark.functions.ann_index import data_dir, read_manifest

    doc = read_manifest(path, expect_kind="ivfpq")
    centroids, books = doc["centroids"], doc["codebooks"]
    cents = np.asarray([v for _, v in centroids])
    cent_ids = [c for c, _ in centroids]
    q_rows = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>")
    ).collect()
    probed: set[int] = set()
    for r in q_rows:
        qv = np.asarray(r[1])
        sims = (cents @ qv) / (
            np.linalg.norm(cents, axis=1) * max(np.linalg.norm(qv), 1e-12) + 1e-12
        )
        for i in np.argsort(-sims)[:n_probe]:
            probed.add(cent_ids[int(i)])
    codes = spark.read.parquet(data_dir(path, "ivfpq")).filter(
        F.col("cluster").isin(sorted(probed))
    )
    return pq_topk(
        codes,
        books,
        queries,
        k=k,
        id_col=id_col,
        vec_col=vec_col,
        rerank_with=rerank_with,
        shortlist=shortlist,
    )


def ivfpq_append(
    spark,
    path: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Incrementally ingest vectors into a persisted IVF-PQ index:
    nearest stored centroid (broadcast argmax, same rule as
    `similarity.ivf_append`) + PQ-encode with the STORED codebooks, then
    append to the cluster-partitioned code relation. Codebooks and
    centroids drift only on an explicit re-train (`write_ivfpq_index`).
    Returns the new rows' (id, cluster, codes)."""
    from grasper_spark.functions.ann_index import data_dir, read_manifest
    from grasper_spark.functions.similarity import cosine

    # upgrade=True: a legacy (sidecar-only) index gets its manifest
    # written on this append, honoring the ann_index upgrade contract
    doc = read_manifest(path, expect_kind="ivfpq", upgrade=True)
    cent_df = spark.createDataFrame(doc["centroids"], ["cluster", "centroid"])
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
    coded = pq_encode(assigned, doc["codebooks"], id_col=id_col, vec_col=vec_col)
    out = assigned.select(id_col, "cluster").join(coded, id_col)
    out.write.mode("append").partitionBy("cluster").parquet(data_dir(path, "ivfpq"))
    return out


def ivfpq_append_stream(path: str, id_col: str = "vec_id", vec_col: str = "embedding"):
    """foreachBatch processor for STREAMING ingest into a persisted
    IVF-PQ index — the IVF-PQ twin of `similarity.ivf_append_stream`:
    each micro-batch assigns against the stored centroids, encodes with
    the stored codebooks, and appends its partitioned code parquet.
    Exactly-once per batch rides the streaming checkpoint."""

    def process(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ivfpq_append(batch_df.sparkSession, path, batch_df, id_col, vec_col)

    return process


def pq_reconstruct(
    codes_df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, embedding array<double>) — decode codes back to the nearest
    codeword concatenation (lossy). JVM-side: the codebooks ride in as
    one literal array and each subvector is a slice lookup."""
    books_flat = [
        float(x) for book in codebooks for c in book for x in c
    ]  # m*K*dsub flattened
    import numpy as np

    m, K, dsub = np.asarray(codebooks).shape
    lit = F.lit(books_flat)  # array<double> literal, kilobytes
    parts = []
    for j in range(m):
        start = (
            F.lit(j * K * dsub)
            + F.element_at(F.col("codes"), j + 1).cast("int") * F.lit(dsub)
            + F.lit(1)
        )
        parts.append(F.slice(lit, start, dsub))
    vec = F.concat(*parts)
    return codes_df.select(F.col(id_col), vec.alias("embedding"))
