"""Unit tests for the training-data-pipeline operators on constructed
fixtures (near-dups, known languages, tiny vectors) — behaviors the
synthetic tables can't exercise."""

import pytest
from pyspark.sql import functions as F

DOCS = [
    # two exact duplicates (after whitespace/case normalization)
    (1, "The quick  brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),
    # a near-duplicate (one word changed)
    (3, "the quick brown fox leaps over the lazy dog"),
    # unrelated
    (4, "completely different content about spark engines and parquet files"),
    # short doc
    (5, "tiny doc"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_exact_dedup_groups(docs):
    from grasper_spark.functions.dedup import exact_dedup

    got = {r["keep_id"]: r["dup_cnt"] for r in exact_dedup(docs).collect()}
    assert got[1] == 2  # docs 1+2 collapse
    assert got[3] == 1 and got[4] == 1 and got[5] == 1


def test_ngram_jaccard_finds_neardup(docs):
    from grasper_spark.functions.dedup import ngram_jaccard_pairs

    pairs = {(r.id_a, r.id_b): r.jaccard for r in
             ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0  # exact dup
    assert (1, 3) in pairs and 0.3 <= pairs[(1, 3)] < 1.0  # near dup
    assert not any({a, b} == {4, 5} for a, b in pairs)


def test_jaccard_join_key_is_hashed_long(docs):
    # the inverted-index self-join must shuffle 8-byte xxhash64 keys,
    # not trigram strings (~3x the bytes) — guard against a silent
    # revert in the persisted shingle relation
    from pyspark.sql.types import LongType

    from grasper_spark.functions.dedup import _SH_PERSISTED, ngram_jaccard_pairs

    ngram_jaccard_pairs(docs, threshold=0.3).collect()
    assert _SH_PERSISTED, "shingle relation should be persisted"
    sh_type = dict(_SH_PERSISTED[0][1].dtypes).get("sh")
    assert sh_type == "bigint", sh_type
    assert isinstance(_SH_PERSISTED[0][1].schema["sh"].dataType, LongType)


def test_containment_directions_consistent(docs):
    # both (a,b) and (b,a) rows come from ONE a<b join pass (explode);
    # common counts must agree with the symmetric definition
    from grasper_spark.functions.dedup import containment_pairs

    rows = {(r.id_a, r.id_b): r.containment
            for r in containment_pairs(docs, threshold=0.0).collect()}
    assert (1, 2) in rows and (2, 1) in rows
    assert rows[(1, 2)] == rows[(2, 1)] == 1.0  # exact dups contain fully


def test_minhash_lsh_finds_neardup(docs):
    from grasper_spark.functions.dedup import minhash_lsh_pairs

    pairs = {(r.id_a, r.id_b) for r in
             minhash_lsh_pairs(docs, threshold=0.3).collect()}
    assert (1, 2) in pairs  # identical sigs always share bands
    # (1,3) may or may not collide in a band — LSH is approximate;
    # but if present it must have passed the jaccard verify
    assert all(a < b for a, b in pairs)


def test_minhash_identical_docs_identical_sigs(docs):
    from grasper_spark.functions.dedup import minhash_signature

    sigs = {r["doc_id"]: r["sig"] for r in minhash_signature(docs).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[4]


def test_simhash_hamming(docs):
    from grasper_spark.functions.dedup import simhash

    h = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert h[1] == h[2]  # identical token sets

    def hamming(a, b):
        return bin(a ^ b).count("1")

    assert hamming(h[1], h[3]) < hamming(h[1], h[4])  # near-dup closer


def test_cosine_topk_exact(spark):
    from grasper_spark.functions.similarity import cosine_topk

    vecs = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [1.0, 0.01]),   # nearly parallel to 0
            (2, [0.0, 1.0]),    # orthogonal to 0
            (3, [-1.0, 0.0]),   # opposite
        ],
        "vec_id long, embedding array<double>",
    )
    got = cosine_topk(vecs, vecs.filter(F.col("vec_id") == 0), k=3).collect()
    order = [r.neighbor_id for r in sorted(got, key=lambda r: r.rank)]
    assert order == [1, 2, 3]
    sims = {r.neighbor_id: r.sim for r in got}
    assert sims[1] > 0.99 and abs(sims[2]) < 1e-9 and sims[3] == -1.0


def test_lsh_topk_bucket_recall(spark):
    from grasper_spark.functions.similarity import lsh_topk

    # clustered vectors: same-direction vectors share sign buckets
    rows = [(i, [1.0 + 0.01 * i] + [0.1] * 63) for i in range(5)]
    rows += [(10 + i, [-1.0 - 0.01 * i] + [-0.1] * 63) for i in range(5)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = lsh_topk(vecs, vecs.filter(F.col("vec_id") == 0), k=4, dim=64)
    neighbors = {r.neighbor_id for r in got.collect()}
    assert neighbors == {1, 2, 3, 4}  # only the same-direction cluster


def test_lsh_neardup_matches_exact_on_candidates(spark):
    # LSH near-dup = subset of the exact all-pairs result (precision 1.0
    # vs threshold), and recall ≥ 50% on clustered data; plan has no
    # cartesian product (the scale fix for cosine_neardup_pairs)
    from grasper_spark.functions.similarity import (
        cosine_neardup_pairs,
        lsh_neardup_pairs,
    )

    rows = [(i, [1.0 + 0.02 * i] + [0.1 * (i % 3)] * 63) for i in range(8)]
    rows += [(100 + i, [-1.0 - 0.02 * i] + [-0.1 * (i % 3)] * 63) for i in range(8)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {(r.id_a, r.id_b): r.sim
             for r in cosine_neardup_pairs(vecs, threshold=0.9).collect()}
    approx = {(r.id_a, r.id_b): r.sim
              for r in lsh_neardup_pairs(vecs, threshold=0.9, dim=64).collect()}
    assert set(approx) <= set(exact)
    assert len(approx) >= 0.5 * len(exact) > 0
    for k, v in approx.items():
        assert v == exact[k]
    plan = lsh_neardup_pairs(vecs, threshold=0.9, dim=64)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_semantic_dedup_min_id_survivor(spark):
    # SemDeDup greedy rule: within a near-identical group, the smallest
    # id keeps; every other member is marked drop with its best-neighbor
    # sim. Distant vectors keep. Same verdicts via LSH buckets and via
    # an IVF cluster assignment.
    from grasper_spark.functions.similarity import ivf_index, semantic_dedup

    rows = [(i, [1.0 + 0.001 * i] + [0.1] * 63) for i in range(4)]  # one group
    rows += [(50, [-1.0] + [-0.1] * 63)]                            # loner
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    got = {r.vec_id: (r.keep, r.nn_sim)
           for r in semantic_dedup(vecs, threshold=0.99, dim=64).collect()}
    assert got[0][0] is True and got[50][0] is True and got[50][1] is None
    for i in (1, 2, 3):
        assert got[i][0] is False and got[i][1] >= 0.99

    assigned, _ = ivf_index(vecs, n_clusters=2)
    via_ivf = {r.vec_id: r.keep
               for r in semantic_dedup(vecs, threshold=0.99,
                                       assigned=assigned).collect()}
    assert via_ivf == {k: v[0] for k, v in got.items()}
    # scale shape: no cartesian/nested-loop join in either path
    for df in (semantic_dedup(vecs, threshold=0.99, dim=64),
               semantic_dedup(vecs, threshold=0.99, assigned=assigned)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan


def test_lang_id_stopword_votes(spark):
    from grasper_spark.functions.text import lang_id

    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house"),
            (2, "der hund und die katze ist das"),
            (3, "el perro de la casa que los gatos"),
            (4, "le chien et les chats des maisons"),
            (5, "xyzzy plugh quux"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["pred"] for r in
           df.select("doc_id", lang_id(F.col("text")).alias("pred")).collect()}
    assert got == {1: "en", 2: "de", 3: "es", 4: "fr", 5: "unknown"}


def test_quality_score_ranges(docs):
    from grasper_spark.functions.text import quality_score

    rows = docs.select(quality_score(F.col("text")).alias("q")).collect()
    assert all(0.0 <= r.q <= 1.0 for r in rows)


def test_rolling_fingerprints(docs):
    from grasper_spark.functions.text import rolling_fingerprints

    got = docs.filter(F.col("doc_id").isin(1, 2)).select(
        rolling_fingerprints(F.col("text"), window=4).alias("fps")
    ).collect()
    assert got[0].fps == got[1].fps  # normalization-invariant
    assert len(got[0].fps) >= 2


def test_multimodal_feature_extraction(spark):
    from grasper_spark.functions.multimodal import (
        documents_as_media,
        extract_features,
        frame_sample,
    )

    docs = spark.createDataFrame([(1, "abc"), (2, "")], ["doc_id", "text"])
    media = documents_as_media(docs)
    feats = {r.media_id: r for r in extract_features(media).collect()}
    assert feats[1].n_bytes == 3
    assert feats[1].byte_sum == ord("a") + ord("b") + ord("c")
    assert feats[1].first_byte == ord("a")
    assert feats[2].n_bytes == 0 and feats[2].first_byte == -1

    vids = media.withColumn(
        "meta",
        F.struct(
            F.col("meta.width"), F.col("meta.height"),
            F.lit(3500).alias("duration_ms"), F.col("meta.codec"),
        ),
    )
    frames = frame_sample(vids, every_ms=1000)
    assert frames.filter(F.col("media_id") == 1).count() == 4  # 0,1000,2000,3000


def test_streaming_windowed_equals_batch(spark):
    from grasper_spark.streaming import (
        read_events_stream,
        windowed_counts,
        windowed_counts_batch,
    )

    sf = "/root/testdata/sf0.001"
    q = (
        windowed_counts(read_events_stream(spark, sf))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_test")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(tuple(r) for r in spark.sql("select * from win_test").collect())
    want = sorted(tuple(r) for r in windowed_counts_batch(spark, sf).collect())
    assert got == want and len(got) > 0


def test_ivf_topk_recall(spark):
    from grasper_spark.functions.similarity import cosine_topk, ivf_index, ivf_topk
    from pyspark.sql import functions as F
    import math

    # 4 well-separated clusters in 8-d
    rows = []
    for c in range(4):
        base = [0.0] * 8
        base[c * 2] = 1.0
        for i in range(25):
            v = list(base)
            v[(c * 2 + 1)] = 0.01 * i
            rows.append((c * 100 + i, v))
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assigned, cents = ivf_index(vecs, n_clusters=4)
    queries = vecs.filter(F.col("vec_id").isin(0, 100, 200, 300))
    approx = ivf_topk(assigned, cents, queries, k=5, n_probe=1)
    exact = cosine_topk(vecs, queries, k=5)
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    recall = len(a & e) / len(e)
    assert recall >= 0.9, f"IVF recall too low: {recall}"


def test_curation_with_neardup_removal(spark):
    from grasper_spark.functions.curation import curate

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog and runs to the house of cards again"),
            (2, "the quick brown fox jumps over the lazy dog and runs to the house of cards again"),  # exact dup
            (3, "the quick brown fox jumps over the lazy dog and runs to the house of bricks again"),  # near dup
            (4, "der hund und die katze ist das"),  # german (passes languages filter)
            (5, "xy zz qq"),  # unknown lang -> dropped
        ],
        ["doc_id", "text"],
    )
    kept = {r.doc_id for r in curate(docs, min_quality=0.0, languages=("en", "de"),
                                     near_dup_threshold=0.5).collect()}
    assert 1 in kept          # representative of the dup group
    assert 2 not in kept      # exact dup removed
    assert 3 not in kept      # near dup removed (jaccard vs doc 1 >= 0.5)
    assert 4 in kept and 5 not in kept


def test_hash_split_deterministic(spark):
    from grasper_spark.functions.sampling import hash_split

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: r.split for r in hash_split(df).collect()}
    b = {r.doc_id: r.split for r in hash_split(df).collect()}
    assert a == b  # fully deterministic
    from collections import Counter

    c = Counter(a.values())
    assert 0.85 < c["train"] / 2000 < 0.95
    assert c["val"] > 0 and c["test"] > 0
    assert set(c) == {"train", "val", "test"}


def test_stratified_sample(spark):
    from grasper_spark.functions.sampling import stratified_sample

    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "de") for i in range(400)], ["doc_id", "lang"]
    )
    out = stratified_sample(df, "lang", {"en": 0.5, "de": 0.1}, seed=7)
    counts = {r["lang"]: r["cnt"] for r in
              out.groupBy("lang").agg(__import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("cnt")).collect()}
    assert counts.get("en", 0) > counts.get("de", 0)


def test_as_of_join_semantics(spark):
    from grasper_spark.functions.asof import as_of_join

    left = spark.createDataFrame(
        [(1, 1, 10), (2, 1, 25), (3, 2, 10)], ["event_id", "k", "t"]
    )
    right = spark.createDataFrame(
        [(1, 5, 100.0), (1, 20, 200.0), (1, 25, 250.0), (2, 50, 999.0)],
        ["k", "t", "v"],
    )
    got = {r.event_id: r.asof_v for r in
           as_of_join(left, right, key="k", ts="t", value_cols=["v"]).collect()}
    assert got[1] == 100.0   # latest right at t<=10 is t=5
    assert got[2] == 250.0   # inclusive: right at t=25 counts
    assert got[3] is None    # no right row at or before t=10 for k=2


# ---------- Gopher repetition / PII / chunking ----------


@pytest.fixture(scope="module")
def rep_docs(spark):
    rows = [
        (1, "a b a b a b a b"),  # top bigram 'a b': 4 of 7
        (2, "x\ny\nx\nz\n\n"),  # duplicate line 'x'
        (3, "mail bob@x.co or 10.0.0.1 now +1 (555) 123-4567 ok"),
        (4, " ".join(f"w{i}" for i in range(150))),
        (5, ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_gopher_repetition_stats(rep_docs):
    from grasper_spark.functions.text import gopher_quality

    gq = {r["doc_id"]: r.asDict() for r in gopher_quality(rep_docs).collect()}
    assert gq[1]["top_bigram_frac"] == round(4 / 7, 6)
    assert gq[1]["pass"] is False  # repetition gate
    assert gq[2]["dup_line_frac"] == 0.25  # 1 of 4 non-blank lines dup
    assert gq[5]["dup_line_frac"] == 0.0 and gq[5]["top_bigram_frac"] == 0.0
    assert gq[5]["pass"] is False  # under min tokens
    assert gq[4]["pass"] is True


def test_redact_pii(rep_docs):
    from grasper_spark.functions.text import redact_pii

    pii = {r["doc_id"]: r.asDict() for r in redact_pii(rep_docs).collect()}
    assert pii[3]["n_email"] == 1 and pii[3]["n_ipv4"] == 1 and pii[3]["n_phone"] == 1
    assert pii[3]["clean_text"] == "mail <EMAIL> or <IPV4> now +1 (555) 123-4567 ok".replace(
        "+1 (555) 123-4567", "<PHONE>"
    )
    assert pii[1]["n_email"] == 0 and "<" not in pii[1]["clean_text"]


def test_chunk_documents(rep_docs):
    from grasper_spark.functions.text import chunk_documents

    ch = chunk_documents(rep_docs, window=64, stride=48).collect()
    by4 = sorted((r["chunk_id"], r["n_chunk_tokens"]) for r in ch if r["doc_id"] == 4)
    # 150 tokens -> starts 0,48,96,144
    assert by4 == [(0, 64), (1, 64), (2, 54), (3, 6)]
    # overlap: chunk1 starts at token 48 (w48), chunk0 ends at w63
    c = {r["chunk_id"]: r["chunk"] for r in ch if r["doc_id"] == 4}
    assert c[1].split()[0] == "w48" and c[0].split()[-1] == "w63"
    assert not [r for r in ch if r["doc_id"] == 5]


def test_chunk_documents_no_shuffle(rep_docs):
    # chunking must be a pure per-row explode: no exchange in the plan
    from grasper_spark.functions.text import chunk_documents

    plan = (
        chunk_documents(rep_docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_contamination_report_and_decontaminate(spark):
    from grasper_spark.functions.contamination import (
        contamination_report,
        decontaminate,
    )

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated text about spark and parquet"),
            (3, "we evaluate on the secret benchmark question here today"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "the secret benchmark question appears verbatim")],
        ["doc_id", "text"],
    )
    rep = {
        r["doc_id"]: r["bench_ngrams"]
        for r in contamination_report(train, bench, n=3).collect()
    }
    # doc 3 shares "the secret benchmark" + "secret benchmark question"
    assert rep == {3: 2}
    clean = decontaminate(train, bench, n=3)
    assert sorted(r["doc_id"] for r in clean.collect()) == [1, 2]


def test_topk_ngrams_counts_and_tiebreak(docs):
    from grasper_spark.functions.text import topk_ngrams

    top = topk_ngrams(docs, n=2, k=3).collect()
    # "the lazy" and "lazy dog" occur in docs 1,2,3; quick brown in 1,2,3 too
    assert top[0]["cnt"] == 3
    # deterministic tie-break: count desc then ngram asc
    got = [(r["ngram"], r["cnt"]) for r in top]
    assert got == sorted(got, key=lambda t: (-t[1], t[0]))


def test_export_shards_deterministic_and_contiguous(docs):
    from grasper_spark.functions.sampling import export_shards

    a = sorted(map(tuple, export_shards(docs, num_shards=2).select(
        "doc_id", "shard", "pos").collect()))
    b = sorted(map(tuple, export_shards(docs, num_shards=2).select(
        "doc_id", "shard", "pos").collect()))
    assert a == b  # stable across runs
    by_shard = {}
    for _, shard, pos in a:
        by_shard.setdefault(shard, []).append(pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))  # contiguous 1..n


def test_training_shard_roundtrip(docs, tmp_path):
    from pyspark.sql import SparkSession

    from grasper_spark.functions.sampling import (
        export_shards,
        read_training_shards,
        write_training_shards,
    )

    out = str(tmp_path / "shards")
    write_training_shards(docs, out, num_shards=2)
    spark = SparkSession.getActiveSession()
    back = read_training_shards(spark, out)
    want = sorted(
        map(tuple, export_shards(docs, num_shards=2)
            .select("doc_id", "shard", "pos").collect())
    )
    got = sorted(map(tuple, back.select("doc_id", "shard", "pos").collect()))
    assert got == want
    # partitionBy produced one directory per shard
    import os
    assert sorted(d for d in os.listdir(out) if d.startswith("shard=")) == [
        "shard=0", "shard=1"
    ]


def test_dedup_clusters_transitive(spark):
    from grasper_spark.functions.dedup import dedup_clusters

    # chain X~Y~Z where j(X,Y)=j(Y,Z)=0.8 but j(X,Z)=0.636 < threshold:
    # only the two adjacent pairs exist, so Z reaches X's cluster ONLY
    # via transitive closure; unrelated + short docs stay singletons
    X = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    Y = "alpha beta gamma delta epsilon zeta eta theta iota OMEGA"
    Z = "SIGMA beta gamma delta epsilon zeta eta theta iota OMEGA"
    chain = spark.createDataFrame(
        [(10, X), (11, Y), (12, Z),
         (20, "unrelated text about distributed query engines entirely"),
         (30, "short")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: (r.cluster_id, r.is_canonical)
           for r in dedup_clusters(
               chain, threshold=0.7, shingle_n=2, bands=16).collect()}
    assert out[10] == (10, True)
    assert out[11] == (10, False)
    assert out[12] == (10, False)  # rides the chain via 11 (no 10~12 pair)
    assert out[20] == (20, True)
    assert out[30] == (30, True)
    canon = [d for d, (c, k) in out.items() if k]
    assert sorted(canon) == [10, 20, 30]


def test_line_dedup_strips_cross_doc_boilerplate(spark):
    from grasper_spark.functions.dedup import line_dedup

    # "Subscribe now" appears in 3 docs -> dropped everywhere; blank
    # lines and unique lines survive in original order; doc 4 is all
    # boilerplate -> empty text but still present in the output
    docs = spark.createDataFrame(
        [
            (1, "unique first line\nSubscribe now\nunique last line"),
            (2, "another body\n\nsubscribe now"),
            (3, "SUBSCRIBE NOW  \nreal content here"),
            (4, "Subscribe now"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in line_dedup(docs, max_df=2).collect()}
    assert out[1].text == "unique first line\nunique last line"
    assert (out[1].n_lines, out[1].n_kept) == (3, 2)
    assert out[2].text == "another body\n"  # blank line kept verbatim
    assert (out[2].n_lines, out[2].n_kept) == (3, 2)
    assert out[3].text == "real content here"  # case/trim-insensitive hot match
    assert out[4].text == ""
    assert (out[4].n_lines, out[4].n_kept) == (1, 0)


def test_line_dedup_below_threshold_keeps_everything(spark):
    from grasper_spark.functions.dedup import line_dedup

    docs = spark.createDataFrame(
        [(1, "shared line\nown line"), (2, "different body")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in line_dedup(docs, max_df=2).collect()}
    assert out[1].text == "shared line\nown line"
    assert out[2].n_kept == 1


def test_quota_sample_deterministic_and_balanced(spark):
    from grasper_spark.functions.sampling import quota_sample

    docs = spark.createDataFrame(
        [(i, "en" if i % 3 else "de") for i in range(60)],
        ["doc_id", "lang"],
    )
    a = {(r.doc_id, r.lang) for r in quota_sample(docs, "lang", 10).collect()}
    b = {(r.doc_id, r.lang) for r in
         quota_sample(docs.repartition(7), "lang", 10).collect()}
    assert a == b  # partitioning-independent (md5 rank, not RNG)
    by_lang = {}
    for d, l in a:
        by_lang.setdefault(l, set()).add(d)
    assert len(by_lang["en"]) == 10 and len(by_lang["de"]) == 10
    # quota larger than the group keeps the whole group
    full = quota_sample(docs, "lang", 1000).count()
    assert full == 60


def test_streaming_interval_join_equals_batch(spark):
    from grasper_spark.streaming.joins import interval_join_batch, interval_join_stream

    sf = "/root/testdata/sf0.001"
    q = (
        interval_join_stream(spark, sf)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ij_test")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(tuple(r) for r in spark.sql("select * from ij_test").collect())
    want = sorted(tuple(r) for r in interval_join_batch(spark, sf).collect())
    assert got == want and len(got) > 0


def test_streaming_interval_join_outer_emits_unmatched_after_watermark(spark, tmp_path):
    import datetime

    from grasper_spark.streaming.joins import interval_join_outer

    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    hours = datetime.timedelta(hours=1)
    # click 1: converted (purchase 10 min later). click 2: never
    # converted, and OLD enough that the watermark (driven by the late
    # clock events at t0+9h) proves no purchase can still arrive.
    # click 3: unmatched but at the stream tail — the watermark never
    # passes its deadline, so streaming withholds it (by design).
    clicks = [
        (1, t0, 100, "click", 0.0, ""),
        (2, t0 + hours, 100, "click", 0.0, ""),
        (3, t0 + 9 * hours, 200, "click", 0.0, ""),
    ]
    purchases = [
        (10, t0 + datetime.timedelta(minutes=10), 100, "purchase", 42.5, ""),
        # clock advancers on both streams (watermark = max ts - delay)
        (11, t0 + 9 * hours, 999, "purchase", 1.0, ""),
    ]
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    cdir, pdir = str(tmp_path / "clicks"), str(tmp_path / "purch")
    spark.createDataFrame(clicks, schema).write.parquet(cdir)
    spark.createDataFrame(purchases, schema).write.parquet(pdir)
    q = (
        interval_join_outer(
            spark.readStream.schema(schema).parquet(cdir),
            spark.readStream.schema(schema).parquet(pdir),
            max_delay="30 minutes",
            watermark="1 hour",
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ij_outer")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = {r["click_id"]: r for r in spark.sql("select * from ij_outer").collect()}
    assert rows[1]["purchase_value"] == 42.5          # matched pair
    assert rows[2]["purchase_ts"] is None             # unmatched, emitted
    assert rows[2]["purchase_value"] is None
    # the batch twin (same function on static inputs) also returns the
    # tail click streaming must withhold
    batch = interval_join_outer(
        spark.read.parquet(cdir), spark.read.parquet(pdir), "30 minutes"
    )
    b = {r["click_id"]: r for r in batch.collect()}
    assert set(b) == {1, 2, 3} and b[3]["purchase_ts"] is None
    assert set(rows) <= set(b)


def test_group_centroids_matches_duckdb(spark):
    import duckdb

    from grasper_spark.functions.similarity import group_centroids

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").withColumn(
        "grp", F.col("vec_id") % 4
    )
    got = {
        r.grp: (r.n, list(r.centroid))
        for r in group_centroids(emb, "grp").collect()
    }
    con = duckdb.connect()
    want_rows = con.execute(f"""
        WITH e AS (SELECT vec_id % 4 AS grp, embedding
                   FROM read_parquet('{sf}/embeddings.parquet')),
        ex AS (SELECT grp, i, embedding[i] AS v FROM e,
               unnest(generate_series(1, len(embedding))) AS u(i)),
        m AS (SELECT grp, i, round(sum(v::DOUBLE) / count(*), 6) AS c
              FROM ex GROUP BY 1, 2)
        SELECT grp, array_agg(c ORDER BY i) AS centroid,
               (SELECT count(*) FROM e e2 WHERE e2.grp = m.grp) AS n
        FROM m GROUP BY grp
    """).fetchall()
    want = {g: (n, list(c)) for g, c, n in want_rows}
    assert set(got) == set(want)
    for g in got:
        assert got[g][0] == want[g][0]
        assert got[g][1] == pytest.approx(want[g][1], abs=2e-6)


def test_unigram_lm_score_ranks_outliers(spark):
    from grasper_spark.functions.text import unigram_lm_score

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat sat on the mat again"),
            (3, "zxqv wvut qqzz xyzzy plugh"),  # all-rare tokens
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in unigram_lm_score(docs).collect()}
    assert 4 not in out  # empty doc dropped
    assert out[3].lm_score < out[1].lm_score  # gibberish scores lowest
    assert out[1].n_tokens == 6


def test_streaming_session_window_equals_batch(spark):
    from grasper_spark.streaming.windows import session_rows_batch, session_rows_stream

    sf = "/root/testdata/sf0.001"
    q = (
        session_rows_stream(spark, sf)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_test")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(tuple(r) for r in spark.sql("select * from sess_test").collect())
    want = sorted(tuple(r) for r in session_rows_batch(spark, sf).collect())
    # append mode only emits sessions CLOSED before the final watermark
    # (max ts - 2h): the streaming result is the batch result minus the
    # un-closable tail — assert exactly that, not blanket equality
    assert set(got) <= set(want) and len(got) > 0
    import datetime
    max_start = max(datetime.datetime.strptime(w[1], "%Y-%m-%d %H:%M:%S")
                    for w in want)
    horizon = max_start - datetime.timedelta(hours=3)
    must_emit = [w for w in want
                 if datetime.datetime.strptime(w[1], "%Y-%m-%d %H:%M:%S") < horizon]
    assert set(must_emit) <= set(got)


def test_session_rows_agree_with_sessionize_rollup(spark):
    # per-session rows rolled up per user must equal sessionize_batch's
    # (n_sessions, max_session_events) — two formulations, one semantics
    from grasper_spark.streaming.windows import sessionize_batch, session_rows_batch

    sf = "/root/testdata/sf0.001"
    rolled = {
        (r.user_id, r.n_sessions, r.max_session_events)
        for r in sessionize_batch(spark, sf).collect()
    }
    per_session = session_rows_batch(spark, sf).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
    )
    got = {(r.user_id, r.n_sessions, r.max_session_events)
           for r in per_session.collect()}
    assert got == rolled


def test_dedup_against_corpus(spark):
    from grasper_spark.functions.dedup import dedup_against

    corpus = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog"),
            (101, "an entirely different document about query engines"),
        ],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [
            (1, "THE QUICK  brown fox jumps over the lazy dog"),  # exact (normalized)
            (2, "the quick brown fox leaps over the lazy dog"),   # near-dup of 100
            (3, "completely novel text with no corpus overlap at all"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in
           dedup_against(corpus, batch, threshold=0.3,
                         bands=16, shingle_n=2).collect()}
    assert out[1].is_new is False and out[1].dup_of == 100 and out[1].jaccard == 1.0
    assert out[2].is_new is False and out[2].dup_of == 100 and 0.3 <= out[2].jaccard < 1.0
    assert out[3].is_new is True and out[3].dup_of is None


@pytest.mark.slow  # recall sweep; lsh_neardup_matches_exact_on_candidates keeps the cover
def test_lsh_multi_probe_recall_improves(spark):
    from grasper_spark.functions.similarity import cosine_topk, lsh_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") < 8)
    exact = {(r.query_id, r.neighbor_id)
             for r in cosine_topk(emb, qs, k=5).collect()}

    def recall(df):
        got = {(r.query_id, r.neighbor_id) for r in df.collect()}
        return len(got & exact) / len(exact)

    r1 = recall(lsh_topk(emb, qs, k=5, num_planes=8))
    r2 = recall(lsh_topk(emb, qs, k=5, num_planes=8, multi_probe=True))
    # probing 1-bit neighbors never loses candidates; on the random
    # (near-orthogonal) synthetic vectors absolute recall is inherently
    # modest, so assert the monotone improvement plus a floor
    assert r2 >= r1 >= 0.0 and r2 >= 0.1

    # on genuinely clustered vectors the flip recovers boundary misses:
    # multi-probe recall is total
    rows = [(i, [1.0 + 0.01 * i] + [0.1] * 63) for i in range(6)]
    rows += [(10 + i, [-1.0 - 0.01 * i] + [-0.1] * 63) for i in range(6)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q0 = vecs.filter(F.col("vec_id") == 0)
    exact_c = {(r.query_id, r.neighbor_id)
               for r in cosine_topk(vecs, q0, k=5).collect()}
    got_c = {(r.query_id, r.neighbor_id)
             for r in lsh_topk(vecs, q0, k=5, dim=64, multi_probe=True).collect()}
    assert exact_c <= got_c | exact_c and len(got_c & exact_c) == len(exact_c)


def test_resample_gap_fill(spark):
    import duckdb

    from grasper_spark.streaming.windows import load_events, resample

    sf = "/root/testdata/sf0.001"
    got = sorted(
        tuple(r) for r in resample(load_events(spark, sf), "1 day").collect()
    )
    # DuckDB twin: calendar from generate_series over the day-bucket span
    want = sorted(tuple(r) for r in duckdb.sql(f"""
        WITH e AS (
          SELECT (epoch(ts)::BIGINT // 86400) * 86400 AS bk, value
          FROM read_parquet('{sf}/events.parquet')
        ), agg AS (
          SELECT bk, count(*) AS n, round(sum(value), 4) AS s FROM e GROUP BY bk
        ), cal AS (
          SELECT unnest(generate_series((SELECT min(bk) FROM e),
                                        (SELECT max(bk) FROM e), 86400)) AS bk
        )
        SELECT strftime(to_timestamp(cal.bk), '%Y-%m-%d %H:%M:%S'),
               coalesce(n, 0), coalesce(s, 0.0)
        FROM cal LEFT JOIN agg ON agg.bk = cal.bk
    """).fetchall())
    assert got == want and len(got) >= 28  # a month of daily buckets
    # no gaps: consecutive buckets are exactly 86400s apart
    import datetime
    ts = [datetime.datetime.strptime(g[0], "%Y-%m-%d %H:%M:%S") for g in got]
    assert all((b - a).total_seconds() == 86400 for a, b in zip(ts, ts[1:]))


def test_shard_manifest_roundtrip_and_tamper(spark, tmp_path):
    import json

    from grasper_spark.functions.sampling import (
        verify_shard_manifest,
        write_shard_manifest,
        write_training_shards,
    )

    docs = spark.createDataFrame(
        [(i, f"doc number {i}") for i in range(40)], ["doc_id", "text"]
    )
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, num_shards=4)
    m = write_shard_manifest(spark, out)
    assert m["total_rows"] == 40 and m["num_shards"] == 4
    assert verify_shard_manifest(spark, out)
    # tamper: claim a different checksum for one shard
    with open(f"{out}/_MANIFEST.json") as fh:
        doc = json.load(fh)
    k = next(iter(doc["shards"]))
    doc["shards"][k]["checksum"] = "0"
    with open(f"{out}/_MANIFEST.json", "w") as fh:
        json.dump(doc, fh)
    assert not verify_shard_manifest(spark, out)


def test_range_join_matches_naive_and_avoids_nested_loop(spark):
    from grasper_spark.functions.asof import range_join

    facts = spark.createDataFrame(
        [(i, float(i)) for i in range(0, 100)], "fid long, v double"
    )
    ranges = spark.createDataFrame(
        [("a", 0.0, 9.0), ("b", 5.0, 30.0), ("c", 95.5, 99.5), ("d", 200.0, 300.0)],
        "rid string, lo double, hi double",
    )
    got = {(r.fid, r.rid) for r in
           range_join(facts, ranges, "v", "lo", "hi", bin_size=8.0).collect()}
    want = {(f, rr) for f in range(100) for rr, lo, hi in
            [("a", 0, 9), ("b", 5, 30), ("c", 95.5, 99.5), ("d", 200, 300)]
            if lo <= f <= hi}
    assert got == want and ("d" not in {r for _, r in got})
    plan = (range_join(facts, ranges, "v", "lo", "hi", 8.0)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan


def test_time_rollup_matches_duckdb(spark):
    import duckdb

    from grasper_spark.streaming.windows import load_events, time_rollup

    sf = "/root/testdata/sf0.001"
    got = sorted(tuple(r) for r in time_rollup(load_events(spark, sf)).collect())
    want = sorted(tuple(r) for r in duckdb.sql(f"""
        SELECT coalesce(strftime(date_trunc('day', ts), '%Y-%m-%d'), 'ALL') AS day,
               coalesce(printf('%02d', hour(ts)), 'ALL') AS hour,
               count(*)::BIGINT, round(sum(value), 4)
        FROM read_parquet('{sf}/events.parquet')
        GROUP BY ROLLUP (date_trunc('day', ts), hour(ts))
    """).fetchall())
    assert got == want
    days = {g[0] for g in got}
    assert "ALL" in days and len(days) > 25  # grand total + a month of days


def test_containment_catches_partial_duplicate(spark):
    from grasper_spark.functions.dedup import containment_pairs, ngram_jaccard_pairs

    short = "the quick brown fox jumps over the lazy dog"
    long_ = ("breaking news and analysis follows here today " + short +
             " additional commentary continues with more unrelated filler text")
    docs = spark.createDataFrame(
        [(1, short), (2, long_), (3, "entirely different content")],
        ["doc_id", "text"],
    )
    cont = {(r.id_a, r.id_b): r.containment
            for r in containment_pairs(docs, threshold=0.8).collect()}
    assert (1, 2) in cont and cont[(1, 2)] >= 0.8  # short inside long
    assert (2, 1) not in cont  # long is NOT contained in short
    jac = {(r.id_a, r.id_b) for r in
           ngram_jaccard_pairs(docs, threshold=0.8).collect()}
    assert (1, 2) not in jac  # symmetric Jaccard misses exactly this


def test_simhash_pairs_bucketed_hamming(docs, spark):
    from grasper_spark.functions.dedup import simhash, simhash_pairs

    got = {(r.id_a, r.id_b): r.hamming
           for r in simhash_pairs(docs, max_hamming=3).collect()}
    assert (1, 2) in got and got[(1, 2)] == 0  # identical token sets
    # verify every reported hamming against the raw hashes
    h = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    for (a, b), d in got.items():
        assert bin(h[a] ^ h[b]).count("1") == d <= 3
    # plan: bucketed candidate join, never a cross join
    plan = (simhash_pairs(docs, max_hamming=3)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan

    with pytest.raises(ValueError):
        simhash_pairs(docs, bands=4, max_hamming=4)


def test_intra_doc_line_dedup_keeps_first_occurrence(spark):
    from grasper_spark.functions.dedup import intra_doc_line_dedup

    docs = spark.createDataFrame(
        [
            # repeated boilerplate line (case/space-insensitive), blank
            # lines preserved, order of survivors preserved
            (1, "subscribe now\nreal content\n  Subscribe Now  \n\nmore text\nsubscribe now"),
            (2, "unique one\nunique two"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in intra_doc_line_dedup(docs).collect()}
    assert out[1].text == "subscribe now\nreal content\n\nmore text"
    assert out[1].n_lines == 6 and out[1].n_kept == 4
    assert out[2].text == "unique one\nunique two"
    assert out[2].n_lines == out[2].n_kept == 2
    # zero shuffle: pure per-row array work
    plan = intra_doc_line_dedup(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_line_dedup_identity_when_threshold_uncrossed(spark):
    from grasper_spark.functions.dedup import line_dedup

    docs = spark.createDataFrame(
        [(i, f"alpha {i}\nbeta {i}\ngamma {i}") for i in range(10)],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in line_dedup(docs, max_df=999).collect()}
    for i in range(10):
        assert out[i].text == f"alpha {i}\nbeta {i}\ngamma {i}"
        assert out[i].n_lines == out[i].n_kept == 3


@pytest.mark.slow  # runs full_pipeline twice (determinism) + manifest; with_packing keeps the e2e cover
def test_full_pipeline_end_to_end(spark, tmp_path):
    from grasper_spark.functions.curation import full_pipeline
    from grasper_spark.functions.sampling import (
        verify_shard_manifest,
        write_shard_manifest,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 23 == 0)
    train = docs.filter(F.col("doc_id") % 23 != 0)
    out = str(tmp_path / "pipe_shards")
    sharded, stats = full_pipeline(train, benchmark=bench, out_path=out,
                                   num_shards=4)
    # monotone survivor funnel, nothing degenerate
    assert stats["input"] >= stats["gopher_pass"] >= stats["curated"] > 0
    assert stats["decontaminated"] <= stats["curated"]
    assert stats["chunks"] >= stats["decontaminated"]
    # deterministic: a second run produces identical shard assignment
    sharded2, stats2 = full_pipeline(train, benchmark=bench, num_shards=4)
    assert stats2 == {k: v for k, v in stats.items()}
    a = sorted(tuple(r) for r in sharded.select("doc_id", "shard", "pos").collect())
    b = sorted(tuple(r) for r in sharded2.select("doc_id", "shard", "pos").collect())
    assert a == b
    # the written shards carry a verifiable manifest
    write_shard_manifest(spark, out)
    assert verify_shard_manifest(spark, out)


def test_tfidf_top_terms_matches_duckdb(spark):
    import duckdb

    from grasper_spark.functions.text import tfidf_top_terms

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    got = sorted(tuple(r) for r in tfidf_top_terms(docs, k=3).collect())
    want = sorted(tuple(r) for r in duckdb.sql(rf"""
        WITH toks AS (
          SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
          FROM read_parquet('{sf}/documents.parquet') WHERE length(trim(text)) > 0
        ), tf AS (
          SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
        ), dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        nd AS (SELECT count(DISTINCT doc_id)::DOUBLE AS n FROM toks),
        scored AS (
          SELECT doc_id, term,
                 round(tf * ln((SELECT n FROM nd) / df), 6) AS tfidf
          FROM tf JOIN dfq USING (term)
        )
        SELECT doc_id, term, tfidf, rank FROM (
          SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
          FROM scored) t
        WHERE rank <= 3
    """).fetchall())
    assert got == want and len(got) == 3 * 500


def test_pmi_bigrams_matches_duckdb(spark):
    import duckdb

    from grasper_spark.functions.text import pmi_bigrams

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    got = sorted(tuple(r) for r in pmi_bigrams(docs, k=20).collect())
    want = sorted(tuple(r) for r in duckdb.sql(rf"""
        WITH toks AS (
          SELECT doc_id, i AS pos, t[i] AS tok
          FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
                FROM read_parquet('{sf}/documents.parquet')
                WHERE length(trim(text)) > 0),
               unnest(generate_series(1, len(t))) AS u(i)
        ), big AS (
          SELECT tok AS a,
                 lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS b
          FROM toks
        ), uni AS (SELECT tok AS t, count(*) AS c FROM toks GROUP BY 1),
        tot AS (SELECT count(*)::DOUBLE AS n FROM toks),
        bc AS (SELECT a, b, count(*) AS n FROM big WHERE b IS NOT NULL
               GROUP BY 1, 2 HAVING count(*) >= 2),
        scored AS (
          SELECT a || ' ' || b AS bigram, bc.n,
                 round(ln(bc.n * (SELECT n FROM tot) / (ua.c * ub.c)), 6) AS pmi
          FROM bc JOIN uni ua ON ua.t = a JOIN uni ub ON ub.t = b
        )
        SELECT bigram, n, pmi,
               row_number() OVER (ORDER BY pmi DESC, bigram) AS rank
        FROM scored ORDER BY pmi DESC, bigram LIMIT 20
    """).fetchall())
    assert got == want and len(got) == 20


def test_mix_sources_respects_budgets(spark):
    from grasper_spark.functions.sampling import mix_sources
    from grasper_spark.functions.text import token_count

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "lang", token_count(F.col("text")).alias("n_tokens")
    )
    weights = {"en": 0.7, "de": 0.3}
    total = 4000
    mixed = mix_sources(docs, weights, total)
    got = {
        r.lang: r.t
        for r in mixed.groupBy("lang").agg(F.sum("n_tokens").alias("t")).collect()
    }
    avail = {
        r.lang: r.t
        for r in docs.groupBy("lang").agg(F.sum("n_tokens").alias("t")).collect()
    }
    max_doc = docs.agg(F.max("n_tokens")).collect()[0][0]
    assert set(got) <= set(weights)  # unweighted sources dropped
    for s, w in weights.items():
        budget = int(total * w)
        assert got.get(s, 0) <= budget
        # surplus sources fill to within one doc of their budget
        if avail.get(s, 0) > budget:
            assert got[s] >= budget - max_doc


def test_mix_sources_deterministic(spark):
    from grasper_spark.functions.sampling import mix_sources
    from grasper_spark.functions.text import token_count

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "lang", token_count(F.col("text")).alias("n_tokens")
    )
    a = mix_sources(docs, {"en": 0.5, "fr": 0.5}, 3000)
    b = mix_sources(docs.repartition(7), {"en": 0.5, "fr": 0.5}, 3000)
    assert sorted(r.doc_id for r in a.collect()) == sorted(
        r.doc_id for r in b.collect()
    )


def test_char_shingle_jaccard_catches_unsegmented_neardups(spark):
    # CJK-style unsegmented text: word tokenization sees ONE token per
    # doc (word jaccard finds nothing), char 3-grams find the near-dup
    from grasper_spark.functions.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [
            (1, "深度学习模型训练数据去重流程"),
            (2, "深度学习模型训练语料去重流程"),
            (3, "完全不同的另一段文字内容示例"),
        ],
        "doc_id long, text string",
    )
    word = ngram_jaccard_pairs(docs, threshold=0.3)
    assert word.count() == 0
    char = ngram_jaccard_pairs(docs, threshold=0.3, shingle_n=3, unit="char")
    pairs = [(r.id_a, r.id_b) for r in char.collect()]
    assert pairs == [(1, 2)]


def test_char_and_word_units_agree_on_tokenized_text(spark):
    # sanity: unit switch doesn't change word-path results
    from grasper_spark.functions.dedup import ngram_jaccard_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = ngram_jaccard_pairs(docs, threshold=0.2)
    b = ngram_jaccard_pairs(docs, threshold=0.2, unit="word")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_mix_sources_matches_duckdb(spark):
    # DuckDB twin of the two-phase cut: cumulative token sum in md5-rank
    # order per source, keep docs whose cumulative END <= budget
    import duckdb

    from grasper_spark.functions.sampling import mix_sources
    from grasper_spark.functions.text import token_count

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "lang", token_count(F.col("text")).alias("n_tokens")
    )
    weights = {"en": 0.6, "de": 0.4}
    total = 5000
    got = sorted(r.doc_id for r in mix_sources(docs, weights, total).collect())
    con = duckdb.connect()
    budgets = {s: int(total * w / sum(weights.values())) for s, w in weights.items()}
    cases = " ".join(
        f"WHEN lang = '{s}' THEN {b}" for s, b in budgets.items()
    )
    want = sorted(
        r[0]
        for r in con.execute(f"""
        WITH d AS (
          SELECT doc_id, lang,
                 (CASE WHEN length(trim(text)) = 0 THEN 0
                       ELSE len(regexp_split_to_array(trim(text), '\\s+')) END) AS n,
                 md5(doc_id::VARCHAR) AS h,
                 ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 256 AS bk
          FROM read_parquet('{sf}/documents.parquet')
          WHERE lang IN ({", ".join(repr(s) for s in weights)})
        ), c AS (
          -- the two-phase cut ≡ one global cumsum in (bucket, h, id) order
          SELECT doc_id, lang,
                 sum(n) OVER (PARTITION BY lang ORDER BY bk, h, doc_id) AS cum
          FROM d
        )
        SELECT doc_id FROM c WHERE cum <= (CASE {cases} END)
        """).fetchall()
    )
    assert got == want


def test_common_neighbors_matches_duckdb(spark, modern):
    import duckdb

    from grasper_spark.algos import common_neighbors

    got = sorted(
        (r.a, r.b, r.n_common, r.jaccard)
        for r in common_neighbors(modern, min_common=1).collect()
    )
    edges = [(r.src, r.dst) for r in modern.edges.collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE e (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", edges)
    want = sorted(
        tuple(r)
        for r in con.execute("""
        WITH adj AS (
          SELECT DISTINCT src AS v, dst AS n FROM (
            SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e)
        ), deg AS (SELECT v, count(*) AS d FROM adj GROUP BY v),
        p AS (
          SELECT x.v AS a, y.v AS b, count(*) AS c
          FROM adj x JOIN adj y ON x.n = y.n AND x.v < y.v
          GROUP BY 1, 2
        )
        SELECT a, b, c, round(c / (da.d + db.d - c), 6)
        FROM p JOIN deg da ON da.v = a JOIN deg db ON db.v = b
        """).fetchall()
    )
    assert got == want


def test_full_pipeline_with_packing(spark, tmp_path):
    from grasper_spark.functions.curation import full_pipeline

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out, stats = full_pipeline(
        docs, pack_tokens=128, out_path=str(tmp_path / "packed")
    )
    assert stats["bins"] > 0 and stats["mean_fill"] > 0.5
    per_bin = (
        out.filter(~F.col("overflow"))
        .groupBy("shard", "bin")
        .agg(F.sum("n_chunk_tokens").alias("t"))
        .agg(F.max("t"))
        .collect()[0][0]
    )
    assert per_bin <= 128
    back = spark.read.parquet(str(tmp_path / "packed"))
    assert back.count() == out.count()


def test_pair_mass_estimate_matches_exact(spark):
    from grasper_spark.functions.dedup import _exploded_shingles, pair_mass_estimate

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    row = pair_mass_estimate(docs).collect()[0]
    sh = _exploded_shingles(docs, "text", "doc_id", 3)
    dfs = {r.sh: r.n for r in sh.groupBy("sh").agg(F.count(F.lit(1)).alias("n")).collect()}
    exact = sum(d * (d - 1) // 2 for d in dfs.values())
    assert row.pair_mass == exact
    assert row.max_df == max(dfs.values())
    # caps are monotone and bounded by the uncapped mass
    assert row.pair_mass_cap100 <= row.pair_mass_cap1000 <= row.pair_mass_cap10000 <= row.pair_mass


def test_importance_sample_deterministic_and_monotone(spark):
    from grasper_spark.functions.sampling import importance_sample
    from grasper_spark.functions.text import quality_score

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", quality_score(F.col("text")).alias("q")
    )
    a = importance_sample(docs, "q", floor=0.2)
    b = importance_sample(docs.repartition(5), "q", floor=0.2)
    assert sorted(r.doc_id for r in a.collect()) == sorted(r.doc_id for r in b.collect())
    # keep-rate for the top-quality half must exceed the bottom half
    med = docs.approxQuantile("q", [0.5], 0.01)[0]
    hi = docs.filter(F.col("q") >= med)
    lo = docs.filter(F.col("q") < med)
    hi_rate = importance_sample(hi, "q", floor=0.2).count() / max(hi.count(), 1)
    lo_rate = importance_sample(lo, "q", floor=0.2).count() / max(lo.count(), 1)
    assert hi_rate > lo_rate
