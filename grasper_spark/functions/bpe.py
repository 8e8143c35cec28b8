"""BPE tokenizer training on the corpus's own word frequencies
(Sennrich et al. 2016, arXiv:1508.07909) — the classic subword-vocab
construction step of a training-data pipeline, Spark-first.

Shape: classic BPE trains on the DISTINCT-WORD frequency table, not the
raw token stream — so after one corpus-sized explode+groupBy, every
merge round runs over the (much smaller) word vocabulary:

    round = 1 partial-aggregated pair-count groupBy over vocab rows
          + 1 TakeOrdered(k) for the best pair(s)
          + 1 zero-shuffle per-row array fold applying the merge

State on the driver is just the merge table (KBs). Lineage is truncated
with localCheckpoint every few rounds (same pattern as algos.py
supersteps). ``batch > 1`` applies several SYMBOL-DISJOINT top pairs per
round — the standard trick fast BPE trainers use to cut rounds ~k×;
disjointness makes the round's merges order-independent, so the result
is still a valid (near-identical) BPE vocab.

Encoding at corpus scale is a segmentation LOOKUP: every word the
trainer saw carries its final symbol split in the returned vocab table,
so ``bpe_token_count`` is one explode + one (AQE-broadcast) join —
out-of-vocabulary words fall back to character count (their exact
symbol count under the trained merges is ≥ that; documented bound).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from grasper_spark.functions.text import tokens

END = "▁"  # end-of-word sentinel symbol (never a corpus character)


def _word_counts(df: DataFrame, text_col: str) -> DataFrame:
    return (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _initial_symbols(word: F.Column) -> F.Column:
    # chars + trailing end-of-word symbol (the lookahead split emits a
    # trailing "" at end-of-string — drop it)
    return F.concat(
        F.array_remove(F.split(word, "(?!^)"), ""), F.array(F.lit(END))
    )


def _adjacent_pairs(sym: F.Column) -> F.Column:
    # zip sym[0..n-2] with sym[1..n-1]; slice handles the fully-merged
    # single-symbol case (n=1 → empty pair list) — NB sequence(1, 0)
    # would count DOWN, not produce an empty index list
    n = F.size(sym)
    return F.zip_with(
        F.slice(sym, 1, n - 1),
        F.slice(sym, 2, n - 1),
        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
    )


def _apply_merges(sym: F.Column, pairs: list[tuple[str, str]]) -> F.Column:
    """Left-to-right, non-overlapping application of symbol-disjoint
    merge pairs in one array fold (zero shuffle)."""
    merged = {(a, b): a + b for a, b in pairs}

    def step(acc, x):
        cond = F.lit(False)
        out = acc
        for (a, b), ab in merged.items():
            hit = (F.element_at(acc, -1) == F.lit(a)) & (x == F.lit(b))
            out = F.when(
                hit & ~cond,
                F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(ab))),
            ).otherwise(out)
            cond = cond | hit
        return F.when(F.size(acc) == 0, F.array(x)).otherwise(
            F.when(cond, out).otherwise(F.concat(acc, F.array(x)))
        )

    return F.aggregate(sym, F.array().cast("array<string>"), step)


def _free_local_checkpoint(df: DataFrame) -> None:
    """Best-effort release of the RDD behind a localCheckpoint frame.

    ``DataFrame.unpersist()`` cannot reach it — the checkpoint persists at
    the RDD level, outside the SQL cache manager — so a superseded
    checkpoint would otherwise occupy executor storage until the RDD is
    garbage-collected. Safe once a NEWER eager checkpoint has
    materialized (nothing recomputes through the old one)."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass  # internal API shape changed — fall back to GC-driven cleanup


def train_bpe(
    df: DataFrame,
    num_merges: int = 100,
    text_col: str = "text",
    min_pair_count: int = 2,
    batch: int = 1,
    checkpoint_every: int = 8,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``num_merges`` BPE merges; returns ``(merges, vocab)``.

    ``merges`` is the ordered merge table [(a, b), …] (ties break on
    count desc, then (a, b) lexicographic — deterministic across runs,
    partitionings, and cluster sizes). ``vocab`` is the final
    (word, cnt, sym) segmentation of every distinct corpus word — the
    lookup table ``bpe_token_count``/``bpe_segment`` join against.
    """
    spark = df.sparkSession
    vocab = (
        _word_counts(df, text_col)
        .withColumn("sym", _initial_symbols(F.col("word")))
        .persist()
    )
    vocab.count()
    merges: list[tuple[str, str]] = []
    rounds = 0
    prev_ckpt = None
    while len(merges) < num_merges:
        k = min(batch, num_merges - len(merges))
        top = (
            vocab.select(F.col("cnt"), F.explode(_adjacent_pairs(F.col("sym"))).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("n"))
            .filter(F.col("n") >= min_pair_count)
            .orderBy(F.col("n").desc(), F.col("a"), F.col("b"))
            # over-fetch so the disjointness filter can still fill k
            .limit(max(k * 4, 8))
            .collect()
        )
        if not top:
            break
        used: set[str] = set()
        picked: list[tuple[str, str]] = []
        for r in top:
            if len(picked) == k:
                break
            if r.a in used or r.b in used or (r.a + r.b) in used:
                continue
            picked.append((r.a, r.b))
            used.update((r.a, r.b, r.a + r.b))
        if not picked:
            break
        merges.extend(picked)
        old = vocab
        vocab = old.withColumn("sym", _apply_merges(F.col("sym"), picked)).persist()
        rounds += 1
        if rounds % checkpoint_every == 0:
            # keep a handle on the persisted pre-checkpoint frame so it can
            # be unpersisted once the eager checkpoint has materialized —
            # otherwise one cached copy leaks per checkpoint round.
            tmp = vocab
            vocab = tmp.localCheckpoint(eager=True)
            tmp.unpersist()
            if prev_ckpt is not None:
                _free_local_checkpoint(prev_ckpt)
            prev_ckpt = vocab
        else:
            vocab.count()
        old.unpersist()
    return merges, vocab.select("word", "cnt", "sym")


def save_merges(spark, merges: list[tuple[str, str]], path: str) -> None:
    spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)], "rank long, a string, b string"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_merges(spark, path: str) -> list[tuple[str, str]]:
    rows = spark.read.parquet(path).orderBy("rank").collect()
    return [(r.a, r.b) for r in rows]


def bpe_apply(
    words: DataFrame,
    merges: list[tuple[str, str]],
    word_col: str = "word",
    max_rounds: int | None = None,
) -> DataFrame:
    """Segment arbitrary (possibly unseen) words with a TRAINED merge
    table — the standard apply-BPE algorithm: repeatedly merge the
    LOWEST-RANK adjacent pair present in the word (at every position it
    occurs) until no listed pair remains.

    Scale shape, per round: adjacent pairs explode → broadcast join
    against the KB-sized merge table → min-rank per word → zero-shuffle
    fold applying that one pair. A word with s symbols needs < s rounds
    (each applied merge shrinks it), so rounds are bounded by the
    longest word, not the vocab or merge count. Input is a DISTINCT-word
    relation; join the result back to the corpus.

    Returns (word, sym array<string>).
    """
    spark = words.sparkSession
    rank_df = F.broadcast(
        spark.createDataFrame(
            [(a, b, i) for i, (a, b) in enumerate(merges)],
            "a string, b string, rank long",
        )
    )
    cur = (
        words.select(F.col(word_col).alias("word"))
        .distinct()
        .withColumn("sym", _initial_symbols(F.col("word")))
        .persist()
    )
    bound = max_rounds if max_rounds is not None else int(
        (cur.agg(F.max(F.size("sym"))).first()[0] or 1)
    )
    a, b = F.col("a"), F.col("b")
    prev_ckpt = None

    def step(acc, x):
        # merge THIS word's best pair (a per-row column) at every
        # position, left-to-right non-overlapping; a/b NULL (no
        # applicable pair) never matches, so finished words pass through
        hit = (F.element_at(acc, -1) == a) & (x == b)
        return F.when(F.size(acc) == 0, F.array(x)).otherwise(
            F.when(
                hit,
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.concat(a, b))
                ),
            ).otherwise(F.concat(acc, F.array(x)))
        )

    for rnd in range(bound):
        pairs = cur.select(
            "word", F.explode(_adjacent_pairs(F.col("sym"))).alias("p")
        ).select("word", "p.a", "p.b")
        best = (
            pairs.join(rank_df, ["a", "b"])
            .groupBy("word")
            .agg(F.min("rank").alias("rk"))
            .join(rank_df.withColumnRenamed("rank", "rk"), "rk")
            .select("word", "a", "b")
        )
        if best.isEmpty():
            break
        merged = cur.join(best, "word", "left").select(
            "word",
            F.aggregate(F.col("sym"), F.array().cast("array<string>"), step).alias(
                "sym"
            ),
        )
        old = cur
        cur = merged.persist()
        if (rnd + 1) % 8 == 0:
            tmp = cur
            cur = tmp.localCheckpoint(eager=True)
            tmp.unpersist()
            if prev_ckpt is not None:
                _free_local_checkpoint(prev_ckpt)
            prev_ckpt = cur
        else:
            cur.count()
        old.unpersist()
    return cur.select("word", "sym")


def bpe_segment(
    df: DataFrame, vocab: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-token segmentation via the trained vocab: (id, pos, word, sym).
    OOV words keep their character split (the untrained upper bound)."""
    toks = df.select(
        F.col(id_col),
        F.posexplode(tokens(F.lower(F.col(text_col)))).alias("pos", "word"),
    ).filter(F.length("word") > 0)
    seg = toks.join(vocab.select("word", "sym"), "word", "left")
    fallback = _initial_symbols(F.col("word"))
    return seg.select(
        id_col, "pos", "word", F.coalesce(F.col("sym"), fallback).alias("sym")
    )


def bpe_token_count(
    df: DataFrame, vocab: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_bpe_tokens) under the trained merges — the real token
    budget a subword tokenizer would charge for each document."""
    seg = bpe_segment(df, vocab, text_col, id_col)
    counts = seg.groupBy(id_col).agg(F.sum(F.size("sym")).alias("n_bpe_tokens"))
    ids = df.select(id_col)
    return ids.join(counts, id_col, "left").select(
        id_col, F.coalesce("n_bpe_tokens", F.lit(0)).alias("n_bpe_tokens")
    )
