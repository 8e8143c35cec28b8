"""BPE trainer vs a direct pure-Python reference implementation of
Sennrich et al.'s algorithm (same count-desc/(a,b)-lexicographic
tie-break), plus encode/lookup behavior and scale-shape checks."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from grasper_spark.functions.bpe import (
    END,
    bpe_segment,
    bpe_token_count,
    load_merges,
    save_merges,
    train_bpe,
)

# the BPE paper's running example, as documents
CORPUS = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3


def _ref_bpe(word_counts, num_merges, min_pair_count=2):
    vocab = {w: [*w, END] for w in word_counts}
    merges = []
    for _ in range(num_merges):
        pc = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += word_counts[w]
        cands = [(n, a, b) for (a, b), n in pc.items() if n >= min_pair_count]
        if not cands:
            break
        n, a, b = min(cands, key=lambda t: (-t[0], t[1], t[2]))
        merges.append((a, b))
        for w, syms in vocab.items():
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            vocab[w] = out
    return merges, vocab


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, w) for i, w in enumerate(CORPUS)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_trained_merges_match_reference_bpe(docs):
    merges, vocab = train_bpe(docs, num_merges=10)
    want_merges, want_vocab = _ref_bpe(Counter(CORPUS), 10)
    assert merges == want_merges
    got_vocab = {r.word: list(r.sym) for r in vocab.collect()}
    assert got_vocab == want_vocab


def test_batched_training_still_segments_validly(docs):
    # symbol-disjoint batching: same corpus, k pairs per round; the
    # segmentation must reconstruct every word exactly and compress
    # (fewer symbols than characters)
    merges, vocab = train_bpe(docs, num_merges=10, batch=4)
    assert len(merges) == 10
    for r in vocab.collect():
        assert "".join(r.sym) == r.word + END
        assert len(r.sym) < len(r.word) + 1
    # determinism
    merges2, _ = train_bpe(docs, num_merges=10, batch=4)
    assert merges2 == merges


def test_bpe_token_count_and_oov_fallback(spark, docs):
    _, vocab = train_bpe(docs, num_merges=10)
    test_docs = spark.createDataFrame(
        [(1, "newest newest"), (2, "zzz"), (3, ""), (4, "low zzz")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.n_bpe_tokens for r in bpe_token_count(test_docs, vocab).collect()}
    # newest fully merged by 10 merges on this corpus → few symbols
    ref_vocab = _ref_bpe(Counter(CORPUS), 10)[1]
    assert got[1] == 2 * len(ref_vocab["newest"])
    assert got[2] == 4  # OOV 'zzz' → chars + END
    assert got[3] == 0
    assert got[4] == len(ref_vocab["low"]) + 4


def _ref_apply(word, merges):
    rank = {p: i for i, p in enumerate(merges)}
    syms = [*word, END]
    while True:
        cands = [
            (rank[(syms[i], syms[i + 1])], i)
            for i in range(len(syms) - 1)
            if (syms[i], syms[i + 1]) in rank
        ]
        if not cands:
            return syms
        rk = min(cands)[0]
        a, b = merges[rk]
        out = []
        for x in syms:
            if out and out[-1] == a and x == b:
                out[-1] = a + b
            else:
                out.append(x)
        syms = out


@pytest.mark.slow  # reference sweep; trained_merges_match_reference_bpe + oov test keep the cover
def test_bpe_apply_matches_reference_on_unseen_words(spark, docs):
    from grasper_spark.functions.bpe import bpe_apply

    merges, vocab = train_bpe(docs, num_merges=10)
    # mix of training words, unseen-but-mergeable words, and pure OOV
    new_words = ["low", "lowest", "newest", "stow", "zzz", "w", "estest"]
    wdf = spark.createDataFrame([(w,) for w in new_words], "word string")
    got = {r.word: list(r.sym) for r in bpe_apply(wdf, merges).collect()}
    want = {w: _ref_apply(w, merges) for w in new_words}
    assert got == want
    # on the training vocabulary itself, apply == the trained segmentation
    got_train = {
        r.word: list(r.sym)
        for r in bpe_apply(vocab.select("word"), merges).collect()
    }
    want_train = {r.word: list(r.sym) for r in vocab.collect()}
    assert got_train == want_train


def test_merge_table_roundtrip(spark, docs, tmp_path):
    merges, _ = train_bpe(docs, num_merges=6)
    p = str(tmp_path / "merges")
    save_merges(spark, merges, p)
    assert load_merges(spark, p) == merges


def test_segment_plan_is_join_not_python(docs, spark):
    _, vocab = train_bpe(docs, num_merges=4)
    seg = bpe_segment(docs, vocab)
    plan = seg._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # pure join + array expressions
