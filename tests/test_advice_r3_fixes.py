"""Regression tests for round-3 ADVICE findings.

1. predicates.py history-form within/without with a PARTIAL class
   mismatch must compare the same-class refs (not blanket false/notNull).
2. compiler inject(True) into a boolean stream must compile (bool's
   Python type name 'bool' vs Spark's 'boolean').
3. inject into a dtype-unknown stream must cast to the actual VAL column
   type, not a blanket 'string'.
4. bpe.py checkpoint rounds must not leak one cached copy per checkpoint.
"""

from collections import Counter

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from grasper_spark import G, P, PropertyGraph
from grasper_spark.plans.compiler import VAL, GremlinCompiler, Stream
from grasper_spark.plans.predicates import pred_to_condition


# ---- 1. history-form within/without, partial class mismatch ----


def _hist_df(spark):
    # val:int, a:int (same class), b:string (mismatched class)
    return spark.createDataFrame(
        [(1, 1, "x"), (2, 9, "2"), (3, 3, "3"), (None, 1, "y")],
        "val int, a int, b string",
    )


def test_within_history_partial_mismatch_keeps_same_class_refs(spark):
    df = _hist_df(spark)
    cond = pred_to_condition(
        P.within("a", "b"),
        F.col("val"),
        other=[F.col("a"), F.col("b")],
        dtype="int",
        other_dtypes=["int", "string"],
    )
    got = sorted(r.val for r in df.filter(cond).collect())
    # only rows where val == a (the same-class ref); the string ref 'b'
    # is excluded from the comparison, and NULL val never matches
    assert got == [1, 3]


def test_without_history_partial_mismatch_excludes_same_class_refs(spark):
    df = _hist_df(spark)
    cond = pred_to_condition(
        P.without("a", "b"),
        F.col("val"),
        other=[F.col("a"), F.col("b")],
        dtype="int",
        other_dtypes=["int", "string"],
    )
    got = sorted(r.val for r in df.filter(cond).collect())
    # rows where val != a; row (2, 9, "2") passes even though str(b)
    # textually equals val — the mismatched-class ref is ignored
    assert got == [2]


def test_without_history_all_mismatch_keeps_value_present(spark):
    df = _hist_df(spark)
    cond = pred_to_condition(
        P.without("b"),
        F.col("val"),
        other=[F.col("b")],
        dtype="int",
        other_dtypes=["string"],
    )
    got = sorted(r.val for r in df.filter(cond).collect())
    assert got == [1, 2, 3]  # value-present, no refs to exclude


# ---- 2. inject(True) into a boolean stream ----


def test_inject_bool_into_boolean_stream(spark):
    v = spark.createDataFrame(
        [(1, "thing", True), (2, "thing", False)],
        T.StructType(
            [
                T.StructField("vid", T.LongType()),
                T.StructField("label", T.StringType()),
                T.StructField("flag", T.BooleanType()),
            ]
        ),
    )
    e = spark.createDataFrame([], "src long, dst long, label string")
    g = G(PropertyGraph(v, e, name="boolg"))
    got = g.V().values("flag").inject(True).to_list()
    assert sorted(got) == [False, True, True]


# ---- 3. inject into a dtype-unknown stream casts to the VAL dtype ----


def test_inject_unknown_dtype_uses_val_column_type(spark):
    df = spark.range(3).select(F.col("id").cast("bigint").alias(VAL))
    s = Stream(df=df, kind="S", dtype=None)
    out = GremlinCompiler._step_inject(None, s, 41)
    assert dict(out.df.dtypes)[VAL] == "bigint"
    assert sorted(r[0] for r in out.df.collect()) == [0, 1, 2, 41]


# ---- 4. BPE checkpoint rounds don't leak cached copies ----


@pytest.mark.slow  # multi-round training soak; bpe training covered by trained_merges test
def test_train_bpe_checkpoint_rounds_do_not_leak_cache(spark):
    from grasper_spark.functions.bpe import train_bpe

    corpus = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(corpus)], "doc_id long, text string"
    )
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    # checkpoint_every=1 → every round checkpoints; pre-fix this leaked
    # one persisted copy per round
    merges, vocab = train_bpe(docs, num_merges=8, checkpoint_every=1)
    vocab.count()
    after = jsc.getPersistentRDDs().size()
    # the returned vocab (one checkpointed frame) may stay cached, but
    # per-round copies must not accumulate: 8 rounds → would be +8 pre-fix
    assert after - before <= 2
    # and the training result is unchanged
    assert len(merges) == 8
