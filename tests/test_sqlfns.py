"""The pure-SQL function surface must agree exactly with the Column
builders in functions/text.py, stay Python-free in the plan, and make a
graph traversable from plain SQL."""

import pytest
from pyspark.sql import functions as F

from grasper_spark import G, PropertyGraph
from grasper_spark.functions import text as T
from grasper_spark.sqlfns import register_graph_views, register_sql_functions

DOCS = [
    (1, "The cat and the dog of the house sat on the mat."),
    (2, ""),
    (3, "   "),
    (4, "der und die das ist ein haus"),
    (5, "el que la de los ninos!!!"),
    (6, "le et la les des chats"),
    (7, "x1y2z3 mixed123tokens and, some; punct?! (lots) [of] {it}"),
    (8, "one-token"),
    (9, "The the THE tHe"),
    (10, "naïve café — unicode ümlauts größer"),
]


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    df.createOrReplaceTempView("sqlfn_docs")
    register_sql_functions(spark)
    return df


PAIRS = [
    ("gs_token_count", lambda t: T.token_count(t)),
    ("gs_bpe_token_count", lambda t: T.bpe_ish_token_count(t)),
    ("gs_punct_ratio", lambda t: T.punct_ratio(t)),
    ("gs_stopword_ratio", lambda t: T.stopword_ratio(t)),
    ("gs_mean_token_len", lambda t: T.mean_token_len(t)),
    ("gs_quality_score", lambda t: T.quality_score(t)),
    ("gs_lang_id", lambda t: T.lang_id(t)),
    ("gs_normalize", lambda t: T.normalize(t)),
    ("gs_fingerprint", lambda t: T.fingerprint(t)),
]


@pytest.mark.parametrize("fn,builder", PAIRS, ids=[p[0] for p in PAIRS])
def test_sql_udf_matches_column_builder(spark, docs, fn, builder):
    got = {
        r.doc_id: r.v
        for r in spark.sql(
            f"SELECT doc_id, {fn}(text) AS v FROM sqlfn_docs"
        ).collect()
    }
    want = {
        r.doc_id: r.v
        for r in docs.select("doc_id", builder(F.col("text")).alias("v")).collect()
    }
    assert got == want, f"{fn} diverges from its Column twin"


def test_sql_udfs_are_python_free_and_codegen(spark, docs):
    df = spark.sql(
        "SELECT doc_id, gs_quality_score(text) q, gs_lang_id(text) lang "
        "FROM sqlfn_docs WHERE gs_token_count(text) >= 2"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # `*(n)` prefixes mark whole-stage-codegen'd operators
    assert "*(1)" in plan
    assert df.count() == 7  # docs 2,3,8 drop (<2 tokens)


def test_sql_udf_parity_on_adversarial_strings(spark, docs):
    # seeded random corpus of nasty inputs: quotes, backslashes, regex
    # metacharacters, unicode, control whitespace — the escaping in the
    # SQL UDF bodies must agree with the Column builders on ALL of them
    import random

    rng = random.Random(7)
    alphabet = (
        "abc XYZ 012 .,;:!?'\"()[]{}-\\/|^$*+?~`@#%&=<>\t\n\r "
        "äöü naïve 汉字 ёж ▁ 𝛼"
    )
    rows = [
        (i, "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40))))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.createOrReplaceTempView("sqlfn_nasty")
    for fn, builder in PAIRS:
        got = {
            r.doc_id: r.v
            for r in spark.sql(
                f"SELECT doc_id, {fn}(text) AS v FROM sqlfn_nasty"
            ).collect()
        }
        want = {
            r.doc_id: r.v
            for r in df.select("doc_id", builder(F.col("text")).alias("v")).collect()
        }
        assert got == want, f"{fn} diverges on adversarial strings"


def test_graph_views_sql_traversal(spark):
    v = spark.createDataFrame(
        [(1, "person", "alice"), (2, "person", "bob"), (3, "item", "pen")],
        "vid long, label string, name string",
    )
    e = spark.createDataFrame(
        [(1, 2, "knows"), (2, 3, "likes")], "src long, dst long, label string"
    )
    register_graph_views(spark, G(PropertyGraph(v, e)), prefix="tg")
    # out('knows').values('name') as plain SQL
    got = spark.sql(
        "SELECT w.name FROM tg_vertices v "
        "JOIN tg_edges e ON e.src = v.vid AND e.label = 'knows' "
        "JOIN tg_vertices w ON w.vid = e.dst WHERE v.name = 'alice'"
    ).collect()
    assert [r.name for r in got] == ["bob"]
