"""Pure-SQL surface: the text/quality operators as Spark SQL UDFs, plus
graph view registration — so a SQL-only client (spark-sql shell, JDBC,
a notebook cell) can run the pipeline with zero Python anywhere:

    register_sql_functions(spark)
    register_graph_views(spark, g)
    spark.sql('''
        SELECT doc_id, gs_quality_score(text) q, gs_lang_id(text) lang
        FROM documents WHERE gs_token_count(text) >= 10
    ''')

SQL UDFs (``CREATE TEMPORARY FUNCTION … RETURN <expr>``) are inlined
into the calling plan at analysis time — they whole-stage-codegen like
any built-in expression, so these run at scan speed at 100 TB exactly
like their Column-builder twins in `functions/text.py`. Bodies are kept
semantically identical to the builders (tested by parity in
tests/test_sqlfns.py); the reference has no scalar-function surface at
all (SURVEY.md §2.7) — this is a parity-plus extension.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from grasper_spark.functions.text import LANG_STOPWORDS

#: whitespace tokenizer fragment (x pre-trimmed where needed)
_TOKS = r"split(trim({x}), '\\s+')"
_LTOKS = r"split(trim(lower({x})), '\\s+')"


def _sw_list(lang: str) -> str:
    return ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])


def _sql_functions() -> dict[str, str]:
    toks = _TOKS.format(x="x")
    ltoks = _LTOKS.format(x="x")
    # votes per language, en < de < es < fr tie-break via strict > chain
    # (mirrors functions/text.py lang_id)
    vote = {
        lang: f"size(filter({ltoks}, t -> t IN ({_sw_list(lang)})))"
        for lang in LANG_STOPWORDS
    }
    lang_case = "'unknown'"
    best = "0"
    for lang in ["en", "de", "es", "fr"]:
        lang_case = f"CASE WHEN {vote[lang]} > {best} THEN '{lang}' ELSE {lang_case} END"
        best = f"greatest({vote[lang]}, {best})"
    punct = (
        "round(length(regexp_replace(x, '[^.,;:!?\\'\"()\\\\[\\\\]{}-]', ''))"
        " / greatest(length(x), 1), 6)"
    )
    swr = (
        f"round(size(filter({ltoks}, t -> t IN ({_sw_list('en')})))"
        f" / greatest(size({ltoks}), 1), 6)"
    )
    ntok = f"CASE WHEN length(trim(x)) = 0 THEN 0 ELSE size({toks}) END"
    return {
        "gs_token_count(x STRING) RETURNS INT": ntok,
        "gs_bpe_token_count(x STRING) RETURNS INT": (
            "CASE WHEN length(trim(x)) = 0 THEN 0 ELSE "
            r"size(split(trim(x), '\\s+|(?<=[a-zA-Z])(?=[0-9])|(?<=[0-9])(?=[a-zA-Z])'))"
            " END"
        ),
        "gs_punct_ratio(x STRING) RETURNS DOUBLE": punct,
        "gs_stopword_ratio(x STRING) RETURNS DOUBLE": swr,
        "gs_mean_token_len(x STRING) RETURNS DOUBLE": (
            f"round(aggregate({toks}, 0, (acc, t) -> acc + length(t))"
            f" / greatest(size({toks}), 1), 6)"
        ),
        "gs_quality_score(x STRING) RETURNS DOUBLE": (
            f"round((0.5 * least(({ntok}) / 50.0, 1.0)"
            f" + 0.4 * least(({swr}) * 5.0, 1.0))"
            f" * (1.0 - 0.3 * least(({punct}) * 10.0, 1.0)), 6)"
        ),
        "gs_lang_id(x STRING) RETURNS STRING": lang_case,
        "gs_normalize(x STRING) RETURNS STRING": (
            r"trim(regexp_replace(lower(x), '\\s+', ' '))"
        ),
        "gs_fingerprint(x STRING) RETURNS STRING": (
            r"md5(trim(regexp_replace(lower(x), '\\s+', ' ')))"
        ),
    }


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register every gs_* SQL UDF; returns the registered names."""
    names = []
    for sig, body in _sql_functions().items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {sig} RETURN {body}")
        names.append(sig.split("(", 1)[0])
    return names


def register_graph_views(spark: SparkSession, g, prefix: str = "graph") -> list[str]:
    """Expose a PropertyGraph (or G wrapper) as `{prefix}_vertices` /
    `{prefix}_edges` temp views for pure-SQL traversal joins."""
    pg = getattr(g, "graph", g)
    v, e = f"{prefix}_vertices", f"{prefix}_edges"
    pg.vertices.createOrReplaceTempView(v)
    pg.edges.createOrReplaceTempView(e)
    return [v, e]
