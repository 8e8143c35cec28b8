"""Text analysis operators: tokenization, quality, language-ID,
fingerprinting.

All pure Spark SQL expressions (whole-stage-codegen'd, no UDFs) — at
100 TB these run at scan speed. Each has an exact DuckDB-SQL twin used
by the driver's oracle (see __spark_entry__.oracle_sql).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deterministic and mirrored literally in the SQL oracle.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "und", "die", "das", "ist"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "et", "les", "des"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization of trimmed text."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(F.size(tokens(text)))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: split on whitespace AND word/number/punct
    boundaries (a BPE-like upper bound used for budget estimates)."""
    pieces = F.split(F.trim(text), r"\s+|(?<=[a-zA-Z])(?=[0-9])|(?<=[0-9])(?=[a-zA-Z])")
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(F.size(pieces))


def punct_ratio(text: Column) -> Column:
    clean = F.regexp_replace(text, r"[^.,;:!?'\"()\[\]{}-]", "")
    return F.round(F.length(clean) / F.greatest(F.length(text), F.lit(1)), 6)


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or LANG_STOPWORDS["en"]
    toks = tokens(F.lower(text))
    hits = F.size(F.filter(toks, lambda t: t.isin(sw)))
    return F.round(hits / F.greatest(F.size(toks), F.lit(1)), 6)


def mean_token_len(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.round(total / F.greatest(F.size(toks), F.lit(1)), 6)


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + stopword presence
    - punctuation excess. Deterministic arithmetic, 6-dp rounded."""
    n = token_count(text)
    len_term = F.least(n / F.lit(50.0), F.lit(1.0))
    sw_term = F.least(stopword_ratio(text) * 5.0, F.lit(1.0))
    punct_term = F.least(punct_ratio(text) * 10.0, F.lit(1.0))
    return F.round((0.5 * len_term + 0.4 * sw_term) * (1.0 - 0.3 * punct_term), 6)


def lang_id(text: Column) -> Column:
    """Stopword-vote language ID with deterministic tie-break (first of
    en < de < es < fr in vote order wins ties via > comparison chain)."""
    toks = tokens(F.lower(text))

    def _in_set(words: list[str]):
        # NB: must stay a one-parameter lambda — PySpark passes (elem, idx)
        # to two-parameter HOF lambdas, which would shadow a default arg.
        return lambda t: t.isin(words)

    votes = {lang: F.size(F.filter(toks, _in_set(sw))) for lang, sw in LANG_STOPWORDS.items()}
    best_lang, best_votes = F.lit("unknown"), F.lit(0)
    for lang in ["en", "de", "es", "fr"]:
        is_better = votes[lang] > best_votes
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_votes = F.when(is_better, votes[lang]).otherwise(best_votes)
    return best_lang


def normalize(text: Column) -> Column:
    """Canonical form for fingerprint/dedup: lowercase, collapse spaces."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint(text: Column) -> Column:
    """Document fingerprint = md5 of normalized text."""
    return F.md5(normalize(text))


def rolling_fingerprints(text: Column, window: int = 8) -> Column:
    """Winnowing-style rolling fingerprints: md5-int of each `window`-token
    shingle (the full set; selecting minima per window is done by the
    caller when sampling).

    The token array is let-bound via a single-element transform so the
    tokenizer runs once per row — Spark does no CSE into HOF lambdas."""

    def body(toks: Column) -> Column:
        n = F.size(toks)
        idx = F.sequence(F.lit(0), F.greatest(n - window, F.lit(0)))
        shingle = lambda i: F.concat_ws(  # noqa: E731
            " ", *[F.element_at(toks, i + j + 1) for j in range(window)]
        )
        return F.when(
            n < window, F.array(_md5_int(F.concat_ws(" ", toks)))
        ).otherwise(F.transform(idx, lambda i: _md5_int(shingle(i))))

    return F.element_at(F.transform(F.array(tokens(normalize(text))), body), 1)


def _md5_int(col: Column) -> Column:
    """Deterministic 32-bit int from a string, reproducible in DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def analyze(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One-pass text-analysis projection over a documents table."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.length(t).alias("n_chars_obs"),
        token_count(t).alias("n_tokens"),
        mean_token_len(t).alias("mean_token_len"),
        punct_ratio(t).alias("punct_ratio"),
        stopword_ratio(t).alias("stopword_ratio"),
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang_pred"),
        fingerprint(t).alias("fingerprint"),
    )
