"""Text analysis operators: tokenization, quality, language-ID,
fingerprinting.

All pure Spark SQL expressions (whole-stage-codegen'd, no UDFs) — at
100 TB these run at scan speed. Each has an exact DuckDB-SQL twin used
by the driver's oracle (see __spark_entry__.oracle_sql).
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _name_cached(fn):
    """Memoize a Column-builder for the common string-column-name call.

    These builders construct LARGE expression trees (stopword isin
    lists, HOF lambdas, when-chains) — each construction is dozens of
    py4j round trips, measured at ~0.1-0.15 s per lang_id/quality_score
    call, pure per-query COMPILE latency a serving tier pays every
    time. A Column is an unresolved expression, reusable across
    queries/DataFrames in one JVM, so the tree keyed by the input
    column NAME is built once per process. Column arguments and
    non-default extra args bypass the cache (expressions are not
    hashable keys)."""

    @functools.wraps(fn)
    def wrap(text, *args, **kwargs):
        if isinstance(text, str) and not args and not kwargs:
            key = text
            hit = wrap._cache.get(key)
            if hit is None:
                hit = wrap._cache[key] = fn(F.col(text))
            return hit
        return fn(text, *args, **kwargs)

    wrap._cache = {}
    return wrap


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


@_name_cached
def token_count(text: Column | str) -> Column:
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(F.size(tokens(text)))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: split on whitespace AND word/number/punct
    boundaries (a BPE-like upper bound used for budget estimates)."""
    pieces = F.split(F.trim(text), r"\s+|(?<=[a-zA-Z])(?=[0-9])|(?<=[0-9])(?=[a-zA-Z])")
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(F.size(pieces))


@_name_cached
def punct_ratio(text: Column | str) -> Column:
    clean = F.regexp_replace(text, r"[^.,;:!?'\"()\[\]{}-]", "")
    return F.round(F.length(clean) / F.greatest(F.length(text), F.lit(1)), 6)


@_name_cached
def stopword_ratio(text: Column | str, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or LANG_STOPWORDS["en"]
    toks = tokens(F.lower(text))
    hits = F.size(F.filter(toks, lambda t: t.isin(sw)))
    return F.round(hits / F.greatest(F.size(toks), F.lit(1)), 6)


@_name_cached
def mean_token_len(text: Column | str) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.round(total / F.greatest(F.size(toks), F.lit(1)), 6)


@_name_cached
def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length band + stopword presence
    - punctuation excess. Deterministic arithmetic, 6-dp rounded."""
    n = token_count(text)
    len_term = F.least(n / F.lit(50.0), F.lit(1.0))
    sw_term = F.least(stopword_ratio(text) * 5.0, F.lit(1.0))
    punct_term = F.least(punct_ratio(text) * 10.0, F.lit(1.0))
    return F.round((0.5 * len_term + 0.4 * sw_term) * (1.0 - 0.3 * punct_term), 6)


@_name_cached
def lang_id(text: Column | str) -> Column:
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


#: html_to_text regex sequence — RE2-compatible (lazy quantifiers are
#: RE2; no lookaround/backrefs), so the DuckDB oracle runs the SAME
#: patterns and must produce the SAME extraction. Order matters:
#: comments, then script/style BLOCKS (content dropped), then remaining
#: tags (content kept), then entities (&amp; last), then collapse.
HTML_STRIP_PATTERNS = (
    (r"(?s)<!--.*?-->", " "),
    (r"(?is)<script\b[^>]*>.*?</script\s*>", " "),
    (r"(?is)<style\b[^>]*>.*?</style\s*>", " "),
    (r"(?s)<[^>]*>", " "),
)
HTML_ENTITIES = (
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&#39;", "'"), ("&apos;", "'"), ("&nbsp;", " "),
    ("&amp;", "&"),  # must be last or it re-creates entities
)


def html_to_text(html: Column) -> Column:
    """Web-page text extraction at scan speed — pure JVM regex chain
    (whole-stage codegen, no Python): drop comments and script/style
    blocks, strip remaining tags, decode the common named entities,
    collapse whitespace. The lightweight boilerplate-strip a web-corpus
    pipeline runs over billions of WARC response bodies before
    quality/dedup — heavier readability extraction plugs in behind the
    same signature."""
    c = html
    for pat, rep in HTML_STRIP_PATTERNS:
        c = F.regexp_replace(c, pat, rep)
    for ent, ch in HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


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


# ---------- Gopher-style repetition signals ----------


def dup_line_fraction(text: Column) -> Column:
    """Fraction of non-blank lines that are duplicates of another line —
    the Gopher 'duplicate line fraction' repetition rule (Rae et al.
    2021, arXiv:2112.11446 §A1.1). Pure array expressions, scan speed."""
    lines = F.filter(
        F.split(text, "\n"), lambda ln: F.length(F.trim(ln)) > 0
    )
    return F.when(F.size(lines) == 0, F.lit(0.0)).otherwise(
        F.round(F.lit(1.0) - F.size(F.array_distinct(lines)) / F.size(lines), 6)
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition signals: duplicate-line fraction and
    top-bigram fraction (share of adjacent-token pairs taken by the most
    frequent bigram — Gopher §A1.1's 'top 2-gram' rule).

    Scale shape: the bigram mode needs a per-(doc, bigram) count. The
    bigrams are built with the ZERO-SHUFFLE index-explode form (the
    round-8 shingle rewrite, functions/dedup.py:_exploded_shingles):
    the token array stays in the row, the bigram start-index range
    explodes, and try_element_at reads both tokens — one
    WholeStageCodegen span. The previous posexplode +
    Window.partitionBy(id) + lead form shuffled EVERY token row through
    a hash exchange just to pair neighbors already adjacent in the
    source row. Then two partial-aggregated groupBys keyed by doc_id.
    No UDFs, no all-pairs work; shuffle volume is O(distinct bigram
    partials), not O(total tokens)."""
    t = F.col(text_col)
    base = df.select(
        F.col(id_col),
        dup_line_fraction(t).alias("dup_line_frac"),
        token_count(t).alias("n_tokens"),
        tokens(F.lower(t)).alias("_tk"),
    )
    cnt = F.size("_tk")
    idx = F.when(cnt >= 2, F.sequence(F.lit(0), cnt - 2))
    bigrams = base.select(
        F.col(id_col), F.col("_tk"), F.explode(idx).alias("_i")
    ).select(
        id_col,
        F.concat_ws(
            " ",
            F.try_element_at("_tk", F.col("_i") + 1),
            F.try_element_at("_tk", F.col("_i") + 2),
        ).alias("_bg"),
    )
    top = (
        bigrams.groupBy(id_col, "_bg").agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(id_col).agg(F.max("_c").alias("_mx"))
    )
    out = (
        base.drop("_tk")
        .join(top, id_col, "left")
        .withColumn(
            "top_bigram_frac",
            F.when(
                F.col("n_tokens") < 2, F.lit(0.0)
            ).otherwise(
                F.round(F.coalesce(F.col("_mx"), F.lit(0)) / (F.col("n_tokens") - 1), 6)
            ),
        )
        .drop("_mx")
    )
    return out


#: Gopher-ish acceptance thresholds (document-level repetition gates)
GOPHER_MAX_DUP_LINE = 0.30
GOPHER_MAX_TOP_BIGRAM = 0.20
GOPHER_MIN_TOKENS = 3
GOPHER_MAX_TOKENS = 100_000


def gopher_quality(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """repetition_stats + a boolean pass gate on the Gopher thresholds."""
    stats = repetition_stats(df, text_col, id_col)
    return stats.withColumn(
        "pass",
        (F.col("dup_line_frac") <= GOPHER_MAX_DUP_LINE)
        & (F.col("top_bigram_frac") <= GOPHER_MAX_TOP_BIGRAM)
        & F.col("n_tokens").between(GOPHER_MIN_TOKENS, GOPHER_MAX_TOKENS),
    )


# ---------- PII redaction ----------

# RE2-compatible patterns (no lookaround/backrefs) so the Spark (Java
# regex) and DuckDB (RE2) engines produce identical matches.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"),
    ("phone", r"\+[0-9][0-9()\- ]{6,}[0-9]"),
]


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Replace emails / IPv4s / international-format phones with typed
    placeholders; emit per-kind match counts. Pure regexp expressions —
    scan speed, trivially parallel, no shuffle."""
    t = F.col(text_col)
    counts = [
        F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0))).alias(f"n_{kind}")
        for kind, pat in PII_PATTERNS
    ]
    clean = t
    for kind, pat in PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, f"<{kind.upper()}>")
    return df.select(F.col(id_col), clean.alias("clean_text"), *counts)


# ---------- chunking ----------


def chunk_documents(
    df: DataFrame,
    window: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into `window`-token chunks every `stride`
    tokens (overlap = window - stride) — the standard training-data
    packing shape. One row per (doc, chunk ordinal).

    Scale shape: chunk starts are a per-row sequence() + transform over
    the token array (whole-stage codegen), posexploded — no shuffle at
    all; output size is rows x ceil(tokens/stride)."""
    assert 0 < stride <= window, "need 0 < stride <= window"
    t = F.col(text_col)

    # let-bind the token array via a single-element transform so the
    # tokenizer runs once per row — Spark does no CSE into HOF lambdas
    # (same pattern as rolling_fingerprints above)
    def _chunks(toks: Column) -> Column:
        n = F.size(toks)
        starts = F.sequence(
            F.lit(0), F.greatest(F.ceil(n / F.lit(stride)).cast("int") - 1, F.lit(0))
        )
        return F.transform(
            starts, lambda i: F.array_join(F.slice(toks, i * stride + 1, window), " ")
        )

    chunks = F.element_at(F.transform(F.array(tokens(t)), _chunks), 1)
    out = df.select(
        F.col(id_col),
        token_count(t).alias("_n"),
        F.posexplode(chunks).alias("chunk_id", "chunk"),
    )
    return (
        out.filter((F.col("_n") > 0) & (F.length("chunk") > 0))
        .withColumn("n_chunk_tokens", F.size(tokens(F.col("chunk"))))
        .drop("_n")
    )


def topk_ngrams(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    k: int = 100,
) -> DataFrame:
    """Corpus-level vocabulary: the k most frequent token n-grams with
    occurrence counts (every occurrence counts, not per-doc distinct).

    Scale shape: shingles stream through the codegen'd posexplode+lead
    path, then ONE partial-aggregated groupBy on the n-gram and a
    TakeOrdered(k) — no global sort materialization. Ties break on the
    n-gram string so the k-th row is deterministic across engines."""
    from grasper_spark.functions.dedup import _exploded_shingles

    counts = (
        _exploded_shingles(df, text_col, id_col, n, distinct=False)
        .groupBy(F.col("sh").alias("ngram"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return counts.orderBy(F.col("cnt").desc(), F.col("ngram")).limit(k)


def unigram_lm_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    quantize: int | None = None,
) -> DataFrame:
    """Per-doc mean log-probability under the corpus's OWN unigram LM —
    the cheap perplexity-proxy quality filter (CCNet-style): documents
    far below the corpus's typical mean logprob are gibberish/outliers,
    far above are repetitive boilerplate. p(tok) = corpus count of tok /
    total tokens; score = mean over the doc's tokens of ln p(tok).
    Returns (id, n_tokens, lm_score) for non-empty docs.

    `quantize=K` makes lm_score the int64 SUM of floor(ln(p)·K) instead
    of the float mean: the per-token ln sees the identical double c/n on
    any engine and the cross-row fold is pure integer, so exact-compare
    gates can hash it (a float mean is fold-order-sensitive; with
    n_tokens also emitted the mean is recoverable).

    Scale: one partial-aggregated vocab groupBy, one token→count join
    (vocab is Zipfian — AQE broadcasts when it fits, shuffle-joins
    otherwise; the token stream never moves twice), one per-doc mean.
    No UDFs, no driver-side vocabulary."""
    toks = df.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("_t"),
    )
    vocab = toks.groupBy("_t").agg(F.count(F.lit(1)).alias("_c"))
    total = vocab.agg(F.sum("_c").cast("double").alias("_n"))
    return (
        toks.join(vocab, "_t", "inner")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (
                F.sum(F.floor(F.log(F.col("_c") / F.col("_n")) * F.lit(float(quantize))))
                if quantize
                else F.round(F.avg(F.log(F.col("_c") / F.col("_n"))), 4)
            ).alias("lm_score"),
        )
    )


def tfidf_top_terms(
    df: DataFrame, k: int = 5, text_col: str = "text", id_col: str = "doc_id",
    quantize: int | None = None,
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF (the classic
    keyword/feature extractor): tf = in-doc count, idf = ln(N / df)
    with document frequency over the corpus; ties break on the term
    string so row k is deterministic. Returns (id, term, tfidf, rank).

    Scale: one token explode, one per-(doc, term) count (partial agg),
    one df groupBy, one join, one per-doc top-k window — the same
    inverted-index shapes as the dedup family; idf's N is the only
    driver scalar."""
    toks = df.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.filter(F.length(F.trim(F.col(text_col))) > 0).count()
    scored = tf.join(dfreq, "term").select(
        id_col, "term",
        (
            # quantize=K: hash-stable int64 floor(tfidf*K) — round(·,6)
            # of an ln-derived float can flip across engines (see
            # unigram_lm_score)
            F.floor(
                F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")) * F.lit(float(quantize))
            )
            if quantize
            else F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6)
        ).alias("tfidf"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def pmi_bigrams(
    df: DataFrame, k: int = 50, min_count: int = 2,
    text_col: str = "text", id_col: str = "doc_id",
    quantize: int | None = None,
) -> DataFrame:
    """Top-k collocations: adjacent token bigrams ranked by pointwise
    mutual information, PMI = ln(c_ab · T / (c_a · c_b)) with T = total
    token occurrences — the standard phrase-mining signal (high PMI =
    the pair co-occurs far more than its parts predict). Bigrams with
    c_ab < min_count are dropped (PMI is unstable on hapax pairs); ties
    break on the bigram string. Returns (bigram, n, pmi, rank).

    Scale: one token explode feeding both the unigram and the
    (lead-based) bigram counts — two partial-agg groupBys + two joins on
    the unigram table + TakeOrdered(k); no global sort."""
    from pyspark.sql import Window

    toks = df.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col),
        F.posexplode(tokens(F.lower(F.col(text_col)))).alias("pos", "t"),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    big = toks.select(
        F.col("t").alias("a"), F.lead("t").over(w).alias("b")
    ).filter(F.col("b").isNotNull())
    uni = toks.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    total = toks.count()
    bc = big.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n")).filter(
        F.col("n") >= min_count
    )
    # ORDER by the raw ratio n·T/(ca·cb): exact-int products < 2^53
    # through one division are bit-identical on any engine, and ln is
    # strictly monotone so the ranking is the same — keeping ln out of
    # the sort removes the one cross-engine nondeterminism (libm ulp
    # drift) from the top-k cut
    ratio = F.col("n") * F.lit(float(total)) / (F.col("ca") * F.col("cb"))
    scored = (
        bc.join(uni.select(F.col("t").alias("a"), F.col("c").alias("ca")), "a")
        .join(uni.select(F.col("t").alias("b"), F.col("c").alias("cb")), "b")
        .select(
            F.concat_ws(" ", "a", "b").alias("bigram"),
            "n",
            ratio.alias("_r"),
            (
                F.floor(F.log(ratio) * F.lit(float(quantize)))
                if quantize
                else F.round(F.log(ratio), 6)
            ).alias("pmi"),
        )
    )
    top = scored.orderBy(F.col("_r").desc(), F.col("bigram")).limit(k)
    return top.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.col("_r").desc(), F.col("bigram"))),
    ).drop("_r")
