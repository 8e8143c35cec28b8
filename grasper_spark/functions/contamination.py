"""Benchmark decontamination: flag training documents that share word
n-grams with a held-out evaluation/benchmark set.

The standard LLM-pipeline guard against train/test leakage (the
reference engine has no equivalent; this extends the document surface):
any training document containing an n-gram that also appears in a
benchmark document is reported with its distinct overlap count, so the
pipeline can drop or audit it.

Scale design (100 TB corpus, benchmark ≪ corpus):
- both sides shingle through the codegen'd posexplode+lead path
  (one window shuffle each, no Python);
- the benchmark side reduces to DISTINCT n-grams first — it is the
  small side, and AQE broadcasts it when it fits, falling back to a
  shuffle join on the n-gram otherwise;
- the overlap count is one partial-aggregated groupBy per doc id.
No all-pairs comparison anywhere: cost is O(corpus tokens) +
O(matching n-gram occurrences).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grasper_spark.functions.dedup import _exploded_shingles


def contamination_report(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_hits: int = 1,
) -> DataFrame:
    """(id, bench_ngrams) for every training doc sharing >= `min_hits`
    DISTINCT n-grams with the benchmark set."""
    doc_sh = _exploded_shingles(docs, text_col, id_col, n)
    bench_sh = (
        _exploded_shingles(benchmark, text_col, id_col, n).select("sh").distinct()
    )
    return (
        doc_sh.join(bench_sh, "sh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("bench_ngrams"))
        .filter(F.col("bench_ngrams") >= min_hits)
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_hits: int = 1,
) -> DataFrame:
    """Training docs with contaminated ones removed (anti join against
    the report — the production path after auditing the report)."""
    bad = contamination_report(docs, benchmark, text_col, id_col, n, min_hits)
    return docs.join(bad.select(id_col), id_col, "left_anti")
