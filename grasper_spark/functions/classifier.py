"""Model-based quality filtering — the classifier-curation pattern
(a trained filter scoring documents, the production complement to the
hand-tuned heuristics in `text.quality_score`).

The modern pipeline trains a lightweight classifier on a few thousand
labeled examples ("looks like reference text" vs "looks like spam") and
scores the whole corpus with it. Here that is pyspark.ml end-to-end:

- features are the engine's own JVM-side text statistics (token count,
  stopword/punct ratios, mean token length, …) — computed in
  whole-stage codegen, no tokenizer UDF;
- the model is seeded LogisticRegression (deterministic fit);
- scoring is `model.transform` — JVM vectorized, scan-speed, and the
  fitted model serializes with `model.write()` like any Spark ML
  artifact, so train-once / score-everywhere works across clusters.

At 100 TB you train on a sampled/labeled slice (driver-sized labels,
distributed features) and score the full corpus in one pass.

No reference parity to cite: Grasper has no ML surface — this is the
training-data-pipeline extension (SURVEY.md "beyond the reference").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from grasper_spark.functions.text import (
    punct_ratio,
    stopword_ratio,
    token_count,
)

#: feature column names, in assembly order (stable contract for a
#: stored model: score-side feature engineering must match train-side)
FEATURE_COLS = (
    "f_n_tokens",
    "f_stopword_ratio",
    "f_punct_ratio",
    "f_mean_token_len",
    "f_digit_ratio",
    "f_upper_ratio",
)


#: feature-column cache keyed by text column name — the six expression
#: trees cost ~0.14 s of py4j round trips to build (pure per-query
#: compile latency); Columns are unresolved expressions, reusable
#: across queries in one JVM (see text._name_cached)
_FEATURE_COL_CACHE: dict[str, list] = {}


def _feature_cols(text_col: str) -> list:
    cols = _FEATURE_COL_CACHE.get(text_col)
    if cols is None:
        t: Column = F.col(text_col)
        n = token_count(text_col).cast("double")
        cols = _FEATURE_COL_CACHE[text_col] = [
            n.alias("f_n_tokens"),
            stopword_ratio(text_col).cast("double").alias("f_stopword_ratio"),
            punct_ratio(text_col).cast("double").alias("f_punct_ratio"),
            (F.length(F.regexp_replace(t, r"\s+", "")) / F.greatest(n, F.lit(1.0)))
            .alias("f_mean_token_len"),
            (
                F.length(F.regexp_replace(t, r"[^0-9]", ""))
                / F.greatest(F.length(t).cast("double"), F.lit(1.0))
            ).alias("f_digit_ratio"),
            (
                F.length(F.regexp_replace(t, r"[^A-Z]", ""))
                / F.greatest(F.length(t).cast("double"), F.lit(1.0))
            ).alias("f_upper_ratio"),
        ]
    return cols


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the `FEATURE_COLS` statistics — pure column arithmetic,
    zero shuffle, shared by training and scoring."""
    return df.select("*", *_feature_cols(text_col))


def train_quality_classifier(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    seed: int = 42,
):
    """Fit a seeded logistic-regression quality model on a labeled
    sample (label 1 = keep-worthy). Returns the fitted PipelineModel
    (save with `.write().overwrite().save(path)`)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    feats = quality_features(labeled, text_col)
    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=list(FEATURE_COLS), outputCol="_raw"),
            StandardScaler(inputCol="_raw", outputCol="features"),
            LogisticRegression(
                labelCol=label_col, featuresCol="features", maxIter=50,
                regParam=0.01, standardization=False,
            ),
        ]
    )
    return pipe.fit(feats)


def score_quality(
    model,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, model_quality) — P(keep) per document. Feature arithmetic is
    codegen'd; the model transform is JVM vectorized — the scoring pass
    is scan-speed with zero Python."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(quality_features(docs, text_col))
    return scored.select(
        F.col(id_col),
        F.round(vector_to_array("probability")[1], 6).alias("model_quality"),
    )


def classifier_filter(
    model,
    docs: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep documents the model scores ≥ threshold (semi-join back so
    the output carries the caller's original columns untouched)."""
    keep = score_quality(model, docs, text_col, id_col).filter(
        F.col("model_quality") >= threshold
    )
    return docs.join(keep.select(id_col), id_col, "left_semi")
