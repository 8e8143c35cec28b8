"""Model-based quality filtering: deterministic training, separation on
constructed data, save/load round-trip, JVM-only scoring plan."""

import pytest
from pyspark.sql import functions as F


def _labeled(spark, n=120):
    # class 1: english-looking prose; class 0: digit/punct spam. The
    # classes separate on the engine's feature set by construction.
    good = [
        (i, "the quick brown fox jumps over the lazy dog and runs to the hills "
            "where the sun sets in the west and the birds sing", 1)
        for i in range(n // 2)
    ]
    bad = [
        (1000 + i, "$$$ 1234567890 !!! %s ### 999 @@@ 88888 *** !!!" % (i * 7919), 0)
        for i in range(n // 2)
    ]
    return spark.createDataFrame(good + bad, "doc_id long, text string, label int")


def test_classifier_separates_and_is_deterministic(spark):
    from grasper_spark.functions.classifier import (
        classifier_filter,
        score_quality,
        train_quality_classifier,
    )

    labeled = _labeled(spark)
    model = train_quality_classifier(labeled)
    scores = {r.doc_id: r.model_quality for r in score_quality(model, labeled).collect()}
    good = [v for k, v in scores.items() if k < 1000]
    bad = [v for k, v in scores.items() if k >= 1000]
    assert min(good) > 0.9 and max(bad) < 0.1

    kept = classifier_filter(model, labeled, threshold=0.5)
    assert {r.doc_id < 1000 for r in kept.collect()} == {True}
    assert set(kept.columns) == {"doc_id", "text", "label"}

    # seeded fit → identical scores on refit
    again = {r.doc_id: r.model_quality
             for r in score_quality(train_quality_classifier(labeled), labeled).collect()}
    assert again == scores


def test_classifier_roundtrip_and_jvm_scoring(spark, tmp_path):
    from pyspark.ml import PipelineModel

    from grasper_spark.functions.classifier import score_quality, train_quality_classifier

    labeled = _labeled(spark, n=40)
    model = train_quality_classifier(labeled)
    path = str(tmp_path / "qmodel")
    model.write().overwrite().save(path)
    loaded = PipelineModel.load(path)
    a = sorted(tuple(r) for r in score_quality(model, labeled).collect())
    b = sorted(tuple(r) for r in score_quality(loaded, labeled).collect())
    assert a == b
    # the scoring plan must stay JVM-side (no Python evals)
    plan = (
        score_quality(loaded, labeled)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan and "ArrowEval" not in plan
