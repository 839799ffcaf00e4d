"""Spark ML pipeline semantics (ml/pipeline.py): threshold scoring,
A18 evaluation math, artifact roundtrip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chicago_crash_data_pipeline_dashboard_spark.ml import pipeline as MLP
from chicago_crash_data_pipeline_dashboard_spark.operators.clean import clean_crashes
from chicago_crash_data_pipeline_dashboard_spark.plans.crash_ops import synth_bronze_spark


def test_evaluate_confusion_math(spark):
    rows = [(1, 1)] * 6 + [(0, 1)] * 2 + [(1, 0)] * 3 + [(0, 0)] * 9
    df = spark.createDataFrame(rows, ["hit_and_run_i", "hit_run_pred"])
    m = MLP.evaluate(df)
    assert (m["tp"], m["fp"], m["fn"], m["tn"]) == (6, 2, 3, 9)
    assert m["accuracy"] == 15 / 20
    assert m["precision"] == 6 / 8
    assert m["recall"] == 6 / 9
    assert abs(m["f1"] - (2 * 0.75 * (6 / 9)) / (0.75 + 6 / 9)) < 1e-12


def test_evaluate_zero_guards(spark):
    df = spark.createDataFrame([(0, 0), (0, 0)], ["hit_and_run_i", "hit_run_pred"])
    m = MLP.evaluate(df)
    assert m["precision"] == 0.0 and m["recall"] == 0.0 and m["f1"] == 0.0
    assert m["accuracy"] == 1.0


@pytest.fixture(scope="module")
def trained(spark, sf_smoke):
    cleaned = clean_crashes(synth_bronze_spark(spark, sf_smoke)).cache()
    model = MLP.train(cleaned, max_iter=3, max_depth=3)
    return model, cleaned


def test_train_score_threshold(trained):
    model, cleaned = trained
    scored = MLP.score(model, cleaned, threshold=0.26)
    assert "hit_run_prob" in scored.columns and "hit_run_pred" in scored.columns
    probs = scored.select("hit_run_prob").toPandas()["hit_run_prob"]
    assert ((probs >= 0) & (probs <= 1)).all()
    # lower threshold → at least as many positives
    lo = MLP.score(model, cleaned, threshold=0.05).agg(F.sum("hit_run_pred")).first()[0]
    hi = MLP.score(model, cleaned, threshold=0.9).agg(F.sum("hit_run_pred")).first()[0]
    assert lo >= hi


def test_unseen_category_does_not_fail(trained, spark):
    model, cleaned = trained
    one = cleaned.limit(1).withColumn("weather_condition", F.lit("NEVER_SEEN_VALUE"))
    assert MLP.score(model, one).count() == 1  # handleInvalid='keep'


def test_model_roundtrip(tmp_path, trained):
    model, cleaned = trained
    metrics = MLP.evaluate(MLP.score(model, cleaned))
    meta = MLP.default_metadata(0.26, metrics)
    MLP.save_model(model, str(tmp_path), meta)
    model2, meta2 = MLP.load_model(str(tmp_path))
    assert meta2["threshold"] == 0.26
    assert meta2["feature_names"] == MLP.FEATURES_CATEGORICAL + MLP.FEATURES_NUMERIC
    a = MLP.score(model, cleaned).select("hit_run_prob").toPandas()
    b = MLP.score(model2, cleaned).select("hit_run_prob").toPandas()
    assert (a["hit_run_prob"] == b["hit_run_prob"]).all()
