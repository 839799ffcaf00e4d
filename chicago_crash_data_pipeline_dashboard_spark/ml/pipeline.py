"""Hit-and-run classifier: the reference's ML surface re-expressed in
Spark ML (U2-U5; streamlit_frontend.py:2030-2462, artifacts/
model_metadata.json).

The reference ships a single-node XGBoost pipeline (joblib .pkl) scored
with ``predict_proba >= 0.26``; parity target per SURVEY §7 phase 6 is
the same *surface* — feature set shape, threshold scoring, metadata
JSON, A18 evaluation — not identical weights. Training/scoring are
fully distributed (StringIndexer → OneHotEncoder → VectorAssembler →
GBTClassifier); evaluation is plain aggregations over
(label, prediction) — no sklearn, no collect of the scored frame.
"""

from __future__ import annotations

import json
import os

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import GBTClassifier
from pyspark.ml.feature import OneHotEncoder, StringIndexer, VectorAssembler
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LABEL = "hit_and_run_i"

# mirrors model_metadata.json:2-26 feature_names restricted to the gold
# schema (the reference feeds 23 raw gold columns; encoding happens
# inside the pipeline there too)
FEATURES_NUMERIC = [
    "posted_speed_limit",
    "num_units",
    "injuries_total",
    "crash_hour",
    "crash_day_of_week",
    "is_weekend",
    "latitude",
    "longitude",
    "beat_of_occurrence",
]
FEATURES_CATEGORICAL = [
    "weather_condition",
    "lighting_condition",
    "roadway_surface_cond",
    "traffic_control_device",
    "crash_type",
    "hour_bin",
    "street_direction",
    "trafficway_type",
    "road_defect",
]

# decision threshold from the reference (model_metadata.json:28)
DEFAULT_THRESHOLD = 0.26


def build_pipeline(
    numeric: list[str] | None = None,
    categorical: list[str] | None = None,
    label: str = LABEL,
    max_iter: int = 20,
    max_depth: int = 5,
    seed: int = 42,
) -> Pipeline:
    """Indexer → one-hot → assembler → gradient-boosted trees.

    ``handleInvalid='keep'`` end-to-end: categories unseen at fit time
    get their own index bucket at scoring time instead of failing —
    the behavior a production scorer needs when new category values
    arrive after training.
    """
    numeric = FEATURES_NUMERIC if numeric is None else numeric
    categorical = FEATURES_CATEGORICAL if categorical is None else categorical
    # ONE multi-column indexer: a per-column StringIndexer costs one
    # full aggregation pass over the training frame each — 9 passes for
    # 9 categoricals; the multi-column form computes all the value
    # frequencies in a single pass (same per-column frequency ordering,
    # so the fitted model is identical)
    indexers = [
        StringIndexer(
            inputCols=list(categorical),
            outputCols=[f"{c}_idx" for c in categorical],
            handleInvalid="keep",
        )
    ]
    ohe = OneHotEncoder(
        inputCols=[f"{c}_idx" for c in categorical],
        outputCols=[f"{c}_oh" for c in categorical],
        handleInvalid="keep",
    )
    assembler = VectorAssembler(
        inputCols=[f"{c}_oh" for c in categorical] + numeric,
        outputCol="features",
        handleInvalid="keep",
    )
    gbt = GBTClassifier(
        labelCol=label,
        featuresCol="features",
        maxIter=max_iter,
        maxDepth=max_depth,
        seed=seed,
    )
    return Pipeline(stages=[*indexers, ohe, assembler, gbt])


def train(df: DataFrame, **kwargs) -> PipelineModel:
    return build_pipeline(**kwargs).fit(df)


def score(
    model: PipelineModel, df: DataFrame, threshold: float = DEFAULT_THRESHOLD
) -> DataFrame:
    """U2 (streamlit_frontend.py:2274-2298): P(hit-run) with the custom
    decision threshold — ``prob >= threshold → 1`` — distributed, the
    vector columns dropped at the edge."""
    scored = model.transform(df)
    prob = vector_to_array(F.col("probability"))[1]
    keep = [c for c in df.columns]
    return scored.select(
        *keep,
        F.round(prob, 6).alias("hit_run_prob"),
        (prob >= F.lit(threshold)).cast("int").alias("hit_run_pred"),
    )


def evaluate(df: DataFrame, label_col: str = LABEL, pred_col: str = "hit_run_pred") -> dict:
    """A18 (streamlit_frontend.py:2354-2405): confusion matrix +
    accuracy/precision/recall/F1 as ONE aggregate pass — four counts
    collected, scalars derived driver-side."""
    y, p = F.col(label_col), F.col(pred_col)
    row = df.agg(
        F.sum(((y == 1) & (p == 1)).cast("long")).alias("tp"),
        F.sum(((y == 0) & (p == 1)).cast("long")).alias("fp"),
        F.sum(((y == 1) & (p == 0)).cast("long")).alias("fn"),
        F.sum(((y == 0) & (p == 0)).cast("long")).alias("tn"),
    ).first()
    tp, fp, fn, tn = (row[k] or 0 for k in ("tp", "fp", "fn", "tn"))
    total = tp + fp + fn + tn
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "tn": tn,
        "accuracy": (tp + tn) / total if total else 0.0,
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "n": total,
    }


# -- U3: artifact + metadata persistence (model_metadata.json analog) -----


def save_model(model: PipelineModel, path: str, metadata: dict) -> None:
    model.write().overwrite().save(os.path.join(path, "model"))
    with open(os.path.join(path, "metadata.json"), "w") as f:
        json.dump(metadata, f, indent=2)


def load_model(path: str) -> tuple[PipelineModel, dict]:
    model = PipelineModel.load(os.path.join(path, "model"))
    with open(os.path.join(path, "metadata.json")) as f:
        return model, json.load(f)


def default_metadata(threshold: float, metrics: dict) -> dict:
    """Shape-parity with the reference's model_metadata.json: feature
    names, decision threshold, test metrics."""
    return {
        "feature_names": FEATURES_CATEGORICAL + FEATURES_NUMERIC,
        "label": LABEL,
        "threshold": threshold,
        "test_metrics": {
            k: metrics[k] for k in ("accuracy", "precision", "recall", "f1")
        },
        "model_type": "spark_ml_gbt",
    }
