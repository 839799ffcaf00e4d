"""As-of join semantics (operators/asof.py) against hand-computed
expectations, plus the tf-idf cosine dedup on a tiny corpus.

The registered queries (`event_asof_last_click`,
`doc_tfidf_cosine_pairs`) go through the full differential oracle in
test_analytics_oracle.py; these tests pin the operator-level edge
cases the synthetic tables may not cover (exact-tie timestamps, no
prior right row, duplicate right keys).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from chicago_crash_data_pipeline_dashboard_spark.operators.asof import asof_join
from chicago_crash_data_pipeline_dashboard_spark.operators.dedup import tfidf_cosine_pairs


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def asof_frames(spark):
    left = spark.createDataFrame(
        [
            (1, 100, _ts("2024-01-01T10:00:00")),  # before any right row
            (2, 100, _ts("2024-01-01T12:00:00")),  # after r@11:00
            (3, 100, _ts("2024-01-01T13:00:00")),  # exact tie with r@13:00
            (4, 200, _ts("2024-01-01T12:00:00")),  # other key
            (5, 300, _ts("2024-01-01T12:00:00")),  # key with no right rows
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, _ts("2024-01-01T11:00:00"), 1.0),
            (100, _ts("2024-01-01T13:00:00"), 2.0),
            (100, _ts("2024-01-01T13:00:00"), 3.0),  # dup (by, on): keep max value
            (200, _ts("2024-01-01T11:30:00"), 9.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    return left, right


def test_asof_join_semantics(asof_frames):
    left, right = asof_frames
    out = asof_join(left, right, on="ts", by="user_id", value_cols=["value"])
    rows = {r["event_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4, 5}
    # no prior right row -> nulls
    assert rows[1]["ts_right"] is None and rows[1]["value_right"] is None
    # strictly-before match
    assert rows[2]["ts_right"] == _ts("2024-01-01T11:00:00")
    assert rows[2]["value_right"] == 1.0
    # exact tie is visible; duplicate (by, on) deduped to max value
    assert rows[3]["ts_right"] == _ts("2024-01-01T13:00:00")
    assert rows[3]["value_right"] == 3.0
    # keys do not leak across groups
    assert rows[4]["value_right"] == 9.0
    assert rows[5]["ts_right"] is None


def test_asof_join_preserves_left_rowcount(asof_frames):
    left, right = asof_frames
    out = asof_join(left, right, on="ts", by="user_id", value_cols=["value"])
    assert out.count() == left.count()


def test_tfidf_identical_docs_score_one(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),
            (3, "completely different words here"),
            (4, "unrelated text entirely now"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_cosine_pairs(docs, "doc_id", "text", threshold=0.5, max_df=10).collect()
    assert len(out) == 1
    row = out[0]
    assert (row["doc_a"], row["doc_b"]) == (1, 2)
    assert row["cosine"] == pytest.approx(1.0, abs=1e-6)


def test_tfidf_disjoint_docs_no_pairs(spark):
    docs = spark.createDataFrame(
        [(1, "aa bb cc"), (2, "dd ee ff")],
        "doc_id long, text string",
    )
    assert tfidf_cosine_pairs(docs, "doc_id", "text", threshold=0.1, max_df=10).count() == 0


def test_asof_join_null_value_cols_no_chimera(spark):
    """A right row whose value column is NULL must be carried AS the
    match (genuine NULL), not skipped in favor of an older row's value
    — carrying columns independently would stitch together a 'chimera'
    row mixing fields from different right rows (DuckDB ASOF keeps the
    whole latest row, NULLs included)."""
    left = spark.createDataFrame(
        [(1, 100, 30)], "event_id long, user_id long, t long"
    )
    right = spark.createDataFrame(
        [
            (100, 10, 1.0, "x"),      # older row: both cols set
            (100, 20, None, "y"),     # latest row: a NULL, b set
        ],
        "user_id long, t long, a double, b string",
    )
    out = asof_join(left, right, on="t", by="user_id", value_cols=["a", "b"]).collect()
    assert len(out) == 1
    row = out[0]
    assert row["t_right"] == 20
    assert row["a_right"] is None  # NOT 1.0 from the older row
    assert row["b_right"] == "y"


def test_asof_join_all_null_right_row(spark):
    """Even a right row with ALL value columns NULL is still 'the most
    recent right row' and must win over earlier non-null rows."""
    left = spark.createDataFrame([(1, 7, 100)], "event_id long, k long, t long")
    right = spark.createDataFrame(
        [(7, 10, 5.0), (7, 50, None)], "k long, t long, v double"
    )
    out = asof_join(left, right, on="t", by="k", value_cols=["v"]).collect()
    assert out[0]["t_right"] == 50
    assert out[0]["v_right"] is None
