"""Differential tests: every registered query vs its DuckDB oracle at sf0.01."""

from __future__ import annotations

import pytest

from chicago_crash_data_pipeline_dashboard_spark.plans import QUERIES
from chicago_crash_data_pipeline_dashboard_spark.plans import analytics  # noqa: F401
from chicago_crash_data_pipeline_dashboard_spark.plans import crash_ops  # noqa: F401
from chicago_crash_data_pipeline_dashboard_spark.plans import jobspec_ops  # noqa: F401
from chicago_crash_data_pipeline_dashboard_spark.plans import llm_ops  # noqa: F401
from chicago_crash_data_pipeline_dashboard_spark.plans import ml_ops  # noqa: F401

from .oracle_harness import compare

SQL_BACKED = [name for name, spec in QUERIES.items() if spec.oracle is not None]


@pytest.mark.parametrize("name", SQL_BACKED)
def test_query_matches_oracle(spark, sf_oracle, name):
    spec = QUERIES[name]
    df = spec.fn(spark, sf_oracle)
    ok, msg = compare(df, spec.oracle, sf_oracle)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns


def test_registry_contract():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 10
