"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real implementation lives in
``chicago_crash_data_pipeline_dashboard_spark``; this module only
adapts the query registry to the driver's calling convention.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from chicago_crash_data_pipeline_dashboard_spark.plans import QUERIES  # noqa: E402
from chicago_crash_data_pipeline_dashboard_spark.plans import analytics  # noqa: F401,E402
from chicago_crash_data_pipeline_dashboard_spark.plans import crash_ops  # noqa: F401,E402
from chicago_crash_data_pipeline_dashboard_spark.plans import llm_ops  # noqa: F401,E402
from chicago_crash_data_pipeline_dashboard_spark.plans import ml_ops  # noqa: F401,E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["pricing_summary"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
