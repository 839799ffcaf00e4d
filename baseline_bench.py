#!/usr/bin/env python
"""DuckDB baseline timer for the 2x gate (BASELINE.md §3).

Runs every registered oracle SQL (the DuckDB twins of the engine's
query surface) single-process over $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) and prints ONE JSON line mirroring bench.py's
shape, so `BENCH_r{N}.json` can be compared against a checked-in
`BASELINE_BENCH.json` produced by this script on the same machine.

Per-query wall clock is the median of $SPARK_GRAFT_BENCH_RUNS (default
3) warm runs; a query whose FIRST run exceeds $BASELINE_SLOW_CAP_S
(default 60 s) records that single run instead of re-running — the
recursive-CTE cluster oracle is minutes-slow by design and re-running
it would only delay the artifact without changing the conclusion.
Failures are recorded per-query; one bad oracle never zeroes the run.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb

from chicago_crash_data_pipeline_dashboard_spark.plans import QUERIES
from chicago_crash_data_pipeline_dashboard_spark.plans import analytics  # noqa: F401
from chicago_crash_data_pipeline_dashboard_spark.plans import crash_ops  # noqa: F401
from chicago_crash_data_pipeline_dashboard_spark.plans import jobspec_ops  # noqa: F401
from chicago_crash_data_pipeline_dashboard_spark.plans import llm_ops  # noqa: F401
from chicago_crash_data_pipeline_dashboard_spark.plans import ml_ops  # noqa: F401

from tests.oracle_harness import TABLES

# Same exclusions as bench.py (iterative ML training is outside the
# headline query surface) so the two totals cover the SAME query set.
from bench import SKIP

RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
SLOW_CAP_S = float(os.environ.get("BASELINE_SLOW_CAP_S", "60"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, spec in sorted(QUERIES.items()):
        if spec.oracle is None or name in SKIP:
            continue
        if only and not __import__("re").search(only, name):
            continue
        samples = []
        try:
            for i in range(RUNS):
                t0 = time.perf_counter()
                con.execute(spec.oracle).fetchall()
                samples.append(time.perf_counter() - t0)
                if i == 0 and samples[0] > SLOW_CAP_S:
                    break
            timings[name] = round(statistics.median(samples), 4)
        except Exception as exc:  # noqa: BLE001 — harness boundary
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
    con.close()

    out = {
        "metric": "duckdb_total_query_seconds",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "runs": RUNS,
        "n_queries": len(timings),
        "duckdb_version": duckdb.__version__,
        "cpus": os.cpu_count(),
        "complete": not errors,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
