#!/usr/bin/env python
"""Split each timed query's wall into PLAN-BUILD time (fn(): driver
Python — quantizer training, iterative CC, ML fits) vs EXECUTE time
(noop write of the returned frame). Median of RUNS runs each.

Usage: PROFILE_ONLY='regex' python scripts/profile_queries.py
"""
from __future__ import annotations

import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from chicago_crash_data_pipeline_dashboard_spark.plans import QUERIES  # noqa: E402
from chicago_crash_data_pipeline_dashboard_spark.session import get_spark  # noqa: E402

RUNS = int(os.environ.get("PROFILE_RUNS", "3"))


def main() -> None:
    only = os.environ.get("PROFILE_ONLY")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ccpd_profile")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    import pandas as _pd

    spark.range(8).mapInPandas(
        lambda it: (_pd.DataFrame({"id": b["id"]}) for b in it), "id long"
    ).count()

    print(f"{'query':<32} {'build':>8} {'exec':>8} {'total':>8}")
    for name, spec in sorted(QUERIES.items()):
        if name in bench.SKIP:
            continue
        if only and not re.search(only, name):
            continue
        builds, execs = [], []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        b, e = statistics.median(builds), statistics.median(execs)
        print(f"{name:<32} {b:8.3f} {e:8.3f} {b + e:8.3f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
