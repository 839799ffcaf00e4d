#!/usr/bin/env python
"""Capture .explain("formatted") for every timed latency-set query.

Writes plans/$CAPTURE_ROUND/<query>_<tag>.txt (default r16) for the
optimization round's before/after evidence (tag from argv[1], default
"before").

Only the latency set (bench.py's timed queries) is captured by default:
the IO/stream gates are side-effectful round-trips whose fn() builds
scratch tables — pass --all to include them (slow).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (for SKIP — the timed-set definition)
from chicago_crash_data_pipeline_dashboard_spark.plans import QUERIES  # noqa: E402
from chicago_crash_data_pipeline_dashboard_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    include_all = "--all" in sys.argv
    only = os.environ.get("CAPTURE_ONLY")  # regex filter
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rnd = os.environ.get("CAPTURE_ROUND", "r16")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="ccpd_capture_plans")

    import re

    for name, spec in sorted(QUERIES.items()):
        if not include_all and name in bench.SKIP:
            continue
        if only and not re.search(only, name):
            continue
        try:
            df = spec.fn(spark, sf_dir)
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 — capture harness
            plan = f"CAPTURE ERROR: {type(exc).__name__}: {exc}\n"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(f"captured {name}")
    spark.stop()


if __name__ == "__main__":
    main()
