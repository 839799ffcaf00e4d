#!/usr/bin/env python
"""Interleaved A/B: r15 ``bulk_rename`` (one held FileSystem handle)
vs the r14 per-file helper move loop, on the biggest ledger-driven
stream gates (VERDICT r15 item 1: BENCH_STREAM rose 122.8 -> 140.4 s
in r15 with no interleaved A/B on record for the stream set).

Runs old,new,old,new... within ONE session per gate so host drift
hits both forms equally; prints per-pair wins and medians plus the
loadavg/steal bracket so a contention verdict is self-evidencing.

Usage: AB_PAIRS=3 python scripts/ab_bulk_rename_stream.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chicago_crash_data_pipeline_dashboard_spark.plans import (  # noqa: F401
    QUERIES,
    analytics,
    crash_ops,
    jobspec_ops,
    llm_ops,
    ml_ops,
)
from chicago_crash_data_pipeline_dashboard_spark.session import get_spark  # noqa: E402
from chicago_crash_data_pipeline_dashboard_spark.sources import fsutil as FS  # noqa: E402

NEW_BULK_RENAME = FS.bulk_rename


def old_bulk_rename(pairs, spark=None, skip_existing=False):
    """Faithful r14 move loop: per-file exists + mkdirs + rename, each
    through the module helpers (FileSystem re-resolved per call)."""
    moved = 0
    made: set[str] = set()
    for src, dst in pairs:
        if FS.exists(dst):
            continue
        parent = dst.rsplit("/", 1)[0]
        if parent not in made:
            FS.mkdirs(parent)
            made.add(parent)
        FS.rename(src, dst)
        moved += 1
    return moved


def steal_jiffies() -> int:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    return int(parts[8]) if len(parts) > 8 else 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    gates = os.environ.get(
        "AB_GATES", "doc_simhash_ingest_stream,doc_ingest_stream,doc_exact_ingest_stream"
    ).split(",")
    pairs = int(os.environ.get("AB_PAIRS", "3"))
    load0, steal0, t_wall0 = os.getloadavg(), steal_jiffies(), time.time()
    print(f"loadavg start {[round(v, 2) for v in load0]}")

    for gate in gates:
        spark = get_spark(app_name=f"ab_bulk_rename_{gate}")
        spark.read.parquet(f"{sf_dir}/events.parquet").count()  # warm-up
        res: dict[str, list[float]] = {"old": [], "new": []}
        for i in range(pairs):
            for mode in ("old", "new") if i % 2 == 0 else ("new", "old"):
                FS.bulk_rename = old_bulk_rename if mode == "old" else NEW_BULK_RENAME
                t0 = time.perf_counter()
                df = QUERIES[gate].fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                res[mode].append(time.perf_counter() - t0)
        FS.bulk_rename = NEW_BULK_RENAME
        wins = sum(1 for o, n in zip(res["old"], res["new"]) if n < o)
        print(
            f"{gate}: old={[round(v, 3) for v in res['old']]} "
            f"new={[round(v, 3) for v in res['new']]} "
            f"median old={statistics.median(res['old']):.3f} "
            f"new={statistics.median(res['new']):.3f} "
            f"new wins {wins}/{pairs} pairs",
            flush=True,
        )
        spark.stop()

    dt = time.time() - t_wall0
    steal_pct = 100.0 * (steal_jiffies() - steal0) / (dt * os.cpu_count() * 100.0)
    print(
        f"loadavg end {[round(v, 2) for v in os.getloadavg()]} "
        f"steal over run ~{steal_pct:.2f}% of cpu-time"
    )


if __name__ == "__main__":
    main()
