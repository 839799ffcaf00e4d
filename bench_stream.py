#!/usr/bin/env python
"""Spark-only timings for the streaming gates the latency bench skips
(micro-batch Structured Streaming machinery: watermarked windows,
session windows, stream-stream interval joins, streaming dedup, the
checkpointed ingest e2e). These are correctness-gated every round but
their wall-clock was never recorded anywhere — this artifact completes
the classification VERDICT r6 item 8 asked for: every registered query
is latency-benched (bench.py), IO-benched (bench_io.py), or
stream-benched here.

What the number MEANS: end-to-end wall-clock of a bounded
``availableNow``/memory-sink micro-batch run at the gate's SF —
dominated by per-batch fixed costs (trigger scheduling, state-store
init, checkpoint IO), not by data volume. It is a REGRESSION TRIPWIRE
for the streaming machinery (a state-store misconfiguration or an
accidental extra batch shows up as a step change), not a throughput
claim; streaming throughput at scale is governed by the same shuffle/
state plans the batch twins measure.

No oracle comparison and no DuckDB twin (DuckDB has no streaming
runtime): Spark wall-clock only, not part of the 2x gate vs
BASELINE_BENCH.json.

Prints ONE JSON line: {"metric": "stream_total_median_query_seconds",
"value": N, "unit": "sec", "queries": {...}, "sf": ..., "runs": N}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from chicago_crash_data_pipeline_dashboard_spark.plans import (  # noqa: F401
    QUERIES,
    analytics,
    crash_ops,
    jobspec_ops,
    llm_ops,
    ml_ops,
)
from chicago_crash_data_pipeline_dashboard_spark.session import get_spark

# Every streaming member of bench.py's SKIP set.
STREAM_QUERIES = [
    "event_windowed_counts_stream",
    "event_sessions_stream",
    "event_sessions_native_stream",
    "event_first_seen_stream",
    "event_dedup_watermark_stream",
    "event_error_click_window_stream",
    "streaming_ingest_e2e",
    "doc_ingest_stream",  # r12: the streamed cross-run dedup round
    # r13: the txn ledger extended to the fingerprint + SimHash
    # families — their streamed rounds
    "doc_exact_ingest_stream",
    "doc_simhash_ingest_stream",
    # r14: the embeddings family joins — streamed semantic ingest round
    # + the streamed ANN maintenance drain under the same ledger
    "emb_semantic_ingest_stream",
    "emb_maintain_stream",
]

RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    # Per-gate FRESH session (VERDICT r11 item 7 / r12 item 4): the r11
    # decomposition proved per-gate costs in one long-lived session are
    # dominated by session accumulation (12.3 s benched vs 3.6-4.2 s
    # fresh for the same gate), so a real plan regression could hide in
    # the session-noise band and round-to-round numbers weren't
    # comparable. Each gate now gets its own SparkSession (stopped and
    # rebuilt, state stores and codegen caches cleared), warmed by one
    # parquet count; the recorded median is the gate's own cost, not
    # its position in the run order. session_split records the fresh
    # first run vs the warm in-session median so the remaining
    # warm-up share stays visible per gate.
    timings: dict[str, float] = {}
    session_split: dict[str, dict] = {}
    errors: dict[str, str] = {}
    spark = None
    for name in STREAM_QUERIES:
        if spark is not None:
            spark.stop()
        spark = get_spark(app_name=f"ccpd_bench_stream_{name}")
        spark.read.parquet(f"{sf_dir}/events.parquet").count()  # warm-up
        samples = []
        try:
            for _ in range(RUNS):
                t0 = time.perf_counter()
                df = QUERIES[name].fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                samples.append(time.perf_counter() - t0)
            timings[name] = round(statistics.median(samples), 4)
            session_split[name] = {
                "fresh_first_run": round(samples[0], 4),
                # honest at RUNS=1: there ARE no warm samples
                "warm_median": round(statistics.median(samples[1:]), 4)
                if len(samples) > 1
                else None,
            }
        except Exception as exc:  # noqa: BLE001 — harness boundary
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]

    # Decompose the ingest gate's number into per-drain fixed cost vs
    # rows/s so the artifact explains itself (VERDICT r7 item 7: the
    # ~16 s streaming_ingest_e2e reading is dominated by three
    # stream start/stops + checkpoint IO, not by data volume)
    notes: dict[str, dict] = {
        "methodology": {
            "per_gate_fresh_session": True,
            "note": "each gate timed in its own SparkSession (r13): "
            "context-level state resets per gate, so medians are "
            "position-independent at the session level; the JVM itself "
            "persists across gates in local mode (JIT/heap history "
            "carries over, bounded by ReservedCodeCacheSize=1g + "
            "flushing), so residual order effects are damped, not zero. "
            "Pre-r13 artifacts ran one long-lived session and carried "
            "full accumulation — compare r13+ numbers only within this "
            "era.",
        },
        "session_split": session_split,
    }
    try:
        from chicago_crash_data_pipeline_dashboard_spark.plans.crash_ops import (
            streaming_ingest_throughput_probe,
        )

        notes["ingest_throughput"] = streaming_ingest_throughput_probe(spark, sf_dir)
    except Exception as exc:  # noqa: BLE001 — harness boundary
        notes["ingest_throughput"] = {"error": f"{type(exc).__name__}: {exc}"[:300]}

    # r11 (VERDICT r10 item 6): decompose the dominant windowed-count
    # gate — batch-twin plan cost vs stream start/stop vs full drain
    try:
        from chicago_crash_data_pipeline_dashboard_spark.plans.analytics import (
            windowed_stream_cost_probe,
        )

        notes["windowed_counts_cost"] = windowed_stream_cost_probe(spark, sf_dir)
    except Exception as exc:  # noqa: BLE001 — harness boundary
        notes["windowed_counts_cost"] = {"error": f"{type(exc).__name__}: {exc}"[:300]}

    # totals LAST so a tail-truncated artifact keeps them; notes go to
    # the SELF twin only (r16, VERDICT r15 item 2: oversized stdout
    # lines defeated the driver's 2,000-char artifact tail)
    out = {"queries": timings}
    if errors:
        out["errors"] = errors
    out.update(
        metric="stream_total_median_query_seconds",
        unit="sec",
        sf=sf,
        runs=RUNS,
        value=round(sum(timings.values()), 4),
        n_queries=len(timings),
        complete=not errors,
    )
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_STREAM_SELF.json"), "w"
        ) as f:
            f.write(json.dumps({**out, "notes": notes}) + "\n")
    except OSError:
        pass  # read-only checkout: stdout remains the artifact
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
