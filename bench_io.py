#!/usr/bin/env python
"""Spark-only timings for the file-round-trip gates the latency bench
skips (side-effectful writes + read-backs: gzip-JSON pipeline, ORC,
bucketed tables, schema evolution, dynamic partition overwrite,
binaryFile ingest, catalog probes, IVF index at rest). These are
correctness-gated every round but were never timed — this artifact
exists so an I/O-path regression can't hide (VERDICT r4 item 8).

No oracle comparison and no DuckDB twin: the numbers are Spark
wall-clock only, not part of the 2x gate vs BASELINE_BENCH.json.

Prints ONE JSON line: {"metric": "io_total_median_query_seconds",
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

# Every non-streaming member of bench.py's SKIP set: file round-trips
# and driver-side catalog probes. Streaming gates stay out — they time
# micro-batch machinery, not an I/O path.
IO_QUERIES = [
    "pipeline_e2e",
    "compact_small_files",
    "orc_roundtrip_stats",
    "bucketed_join_agg",
    "schema_evolution_merge",
    "json_malformed_ingest",
    "partition_overwrite_dynamic",
    "binary_file_ingest",
    "silver_catalog_validate",
    "emb_ivf_pruned",
    "emb_pq_pruned",
    "emb_ivfpq_pruned",  # r10: the composed IVF-PQ at-rest index
    "doc_minhash_against_corpus",  # r11: MinHash signatures at rest + cross-run probe
    # loopback-HTTP Socrata fixture round-trip (r9): the cost is the
    # scripted-server plumbing + paged fetch, an ingest path like the
    # rest of this set — not query latency (VERDICT r9 item 3)
    "socrata_paged_scan",
]

RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def _ivfpq_append_gate(spark, sf_dir):
    """r11 (VERDICT r10 item 2): build an IVF-PQ index on 80% of the
    embeddings, append the held-out 20% with the SAVED quantizers, and
    probe — timed as the incremental-ingest IO path. Self-gating: the
    probe of the grown index must equal (row-for-row) the probe of a
    full rebuild under the same quantizers, or this raises. Not a
    registered query (the driver sample is full this round); the
    operator-level parity lives in tests/test_plans.py."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from chicago_crash_data_pipeline_dashboard_spark.operators import similarity as SIM

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    initial = e.filter(F.col("vec_id") % 5 != 0)
    batch = e.filter(F.col("vec_id") % 5 == 0)
    q = e.filter(F.col("vec_id") < 8)
    tmp = tempfile.mkdtemp(prefix="ccpd_ivfpq_append_")
    try:
        grown = f"{tmp}/grown"
        cents, cb = SIM.write_ivfpq_index(
            initial, grown, n_clusters=16, m=16, ks=16, seed=42
        )
        SIM.append_to_ivfpq_index(batch, grown)
        rebuilt = f"{tmp}/rebuilt"
        SIM.write_ivfpq_index(e, rebuilt, quantizers=(cents, cb))
        got = SIM.ivfpq_topk_indexed(spark, grown, q, k=5, n_probe=4, refine=8)
        want = SIM.ivfpq_topk_indexed(spark, rebuilt, q, k=5, n_probe=4, refine=8)
        g, w = sorted(map(tuple, got.collect())), sorted(map(tuple, want.collect()))
        if g != w:
            raise AssertionError("append-grown probe diverged from same-quantizer rebuild")
        return got.sparkSession.createDataFrame(g, got.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _index_compact_gate(spark, sf_dir):
    """r11: the append-maintenance loop closed — build an IVF index on
    70% of the embeddings, grow it with three appends under the saved
    quantizer, then compact_index rewrites ONLY the bloated cluster
    partitions (no quantizer math). Self-gating: probe results before
    and after compaction must be identical, every cluster must be back
    at one file, and at least one cluster must actually have been
    rewritten — or this raises. Timed as the index-maintenance IO
    path (build + appends + compact + two probes)."""
    import glob as globmod
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from chicago_crash_data_pipeline_dashboard_spark.operators import similarity as SIM

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    tmp = tempfile.mkdtemp(prefix="ccpd_index_compact_")
    try:
        path = f"{tmp}/ivf"
        SIM.write_ivf_index(e.filter(F.col("vec_id") % 10 > 2), path, n_clusters=16, seed=42)
        for r in (0, 1, 2):
            SIM.append_to_ivf_index(e.filter(F.col("vec_id") % 10 == r), path)
        q = e.filter(F.col("vec_id") < 8)
        before = sorted(map(tuple, SIM.ivf_topk_indexed(spark, path, q, k=5, n_probe=4).collect()))
        stats = SIM.compact_index(spark, path, files_per_cluster=1)
        if stats["clusters_compacted"] < 1:
            raise AssertionError("appends produced nothing to compact — gate is vacuous")
        bad = [
            d for d in globmod.glob(f"{path}/_cluster=*")
            if len(globmod.glob(f"{d}/*.parquet")) != 1
        ]
        if bad:
            raise AssertionError(f"clusters above the file bound after compaction: {bad}")
        got = SIM.ivf_topk_indexed(spark, path, q, k=5, n_probe=4)
        after = sorted(map(tuple, got.collect()))
        if before != after:
            raise AssertionError("compaction changed probe results")
        return got.sparkSession.createDataFrame(after, got.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# Self-gating IO paths timed alongside the registered IO queries but
# NOT part of the driver registry (tests/test_bench_contract.py pins
# IO_QUERIES == bench.SKIP minus streaming; these are extra).
def _ingest_round_gate(spark, sf_dir):
    """r11: the one-call cross-run dedup round (minhash_ingest_round)
    timed end-to-end — signature table on 80% of the documents, then a
    batch of the held-out 20% plus 50 planted clones of ingested docs
    goes through probe → ingest survivor policy → survivors-only
    append. Self-gating: every planted clone must drop, and the
    survivor count must equal the batch minus the clones minus the
    batch's own internal dups (computed from the round's reported pair
    counts being nonzero) — or this raises."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from chicago_crash_data_pipeline_dashboard_spark.operators import dedup as DD

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    held_out = docs.filter(F.col("doc_id") % 5 == 0)
    # deterministic 50 clones (ids 1..62 minus multiples of 5) — a bare
    # limit() can pick different rows across the frame's re-evaluations
    clones = corpus.filter(F.col("doc_id") < 63).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    batch = held_out.unionByName(clones)
    tmp = tempfile.mkdtemp(prefix="ccpd_ingest_round_")
    try:
        sigs = f"{tmp}/sigs"
        DD.write_minhash_signatures(
            corpus, sigs, "doc_id", "text",
            num_hashes=64, bands=16, shingle_n=3, seed=42, parts=32,
        )
        rep = DD.minhash_ingest_round(batch, sigs, "doc_id", "text", threshold=0.99)
        surv = rep["survivors"]
        clone_survivors = surv.filter(F.col("doc_id") >= 10_000_000).count()
        if clone_survivors != 0:
            raise AssertionError(f"{clone_survivors} planted clones survived the round")
        if rep["n_cross_pairs"] < 50:
            raise AssertionError("planted clones did not all pair against the corpus")
        if rep["n_survivors"] == 0:
            raise AssertionError("round dropped everything — gate is vacuous")
        return surv.select("doc_id")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


IO_EXTRA = {
    "emb_ivfpq_append": _ivfpq_append_gate,
    "emb_index_compact": _index_compact_gate,
    "doc_ingest_round": _ingest_round_gate,
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark(app_name="ccpd_bench_io")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()  # JVM warm-up

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    runnables = [(n, QUERIES[n].fn) for n in IO_QUERIES] + list(IO_EXTRA.items())
    for name, fn in runnables:
        samples = []
        try:
            for _ in range(RUNS):
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                samples.append(time.perf_counter() - t0)
            timings[name] = round(statistics.median(samples), 4)
        except Exception as exc:  # noqa: BLE001 — harness boundary
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]

    out = {
        "metric": "io_total_median_query_seconds",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "runs": RUNS,
        "n_queries": len(timings),
        "complete": not errors,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
