"""r14 scale probe: ONE semantic_ingest_round end-to-end over a
1M-vector / 1,000-cluster IVF index — the embeddings twin of the r13
minhash round probe (scripts/probe_round_1m.py), publishing the
round's own ``secs`` decomposition (probe / within / survivors /
append / compact) at real cluster densities, plus the exactly-once
ledger overhead measured beside the plain round.

Fixture shape (mirrors the minhash probe's):
- 1M-vector corpus whose last 1,000 ids are planted exact clones of
  its first 1,000 (real duplicate structure in the index);
- round-1 batch: 10,000 new vectors + 100 exact clones of corpus
  vectors (must drop through the index) + 10 within-batch clone pairs
  (the min-id member must survive, its twin drop);
- round 2 runs the SAME shape with fresh vectors under ``txn`` on the
  mutated index, so the 1M staged-move ledger overhead (replay_check
  / ledger / compact) is measured beside round 1's plain split; a
  manual replay of round 2's txn id must report skipped_replay with
  an identical survivor count.

Both rounds run the production verify (batched matmul at 1,000
clusters via verify="auto") at n_probe=4 — exact-duplicate recall is
probe-independent (identical vectors share a nearest centroid), which
is precisely what the planted gates check.

Run: python scripts/probe_semantic_round_1m.py [workdir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from chicago_crash_data_pipeline_dashboard_spark.operators import similarity as SIM  # noqa: E402
from chicago_crash_data_pipeline_dashboard_spark.session import get_spark  # noqa: E402

N = 1_000_000
DIM = 64
N_CLUSTERS = 1_000
N_CORPUS_CLONES = 1_000
BATCH_NEW = 10_000
N_CROSS_CLONES = 100
N_WITHIN_PAIRS = 10
N_PROBE = 4


def build_vectors(spark, path: str, n_rows: int, start: int = 0):
    import numpy as np
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].values
            rs = np.random.RandomState(int(ids[0]) % (2**31))
            vecs = rs.standard_normal((len(ids), DIM)).astype("float32")
            yield pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})

    (
        spark.range(start, start + n_rows)
        .repartition(32 if n_rows >= N else 4)
        .mapInPandas(gen, "vec_id long, embedding array<float>")
        .write.mode("overwrite")
        .parquet(path)
    )


def make_batch(spark, raw: str, base: str, new_start: int, tag: int):
    """BATCH_NEW fresh vectors + N_CROSS_CLONES exact corpus clones +
    N_WITHIN_PAIRS within-batch clone pairs, under a per-round id
    range. Returns (batch, cross_ids, within_drop_ids)."""
    fresh = (
        spark.read.parquet(raw)
        .filter(
            (F.col("vec_id") >= new_start)
            & (F.col("vec_id") < new_start + BATCH_NEW)
        )
    )
    cross = (
        spark.read.parquet(base)
        .filter(F.col("vec_id") % (N // N_CROSS_CLONES) == 11)
        .limit(N_CROSS_CLONES)
        .select((F.col("vec_id") + tag * 10 * N).alias("vec_id"), "embedding")
    )
    # within pairs: clone the first N_WITHIN_PAIRS fresh vectors under
    # HIGHER ids — min-id member (the original) survives, the twin drops
    within_twins = (
        fresh.orderBy("vec_id")
        .limit(N_WITHIN_PAIRS)
        .select((F.col("vec_id") + tag * 20 * N).alias("vec_id"), "embedding")
    )
    batch = fresh.unionByName(cross).unionByName(within_twins)
    cross_ids = {r.vec_id for r in cross.select("vec_id").collect()}
    twin_ids = {r.vec_id for r in within_twins.select("vec_id").collect()}
    return batch, cross_ids, twin_ids


def check(rep, cross_ids, twin_ids, label):
    surv = {r.vec_id for r in rep["survivors"].select("vec_id").collect()}
    leaked = sorted(surv & cross_ids)
    assert not leaked, f"{label}: corpus clones survived: {leaked[:5]}"
    twin_leaked = sorted(surv & twin_ids)
    assert not twin_leaked, f"{label}: within twins survived: {twin_leaked[:5]}"
    expect = BATCH_NEW  # fresh vectors all survive; clones+twins drop
    assert rep["n_survivors"] == expect, (
        f"{label}: {rep['n_survivors']} survivors, expected {expect}"
    )
    assert rep["n_cross_pairs"] >= N_CROSS_CLONES, (
        f"{label}: {rep['n_cross_pairs']} cross pairs < {N_CROSS_CLONES} plants"
    )
    assert rep["n_within_pairs"] >= N_WITHIN_PAIRS, (
        f"{label}: {rep['n_within_pairs']} within pairs < {N_WITHIN_PAIRS} plants"
    )


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="ccpd_semr1m_")
    spark = get_spark(app_name="semantic_round_1m_probe")
    print(f"workdir: {work}  loadavg_start: {os.getloadavg()}", flush=True)

    raw = f"{work}/vectors"
    if not os.path.exists(f"{raw}/_SUCCESS"):
        t0 = time.perf_counter()
        build_vectors(spark, raw, N + 2 * BATCH_NEW)
        print(f"vectors built: {time.perf_counter() - t0:.1f}s", flush=True)

    # corpus = first N-1000 vectors + 1000 clones of ids 0..999 at the
    # top id range (real duplicate structure inside the index)
    base = f"{work}/corpus"
    if not os.path.exists(f"{base}/_SUCCESS"):
        docs = spark.read.parquet(raw)
        corpus = (
            docs.filter(F.col("vec_id") < N - N_CORPUS_CLONES)
            .unionByName(
                docs.filter(F.col("vec_id") < N_CORPUS_CLONES).select(
                    (F.col("vec_id") + (N - N_CORPUS_CLONES)).alias("vec_id"),
                    "embedding",
                )
            )
        )
        corpus.write.mode("overwrite").parquet(base)

    index = f"{work}/ivf"
    t0 = time.perf_counter()
    SIM.write_ivf_index(
        spark.read.parquet(base), index, n_clusters=N_CLUSTERS, seed=42,
        files_per_cluster=1,
    )
    print(f"index built ({N_CLUSTERS} clusters): "
          f"{time.perf_counter() - t0:.1f}s", flush=True)

    # round 1: PLAIN — the per-step split
    b1, cross1, twins1 = make_batch(spark, raw, base, N, tag=1)
    t0 = time.perf_counter()
    rep1 = SIM.semantic_ingest_round(b1, index, threshold=0.99, n_probe=N_PROBE)
    t1 = time.perf_counter() - t0
    check(rep1, cross1, twins1, "round1")
    print(f"round 1 (plain): {t1:.1f}s  secs={rep1['secs']}  "
          f"cross={rep1['n_cross_pairs']} within={rep1['n_within_pairs']} "
          f"surv={rep1['n_survivors']} compacted={rep1['compacted']}", flush=True)

    # round 2: SAME shape, fresh vectors, under txn on the mutated index
    b2, cross2, twins2 = make_batch(spark, raw, base, N + BATCH_NEW, tag=2)
    t0 = time.perf_counter()
    rep2 = SIM.semantic_ingest_round(
        b2, index, threshold=0.99, n_probe=N_PROBE, txn="probe-b2"
    )
    t2 = time.perf_counter() - t0
    check(rep2, cross2, twins2, "round2")
    assert rep2["action"] == "appended", rep2["action"]
    print(f"round 2 (txn):   {t2:.1f}s  secs={rep2['secs']}  "
          f"surv={rep2['n_survivors']} action={rep2['action']}", flush=True)

    # replay of the committed round: no-op, identical survivor count
    t0 = time.perf_counter()
    rep3 = SIM.semantic_ingest_round(
        b2, index, threshold=0.99, n_probe=N_PROBE, txn="probe-b2"
    )
    t3 = time.perf_counter() - t0
    assert rep3["action"] == "skipped_replay", rep3["action"]
    assert rep3["n_survivors"] == rep2["n_survivors"]
    print(f"replay:          {t3:.1f}s  action={rep3['action']}", flush=True)

    print(f"txn overhead: {t2 - t1:+.1f}s vs plain "
          f"({t2 / t1:.2f}x)  loadavg_end: {os.getloadavg()}", flush=True)


if __name__ == "__main__":
    main()
