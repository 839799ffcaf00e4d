"""r13 scale probe (VERDICT r12 item 6 / r11 item 4): ONE
minhash_ingest_round end-to-end over a 1M-doc signature table WITH the
standing-cluster fold wired (``comp_path``), publishing the round's own
``secs`` decomposition (probe / within / survivors / extend / append /
compact) at real bucket densities — the r12 measurement stopped at a
100k corpus and had no components table.

Fixture shape:
- 1M-doc corpus whose last 1,000 ids are planted clones of its first
  1,000 (real duplicate structure -> the comp table isn't empty and
  probe buckets carry genuine density);
- the standing component table holds those 1,000 clone pairs
  (write_components, parts=4096 — over the operator's
  ~20x-touched-comps sizing rule for a 100-clone batch, which touches
  ~110 standing comps through the clones' corpus twins);
- batch: 1,000 new docs + 100 clones of comp-member corpus docs (the
  fold must extend standing clusters, not create fresh ones) + 10
  within-batch clone pairs.

Round 1 runs PLAIN (the per-step split the verdict asked for); round 2
runs the SAME shape under ``txn`` on the mutated table, so the 1M
exactly-once ledger overhead (replay_check / ledger / compact) is
measured beside it. Gates: every planted cross clone drops, within
clones collapse, the fold reports touched standing comps.

Run: python scripts/probe_round_1m.py [workdir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from chicago_crash_data_pipeline_dashboard_spark.operators import dedup as DD  # noqa: E402
from chicago_crash_data_pipeline_dashboard_spark.operators.graph import (  # noqa: E402
    connected_components,
    write_components,
)
from chicago_crash_data_pipeline_dashboard_spark.session import get_spark  # noqa: E402

N = 1_000_000
N_CORPUS_CLONES = 1_000
SIG = dict(num_hashes=64, bands=16, shingle_n=3, seed=42, hash_mode="murmur3")
PARTS, FILES_PER_PART = 64, 4
COMP_PARTS = 4_096
BATCH_NEW, BATCH_CLONES, BATCH_WITHIN = 1_000, 100, 10
CLONE_OFFSET = 10_000_000


def build_docs(spark, path: str, n: int):
    import numpy as np
    import pandas as pd

    vocab = [f"w{i:04d}" for i in range(1000)]

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].values
            rs = np.random.RandomState(int(ids[0]) % (2**31))
            texts = [
                " ".join(
                    vocab[t]
                    for t in rs.randint(0, len(vocab), size=rs.randint(50, 150))
                )
                for _ in ids
            ]
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    (
        spark.range(n)
        .repartition(32)
        .mapInPandas(gen, "doc_id long, text string")
        .write.mode("overwrite")
        .parquet(path)
    )


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="ccpd_round1m_")
    spark = get_spark(app_name="round_1m_probe")
    print(f"workdir: {work}", flush=True)

    raw = f"{work}/docs"
    if not os.path.exists(f"{raw}/_SUCCESS"):
        t0 = time.perf_counter()
        # N corpus texts + per-round UNSEEN text ranges (each round
        # needs its own new/within sources: round 1 ingests its
        # survivors, so reusing texts would make round 2 a clone batch)
        build_docs(spark, raw, N + 2 * (BATCH_NEW + BATCH_WITHIN))
        print(f"docs built: {time.perf_counter() - t0:.1f}s", flush=True)
    docs = spark.read.parquet(raw)

    # corpus = first N-1000 docs + 1000 clones of ids 0..999 at the top
    # id range (real duplicate structure inside the corpus)
    base = docs.filter(F.col("doc_id") < N - N_CORPUS_CLONES)
    corpus_clones = docs.filter(F.col("doc_id") < N_CORPUS_CLONES).select(
        (F.col("doc_id") + (N - N_CORPUS_CLONES)).alias("doc_id"), "text"
    )
    corpus = base.unionByName(corpus_clones)

    sig = f"{work}/sigs"
    t0 = time.perf_counter()
    DD.write_minhash_signatures(
        corpus, sig, "doc_id", "text",
        parts=PARTS, files_per_part=FILES_PER_PART, **SIG,
    )
    t_write = time.perf_counter() - t0
    print(f"signature table written (1M docs): {t_write:.1f}s", flush=True)

    # standing clusters: the corpus's planted pairs
    comp = f"{work}/components"
    pair_edges = spark.range(N_CORPUS_CLONES).select(
        F.col("id").alias("src"),
        (F.col("id") + (N - N_CORPUS_CLONES)).alias("dst"),
    )
    t0 = time.perf_counter()
    write_components(connected_components(pair_edges), comp, parts=COMP_PARTS)
    print(f"component table written: {time.perf_counter() - t0:.1f}s", flush=True)

    def make_batch(tag: int):
        # per-round UNSEEN text range (ids >= N): round 1 ingests its
        # survivors, so round 2 must draw fresh texts or it would be a
        # pure clone batch of round 1. Cross clones reuse corpus texts
        # by design (they must drop).
        lo = N + (tag - 1) * (BATCH_NEW + BATCH_WITHIN)
        new = docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + BATCH_NEW)
        ).select((F.col("doc_id") + CLONE_OFFSET * tag).alias("doc_id"), "text")
        cross = docs.filter(F.col("doc_id") < BATCH_CLONES).select(
            (F.col("doc_id") + CLONE_OFFSET * tag + BATCH_NEW).alias("doc_id"),
            "text",
        )
        within = docs.filter(
            (F.col("doc_id") >= lo + BATCH_NEW)
            & (F.col("doc_id") < lo + BATCH_NEW + BATCH_WITHIN)
        ).select((F.col("doc_id") + CLONE_OFFSET * tag).alias("doc_id"), "text")
        within_twin = within.select((F.col("doc_id") + 5000).alias("doc_id"), "text")
        return new.unionByName(cross).unionByName(within).unionByName(within_twin)

    # round 1 (plain) probes the 1M table; round 2 (txn) probes the
    # table grown by round 1's survivors, with fresh unseen texts
    for tag, txn in ((1, None), (2, "probe1m-b2")):
        batch = make_batch(tag).localCheckpoint()
        n_batch = batch.count()
        t0 = time.perf_counter()
        rep = DD.minhash_ingest_round(
            batch, sig, "doc_id", "text",
            comp_path=comp, threshold=0.9, max_bucket=1000, txn=txn,
        )
        total = time.perf_counter() - t0
        label = "txn" if txn else "plain"
        print(
            f"\nround {tag} ({label}, batch {n_batch}): total {total:.1f}s\n"
            f"  secs: {rep['secs']}\n"
            f"  n_cross_pairs={rep['n_cross_pairs']} "
            f"n_within_pairs={rep['n_within_pairs']} "
            f"n_survivors={rep['n_survivors']} compacted={rep['compacted']}\n"
            f"  extended={rep.get('extended')}",
            flush=True,
        )
        surv = {r.doc_id for r in rep["survivors"].select("doc_id").collect()}
        # every cross clone must drop; every within pair collapses to
        # one survivor; new docs all survive
        lo = N + (tag - 1) * (BATCH_NEW + BATCH_WITHIN)
        cross_ids = {CLONE_OFFSET * tag + BATCH_NEW + i for i in range(BATCH_CLONES)}
        leaked = surv & cross_ids
        assert not leaked, f"cross clones survived: {sorted(leaked)[:5]}"
        n_new_kept = len(
            surv & {CLONE_OFFSET * tag + lo + i for i in range(BATCH_NEW)}
        )
        assert rep["n_survivors"] == n_new_kept + BATCH_WITHIN, (
            rep["n_survivors"], n_new_kept,
        )
        ext = rep.get("extended")
        assert ext and ext.get("touched_comps", ext.get("comps_touched", 0)) >= 1, ext

    print("\nPROBE PASSED", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
