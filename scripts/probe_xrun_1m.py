"""r12 scale probe: the two cross-run dedup families that had no 1M
measurement yet — exact fingerprints (write_fingerprints /
dedup_exact_against) and SimHash segments (write_simhash_index /
simhash_near_duplicates_against) — plus the transactional ingest
round's ledger overhead. The operators' 100-TB claims measured rather
than asserted:

- write cost + file-count discipline for both tables (parts x
  files_per_part, never tasks x parts);
- probe cost for a 1.1k-doc incoming batch against the 1M corpus,
  vs the no-table alternative each table replaces (re-fingerprinting
  the whole corpus from text on every ingest);
- planted exact clones: every one must drop (exact) / surface at
  hamming 0 (SimHash);
- append cost for the deduped batch;
- minhash_ingest_round plain vs txn= on identical 100k-corpus tables:
  the price of exactly-once (staging write + renames + round record)
  over the direct append.

Run: python scripts/probe_xrun_1m.py [workdir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from chicago_crash_data_pipeline_dashboard_spark.operators import dedup as DD  # noqa: E402
from chicago_crash_data_pipeline_dashboard_spark.session import get_spark  # noqa: E402
from chicago_crash_data_pipeline_dashboard_spark.sources import fsutil as FS  # noqa: E402

N = 1_000_000
PARTS, FILES_PER_PART = 64, 4
BATCH_NEW, BATCH_CLONES = 1_000, 100
CLONE_OFFSET = 10_000_000
SIMHASH = dict(bits=64, max_distance=3, hash_mode="murmur3")
ROUND_CORPUS = 100_000
ROUND_SIG = dict(num_hashes=64, bands=16, shingle_n=3, seed=42, hash_mode="murmur3")


def build_docs(spark, path: str, n: int = N):
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


def census(pattern: str) -> tuple[int, int]:
    files = FS.glob_paths(pattern)
    dirs = {f.rsplit("/", 2)[1] for f in files}
    return len(files), len(dirs)


def make_batch(spark, docs):
    """1,000 fresh docs (ids past the corpus) + 100 exact clones of
    corpus docs under CLONE_OFFSET ids."""
    fresh = build_batch_docs(spark)
    clones = (
        docs.filter(F.col("doc_id") % 10_000 == 7)
        .limit(BATCH_CLONES)
        .select((F.col("doc_id") + CLONE_OFFSET).alias("doc_id"), "text")
    )
    return fresh.unionByName(clones)


def build_batch_docs(spark):
    import numpy as np
    import pandas as pd

    vocab = [f"x{i:04d}" for i in range(1000)]  # disjoint vocab: no accidental dups

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].values
            rs = np.random.RandomState(int(ids[0]) % (2**31) + 77)
            texts = [
                " ".join(
                    vocab[t]
                    for t in rs.randint(0, len(vocab), size=rs.randint(50, 150))
                )
                for _ in ids
            ]
            yield pd.DataFrame({"doc_id": ids + 2 * N, "text": texts})

    return (
        spark.range(BATCH_NEW)
        .repartition(4)
        .mapInPandas(gen, "doc_id long, text string")
    )


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="ccpd_xrun1m_")
    spark = get_spark(app_name="xrun_1m_probe")
    docs_path = f"{work}/docs"
    if not os.path.exists(f"{docs_path}/_SUCCESS"):
        t0 = time.perf_counter()
        build_docs(spark, docs_path)
        print(f"docs built: {time.perf_counter() - t0:.1f}s", flush=True)
    docs = spark.read.parquet(docs_path)
    batch = make_batch(spark, docs).localCheckpoint()  # fixed content across probes
    n_batch = batch.count()
    print(f"batch: {n_batch} docs ({BATCH_CLONES} planted clones)", flush=True)

    # ---- exact fingerprints ------------------------------------------------
    fp_path = f"{work}/fps"
    t0 = time.perf_counter()
    DD.write_fingerprints(
        docs, fp_path, "doc_id", "text", parts=PARTS, files_per_part=FILES_PER_PART
    )
    t_write = time.perf_counter() - t0
    nf, nd = census(f"{fp_path}/fingerprints/part=*/*.parquet")
    print(
        f"[exact] write {t_write:.1f}s; census {nf} files / {nd} part dirs "
        f"(bound {PARTS * FILES_PER_PART})",
        flush=True,
    )
    t0 = time.perf_counter()
    surv = DD.dedup_exact_against(batch, fp_path, "doc_id", "text")
    n_surv = surv.count()
    t_probe = time.perf_counter() - t0
    n_clone_surv = surv.filter(F.col("doc_id") >= CLONE_OFFSET).count()
    print(
        f"[exact] probe {t_probe:.1f}s; survivors {n_surv}/{n_batch} "
        f"(clones surviving: {n_clone_surv} — must be 0)",
        flush=True,
    )
    assert n_clone_surv == 0 and n_surv == BATCH_NEW
    # the no-table alternative: fingerprint the whole corpus from text
    # per ingest and anti-join
    t0 = time.perf_counter()
    from chicago_crash_data_pipeline_dashboard_spark.functions import text as TX

    corpus_fp = docs.select(TX.fingerprint(F.col("text")).alias("_fp"))
    alt = batch.withColumn("_fp", TX.fingerprint(F.col("text"))).join(
        corpus_fp, "_fp", "left_anti"
    )
    n_alt = alt.count()
    t_alt = time.perf_counter() - t0
    print(
        f"[exact] no-table alternative (re-fingerprint 1M texts + anti-join) "
        f"{t_alt:.1f}s -> {t_alt / t_probe:.1f}x the probe; survivors agree: "
        f"{n_alt == n_surv}",
        flush=True,
    )
    t0 = time.perf_counter()
    DD.append_fingerprints(surv, fp_path, "doc_id", "text")
    print(f"[exact] append {time.perf_counter() - t0:.1f}s (O(batch))", flush=True)

    # ---- SimHash segments --------------------------------------------------
    sh_path = f"{work}/simhash"
    t0 = time.perf_counter()
    DD.write_simhash_index(
        docs, sh_path, "doc_id", "text",
        parts=PARTS, files_per_part=FILES_PER_PART, **SIMHASH,
    )
    t_write = time.perf_counter() - t0
    nf, nd = census(f"{sh_path}/segments/part=*/*.parquet")
    print(
        f"[simhash] write {t_write:.1f}s ({SIMHASH['max_distance'] + 1} segment "
        f"rows/doc); census {nf} files / {nd} part dirs "
        f"(bound {PARTS * FILES_PER_PART})",
        flush=True,
    )
    t0 = time.perf_counter()
    pairs = DD.simhash_near_duplicates_against(batch, sh_path, "doc_id", "text")
    got = pairs.groupBy("hamming").count().collect()
    t_probe = time.perf_counter() - t0
    hist = {int(r["hamming"]): int(r["count"]) for r in got}
    clones_found = (
        pairs.filter(
            (F.col("hamming") == 0)
            & (F.col("batch_doc") - F.lit(CLONE_OFFSET) == F.col("corpus_doc"))
        ).count()
    )
    print(
        f"[simhash] probe {t_probe:.1f}s; hamming histogram {hist}; planted "
        f"clones at hamming 0: {clones_found}/{BATCH_CLONES}",
        flush=True,
    )
    assert clones_found == BATCH_CLONES
    # the no-table alternative: recompute corpus fingerprints from text
    t0 = time.perf_counter()
    DD.simhash(docs, "doc_id", "text", SIMHASH["bits"], SIMHASH["hash_mode"]).agg(
        F.count(F.lit(1))
    ).collect()
    t_alt = time.perf_counter() - t0
    print(
        f"[simhash] no-table alternative (re-fingerprint 1M texts) {t_alt:.1f}s "
        f"-> {t_alt / t_probe:.1f}x the probe (before it even joins)",
        flush=True,
    )
    t0 = time.perf_counter()
    DD.append_simhash_index(
        batch.join(pairs.select(F.col("batch_doc").alias("doc_id")).distinct(),
                   "doc_id", "left_anti"),
        sh_path, "doc_id", "text",
    )
    print(f"[simhash] append {time.perf_counter() - t0:.1f}s (O(batch))", flush=True)

    # ---- txn round overhead (100k corpus) ----------------------------------
    sub = docs.filter(F.col("doc_id") < ROUND_CORPUS)
    for mode in ("plain", "txn"):
        sp = f"{work}/round_{mode}"
        DD.write_minhash_signatures(
            sub, sp, "doc_id", "text", parts=PARTS, files_per_part=1, **ROUND_SIG
        )
        t0 = time.perf_counter()
        rep = DD.minhash_ingest_round(
            batch, sp, "doc_id", "text", threshold=0.9,
            txn=None if mode == "plain" else "probe-b0",
        )
        t_round = time.perf_counter() - t0
        print(
            f"[round/{mode}] {t_round:.1f}s; n_survivors {rep['n_survivors']} "
            f"(clones in sub-corpus range dropped)",
            flush=True,
        )
        if mode == "txn":
            t0 = time.perf_counter()
            rep2 = DD.minhash_ingest_round(
                batch, sp, "doc_id", "text", threshold=0.9, txn="probe-b0"
            )
            print(
                f"[round/txn] replay {time.perf_counter() - t0:.1f}s; action "
                f"{rep2['action']}; survivor count reconstructed: "
                f"{rep2['n_survivors'] == rep['n_survivors']}",
                flush=True,
            )
    print(f"workdir kept: {work}", flush=True)


if __name__ == "__main__":
    main()
