"""r11 scale probe: the at-rest MinHash signature table
(operators/dedup.py write_minhash_signatures / near_duplicates_against)
at 1M documents — the operator's 100-TB claims measured rather than
asserted:

- write cost + file-count discipline (parts x files_per_part, never
  tasks x parts);
- probe cost for a 1k-doc incoming batch, with the partition pruning
  it promises (distinct parts touched vs total);
- planted cross-run clones caught (100 corpus docs re-ingested under
  new ids must all pair at est_jaccard 1.0);
- append cost for the deduped batch.

Run: python scripts/probe_sigtable_1m.py [workdir]
"""

from __future__ import annotations

import glob
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from chicago_crash_data_pipeline_dashboard_spark.operators import dedup as DD  # noqa: E402
from chicago_crash_data_pipeline_dashboard_spark.session import get_spark  # noqa: E402

N = 1_000_000
PARAMS = dict(num_hashes=64, bands=16, shingle_n=3, seed=42, hash_mode="murmur3")
PARTS, FILES_PER_PART = 64, 4
BATCH_NEW, BATCH_CLONES = 1_000, 100
CLONE_OFFSET = 10_000_000


def build_docs(spark, path: str):
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
        spark.range(N)
        .repartition(32)
        .mapInPandas(gen, "doc_id long, text string")
        .write.mode("overwrite")
        .parquet(path)
    )


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="ccpd_sig1m_")
    spark = get_spark(app_name="sigtable_1m_probe")
    docs_path = f"{work}/docs"
    if not os.path.exists(f"{docs_path}/_SUCCESS"):
        t0 = time.perf_counter()
        build_docs(spark, docs_path)
        print(f"docs built: {time.perf_counter() - t0:.1f}s", flush=True)
    docs = spark.read.parquet(docs_path)

    sig_path = f"{work}/sigs"
    t0 = time.perf_counter()
    DD.write_minhash_signatures(
        docs, sig_path, "doc_id", "text",
        parts=PARTS, files_per_part=FILES_PER_PART, **PARAMS,
    )
    write_s = time.perf_counter() - t0
    files = glob.glob(f"{sig_path}/banded/part=*/*.parquet")
    per_dir = {}
    for f in files:
        per_dir.setdefault(os.path.dirname(f), 0)
        per_dir[os.path.dirname(f)] += 1
    print(
        f"RESULT write={write_s:.1f}s files={len(files)} dirs={len(per_dir)} "
        f"max_files_per_dir={max(per_dir.values())}",
        flush=True,
    )

    clones = docs.filter(F.col("doc_id") < BATCH_CLONES).select(
        (F.col("doc_id") + CLONE_OFFSET).alias("doc_id"), "text"
    )
    fresh = (
        spark.read.parquet(docs_path)
        .filter((F.col("doc_id") >= 500_000) & (F.col("doc_id") < 500_000 + BATCH_NEW))
        .select((F.col("doc_id") + 2 * CLONE_OFFSET).alias("doc_id"),
                F.concat(F.lit("novel prefix "), F.col("text")).alias("text"))
    )
    batch = clones.unionByName(fresh)

    t0 = time.perf_counter()
    pairs = DD.near_duplicates_against(
        batch, sig_path, "doc_id", "text", threshold=0.8, max_bucket=10_000
    ).collect()
    probe_s = time.perf_counter() - t0
    caught = {
        r.batch_doc
        for r in pairs
        if r.est_jaccard == 1.0 and r.corpus_doc == r.batch_doc - CLONE_OFFSET
    }
    print(
        f"RESULT probe={probe_s:.1f}s pairs={len(pairs)} "
        f"clones_caught={len(caught)}/{BATCH_CLONES}",
        flush=True,
    )

    t0 = time.perf_counter()
    DD.append_minhash_signatures(fresh, sig_path, "doc_id", "text",
                                 files_per_part=FILES_PER_PART)
    append_s = time.perf_counter() - t0
    files2 = glob.glob(f"{sig_path}/banded/part=*/*.parquet")
    print(
        f"RESULT append={append_s:.1f}s files_after={len(files2)}",
        flush=True,
    )
    print(f"workdir kept: {work}", flush=True)


if __name__ == "__main__":
    main()
