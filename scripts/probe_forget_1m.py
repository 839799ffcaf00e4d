"""r12 scale probe: right-to-be-forgotten economics at 1M documents —
the deletion path's 100-TB claim (touched-partitions-only rewrite)
measured on the tables the cross-run probe built
(``probe_xrun_1m.py``'s workdir, or rebuilt here if absent):

- forget 1,000 docs from the exact-fingerprint table (key-hash
  partitioning: deleted keys spread across ~all 64 partitions — the
  WORST case for pruning, measured honestly);
- forget the same 1,000 docs from the MinHash signature table (their
  band rows also spread);
- verify the forgotten docs stop matching (clone re-probe) and the
  kept census is intact;
- compare against the no-forget alternative: a full table rewrite
  with a filter.

Run: python scripts/probe_forget_1m.py [workdir]
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

PARTS, FILES_PER_PART = 64, 4
ROUND_SIG = dict(num_hashes=32, bands=8, shingle_n=3, seed=42, hash_mode="murmur3")
N_FORGET = 1_000
CLONE_OFFSET = 20_000_000


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="ccpd_forget1m_")
    spark = get_spark(app_name="forget_1m_probe")
    docs_path = f"{work}/docs"
    if not os.path.exists(f"{docs_path}/_SUCCESS"):
        from probe_xrun_1m import build_docs

        build_docs(spark, docs_path)
    docs = spark.read.parquet(docs_path)

    fp_path, sig_path = f"{work}/fps", f"{work}/sigs"
    if not os.path.exists(f"{fp_path}/fingerprints"):
        DD.write_fingerprints(
            docs, fp_path, "doc_id", "text",
            parts=PARTS, files_per_part=FILES_PER_PART,
        )
    if not os.path.exists(f"{sig_path}/banded"):
        DD.write_minhash_signatures(
            docs, sig_path, "doc_id", "text",
            parts=PARTS, files_per_part=FILES_PER_PART, **ROUND_SIG,
        )

    forget = docs.filter(F.col("doc_id") % 1000 == 13).select("doc_id")
    n_forget = forget.count()
    print(f"forgetting {n_forget} docs of 1M", flush=True)

    for name, path in (("fingerprints", fp_path), ("signatures", sig_path)):
        t0 = time.perf_counter()
        st = DD.forget_documents(spark, path, forget)
        t = time.perf_counter() - t0
        print(
            f"[{name}] forget {t:.1f}s; rows_deleted {st['rows_deleted']}; "
            f"parts touched {st['parts_touched']}/{st['parts_total']} "
            f"(emptied {st['parts_emptied']})",
            flush=True,
        )

    # forgotten docs stop matching immediately
    clones = docs.join(forget, "doc_id", "left_semi").select(
        (F.col("doc_id") + CLONE_OFFSET).alias("doc_id"), "text"
    )
    t0 = time.perf_counter()
    surv = DD.dedup_exact_against(clones, fp_path, "doc_id", "text").count()
    print(
        f"[fingerprints] clone re-probe {time.perf_counter() - t0:.1f}s; "
        f"{surv}/{n_forget} forgotten-doc clones now SURVIVE (want all)",
        flush=True,
    )
    assert surv == n_forget
    t0 = time.perf_counter()
    hits = DD.near_duplicates_against(
        clones, sig_path, "doc_id", "text", threshold=0.99
    ).filter(F.col("corpus_doc") % 1000 == 13).count()
    print(
        f"[signatures] clone re-probe {time.perf_counter() - t0:.1f}s; "
        f"{hits} pairs still reference forgotten docs (want 0)",
        flush=True,
    )
    assert hits == 0

    # the alternative forget had before: full filtered rewrite
    t0 = time.perf_counter()
    (
        spark.read.parquet(f"{sig_path}/banded")
        .join(F.broadcast(forget.select(F.col("doc_id").alias("doc"))), "doc", "left_anti")
        .repartition("part")
        .write.mode("overwrite")
        .partitionBy("part")
        .parquet(f"{work}/rewrite_alt")
    )
    print(
        f"[signatures] full filtered-rewrite alternative "
        f"{time.perf_counter() - t0:.1f}s",
        flush=True,
    )
    print(f"workdir kept: {work}", flush=True)


if __name__ == "__main__":
    main()
