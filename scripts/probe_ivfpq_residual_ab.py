"""r11 scale probe (VERDICT r10 item 5): direct vs residual PQ
encoding for the IVF-PQ at-rest index, A/B'd at the r10 1M probe's
exact configuration — 1M x 64-d tight-cluster corpus (50 true
clusters), n_clusters=1000, m=16, ks=256, n_probe=20, refine=16,
k=100, 16 cloned queries. Reports build time, warm probe time, and
recall@100 vs a brute-force exact baseline on the SAME materialized
corpus. Results + the default-mode decision go to COVERAGE.md.

Run: python scripts/probe_ivfpq_residual_ab.py [workdir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from chicago_crash_data_pipeline_dashboard_spark.operators import similarity as SIM  # noqa: E402
from chicago_crash_data_pipeline_dashboard_spark.session import get_spark  # noqa: E402

N, D, TRUE_C = 1_000_000, 64, 50
K, N_PROBE, REFINE, NQ = 100, 20, 16, 16
CONF = dict(n_clusters=1000, m=16, ks=256, seed=42)
Q_OFFSET = 10_000_000


def build_corpus(spark, path: str):
    import pandas as pd

    rs0 = np.random.RandomState(42)
    centers = (rs0.standard_normal((TRUE_C, D)) * 5.0).astype(np.float32)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].values
            rs = np.random.RandomState(int(ids[0]) % (2**31))
            noise = (rs.standard_normal((len(ids), D)) * 0.3).astype(np.float32)
            vecs = centers[ids % TRUE_C] + noise
            yield pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})

    (
        spark.range(N)
        .repartition(32)
        .mapInPandas(gen, "vec_id long, embedding array<float>")
        .write.mode("overwrite")
        .parquet(path)
    )


def recall_at_k(approx_rows, exact_rows, k: int) -> float:
    def sets(rows):
        out = {}
        for r in rows:
            out.setdefault(r.query_id, set()).add(r.neighbor_id)
        return out

    a, e = sets(approx_rows), sets(exact_rows)
    return float(
        np.mean([len(a.get(qid, set()) & nbrs) / len(nbrs) for qid, nbrs in e.items()])
    )


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="ccpd_resab_")
    spark = get_spark(app_name="ivfpq_residual_ab")
    corpus_path = f"{work}/corpus"
    if not os.path.exists(f"{corpus_path}/_SUCCESS"):
        t0 = time.perf_counter()
        build_corpus(spark, corpus_path)
        print(f"corpus built: {time.perf_counter() - t0:.1f}s", flush=True)
    e = spark.read.parquet(corpus_path)
    q = e.filter(F.col("vec_id") < NQ).select(
        (F.col("vec_id") + Q_OFFSET).alias("vec_id"), "embedding"
    )

    exact_path = f"{work}/exact_topk"
    if os.path.exists(f"{exact_path}/_SUCCESS"):
        exact = spark.read.parquet(exact_path).collect()
        print(f"brute-force baseline: cached ({len(exact)} rows)", flush=True)
    else:
        t0 = time.perf_counter()
        exact_df = SIM.brute_force_topk(e, q, k=K)
        exact = exact_df.collect()
        spark.createDataFrame(exact, exact_df.schema).write.parquet(exact_path)
        print(f"brute-force baseline: {time.perf_counter() - t0:.1f}s "
              f"({len(exact)} rows)", flush=True)

    for mode in ("direct", "residual"):
        path = f"{work}/ivfpq_{mode}"
        t0 = time.perf_counter()
        SIM.write_ivfpq_index(e, path, encode=mode, **CONF)
        build_s = time.perf_counter() - t0
        # cold probe warms codegen/session state; the timed probe is warm
        SIM.ivfpq_topk_indexed(spark, path, q, k=K, n_probe=N_PROBE, refine=REFINE).collect()
        t0 = time.perf_counter()
        approx = SIM.ivfpq_topk_indexed(
            spark, path, q, k=K, n_probe=N_PROBE, refine=REFINE
        ).collect()
        probe_s = time.perf_counter() - t0
        rec = recall_at_k(approx, exact, K)
        print(
            f"RESULT mode={mode} build={build_s:.1f}s probe_warm={probe_s:.2f}s "
            f"recall@{K}={rec:.4f}",
            flush=True,
        )
    print(f"workdir kept: {work}", flush=True)


if __name__ == "__main__":
    main()
