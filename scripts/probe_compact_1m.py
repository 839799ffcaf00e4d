"""r11 scale probe: compact_index economics at 1M vectors — the claim
"compaction is O(bloated bytes), a full rebuild is not an option at
scale" measured rather than asserted:

- build a 1,000-cluster IVF index on 1M x 64-dim vectors (the r10
  probe's production shape: files_per_cluster=1 -> exactly 1,000
  files);
- grow it with five 50k appends under the saved quantizer (every
  cluster touched by every append at this density -> ~6,000 files);
- measure the probe latency penalty of the bloated listing, then
  compact_index wall time, then the recovered probe latency;
- gate: probe results bit-identical before/after compaction, every
  cluster back at one file;
- compare against the no-retrain full rebuild
  (write_ivf_index(centroids=saved)) wall time on the same corpus —
  the alternative the operator had before compact_index existed.

Run: python scripts/probe_compact_1m.py [workdir]
"""

from __future__ import annotations

import glob
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
APPENDS = 5
BATCH = 50_000
K, N_PROBE = 100, 32


def build_vectors(spark, path: str):
    import numpy as np
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].values
            rs = np.random.RandomState(int(ids[0]) % (2**31))
            vecs = rs.standard_normal((len(ids), DIM)).astype("float32")
            yield pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})

    (
        spark.range(N + APPENDS * BATCH)
        .repartition(32)
        .mapInPandas(gen, "vec_id long, embedding array<float>")
        .write.mode("overwrite")
        .parquet(path)
    )


def count_files(path: str) -> int:
    return len(glob.glob(f"{path}/_cluster=*/*.parquet"))


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="ccpd_compact1m_")
    spark = get_spark(app_name="compact_1m_probe")
    vec_path = f"{work}/vectors"
    if not os.path.exists(f"{vec_path}/_SUCCESS"):
        t0 = time.perf_counter()
        build_vectors(spark, vec_path)
        print(f"vectors built: {time.perf_counter() - t0:.1f}s", flush=True)
    vecs = spark.read.parquet(vec_path)
    initial = vecs.filter(F.col("vec_id") < N)
    q = vecs.filter(F.col("vec_id") < 16)

    index = f"{work}/ivf"
    t0 = time.perf_counter()
    saved = SIM.write_ivf_index(initial, index, n_clusters=N_CLUSTERS, seed=42)
    build_s = time.perf_counter() - t0
    print(f"RESULT build={build_s:.1f}s files={count_files(index)}", flush=True)

    t0 = time.perf_counter()
    for a in range(APPENDS):
        lo, hi = N + a * BATCH, N + (a + 1) * BATCH
        SIM.append_to_ivf_index(
            vecs.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)), index
        )
    append_s = time.perf_counter() - t0
    files_bloated = count_files(index)
    print(f"RESULT appends={append_s:.1f}s files_bloated={files_bloated}", flush=True)

    t0 = time.perf_counter()
    before = sorted(
        map(tuple, SIM.ivf_topk_indexed(spark, index, q, k=K, n_probe=N_PROBE).collect())
    )
    probe_bloated_s = time.perf_counter() - t0
    print(f"RESULT probe_bloated={probe_bloated_s:.1f}s", flush=True)

    t0 = time.perf_counter()
    stats = SIM.compact_index(spark, index, files_per_cluster=1)
    compact_s = time.perf_counter() - t0
    print(
        f"RESULT compact={compact_s:.1f}s clusters={stats['clusters_compacted']}"
        f"/{stats['clusters_total']} files {stats['files_before']}->"
        f"{stats['files_after']}",
        flush=True,
    )
    assert stats["files_after"] == N_CLUSTERS, stats

    t0 = time.perf_counter()
    after = sorted(
        map(tuple, SIM.ivf_topk_indexed(spark, index, q, k=K, n_probe=N_PROBE).collect())
    )
    probe_compacted_s = time.perf_counter() - t0
    assert before == after, "compaction changed probe results"
    print(f"RESULT probe_compacted={probe_compacted_s:.1f}s (results identical)", flush=True)

    rebuilt = f"{work}/rebuilt"
    t0 = time.perf_counter()
    SIM.write_ivf_index(vecs, rebuilt, centroids=saved)
    rebuild_s = time.perf_counter() - t0
    print(
        f"RESULT no_retrain_rebuild={rebuild_s:.1f}s "
        f"(compact was {rebuild_s / max(compact_s, 1e-9):.1f}x cheaper)",
        flush=True,
    )
    print(f"workdir kept: {work}", flush=True)


if __name__ == "__main__":
    main()
