"""r13 scale probe (VERDICT r12 item 2 / r11 item 3): the
maintain_index POLICY LOOP at 1M vectors — the last at-rest capability
whose decision loop had no scale measurement. The pieces were probed
individually (append 20 s, compact 9.7 s, drift stats 4.3 s in the r11
runs); this drives the drift-check -> append/compact/retrain DECISION
over a 1M-row, 1,000-cluster IVF index through the STREAMED variant
(streaming/ingest.py stream_maintain_index), exactly the
highest-frequency path the verdict named:

- drain 1: four 50k in-distribution batches (maxFilesPerTrigger=1 ->
  one maintain_index round each) — every round must APPEND with
  drift_ratio ~1 and the trigger-gated compaction must restore the
  file bound;
- drain 2: one 50k OUT-OF-DISTRIBUTION batch (vectors scaled x2 ->
  nearest-centroid distances roughly double) — the round MUST trip the
  auto-retrain at the default retrain_drift_ratio=1.5 and atomically
  swap in quantizers refit over index+batch;
- drain 3: one more in-distribution batch — the refreshed baseline
  must classify it as appendable again (ratio back ~1: the retrain
  actually reset the drift reference);
- a fourth, empty re-drain must run ZERO batches (checkpoint input
  dedup at 1M), and the probe path must return k rows per query after
  the swap.

Per-round wall time is captured by wrapping maintain_index, so the
published table is decision + cost per round. Run:
python scripts/probe_maintain_1m.py [workdir]
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
from chicago_crash_data_pipeline_dashboard_spark.streaming.ingest import (  # noqa: E402
    stream_maintain_index,
)

N = 1_000_000
DIM = 64
N_CLUSTERS = 1_000
BATCH = 50_000
IN_DIST_BATCHES = 4
OOD_SCALE = 2.0
K, N_PROBE = 10, 32


def build_vectors(spark, path: str, n_rows: int, start: int = 0, scale: float = 1.0):
    import numpy as np
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].values
            rs = np.random.RandomState(int(ids[0]) % (2**31))
            vecs = (scale * rs.standard_normal((len(ids), DIM))).astype("float32")
            yield pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})

    (
        spark.range(start, start + n_rows)
        .repartition(32 if n_rows >= N else 4)
        .mapInPandas(gen, "vec_id long, embedding array<float>")
        .write.mode("overwrite")
        .parquet(path)
    )


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="ccpd_maint1m_")
    spark = get_spark(app_name="maintain_1m_probe")
    print(f"workdir: {work}", flush=True)

    base = f"{work}/base_vectors"
    if not os.path.exists(f"{base}/_SUCCESS"):
        t0 = time.perf_counter()
        build_vectors(spark, base, N)
        print(f"base vectors built: {time.perf_counter() - t0:.1f}s", flush=True)

    index = f"{work}/ivf"
    t0 = time.perf_counter()
    SIM.write_ivf_index(
        spark.read.parquet(base), index, n_clusters=N_CLUSTERS, seed=42,
        files_per_cluster=1,
    )
    t_build = time.perf_counter() - t0
    print(f"index built ({N_CLUSTERS} clusters): {t_build:.1f}s", flush=True)

    # per-round wall time: wrap maintain_index where the stream resolves it
    orig = SIM.maintain_index
    rounds: list[dict] = []

    def timed(*a, **k):
        t = time.perf_counter()
        rep = orig(*a, **k)
        rep["secs"] = round(time.perf_counter() - t, 2)
        rounds.append(rep)
        return rep

    SIM.maintain_index = timed
    try:
        src, ckpt = f"{work}/src", f"{work}/ckpt"
        stream_args = dict(
            spark=spark, src_dir=src, index_path=index, checkpoint_dir=ckpt,
            max_files_per_trigger=1,
        )
        # drain 1: four in-distribution batches, one round each
        for i in range(IN_DIST_BATCHES):
            build_vectors(spark, f"{work}/b{i}", BATCH, start=N + i * BATCH)
            spark.read.parquet(f"{work}/b{i}").coalesce(1).write.mode(
                "append"
            ).parquet(src)
        t0 = time.perf_counter()
        r1 = stream_maintain_index(**stream_args)
        print(f"drain 1 ({len(r1)} in-dist rounds): {time.perf_counter() - t0:.1f}s",
              flush=True)
        assert [r["action"] for r in r1] == ["appended"] * IN_DIST_BATCHES, r1
        bad = [r for r in r1 if r["drift_ratio"] is None or r["drift_ratio"] > 1.2]
        assert not bad, f"in-distribution batches drifted unexpectedly: {bad}"

        # drain 2: the OOD batch — MUST trip the auto-retrain
        start_ood = N + IN_DIST_BATCHES * BATCH
        build_vectors(spark, f"{work}/bood", BATCH, start=start_ood, scale=OOD_SCALE)
        spark.read.parquet(f"{work}/bood").coalesce(1).write.mode("append").parquet(src)
        t0 = time.perf_counter()
        r2 = stream_maintain_index(**stream_args)
        print(f"drain 2 (OOD round): {time.perf_counter() - t0:.1f}s", flush=True)
        assert len(r2) == 1 and r2[0]["action"] == "retrained", r2
        assert r2[0]["drift_ratio"] > 1.5, r2

        # drain 3: post-retrain in-distribution batch — baseline refreshed
        start_post = start_ood + BATCH
        build_vectors(spark, f"{work}/bpost", BATCH, start=start_post)
        spark.read.parquet(f"{work}/bpost").coalesce(1).write.mode("append").parquet(src)
        t0 = time.perf_counter()
        r3 = stream_maintain_index(**stream_args)
        print(f"drain 3 (post-retrain round): {time.perf_counter() - t0:.1f}s",
              flush=True)
        assert len(r3) == 1 and r3[0]["action"] == "appended", r3
        # the retrained quantizer was fit over index+OOD rows, so an
        # in-dist batch must sit comfortably under the retrain bound
        assert r3[0]["drift_ratio"] is not None and r3[0]["drift_ratio"] < 1.5, r3

        # re-drain with no new files: ZERO rounds (checkpoint dedup at 1M)
        assert stream_maintain_index(**stream_args) == []
    finally:
        SIM.maintain_index = orig

    # probe sanity after the swap: k rows per query
    q = spark.read.parquet(base).filter(F.col("vec_id") < 16)
    got = SIM.ivf_topk_indexed(spark, index, q, k=K, n_probe=N_PROBE)
    n = got.count()
    assert n == 16 * K, f"post-retrain probe returned {n} rows"

    total_rows = N + (IN_DIST_BATCHES + 2) * BATCH
    print(f"\nindex rows after loop: {total_rows:,} (build {t_build:.1f}s)")
    print("round | action | drift_ratio | compacted | files_after | secs")
    for i, r in enumerate(rounds):
        print(
            f"{i} | {r['action']} | {r['drift_ratio']} | {r['compacted']} | "
            f"{r['files_after']} | {r['secs']}"
        )
    print("\nPROBE PASSED", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
