"""r14 scale probe (VERDICT r13 item 2): semantic_dedup_against at
1M/1,000 clusters — the QUIET-HOST re-measure of the r13 follow-on
(whose 116 s / 279 s numbers were upper bounds taken under concurrent
bench load), the HOF-vs-matmul VERIFY A/B (the builder-named "known
10×+ lever" now implemented as operators/similarity.py
_semantic_hits_matmul), and the recall-vs-n_probe curve for
NEAR-THRESHOLD pairs (the operator's recall contract was stated, never
characterized).

Setup mirrors the r13 maintain probe's geometry: 1M 64-dim vectors,
1,000-cluster IVF index. Three measurements:

1. throughput A/B: a 10k batch (9,900 fresh + 100 exact clones of
   indexed vectors) probed at n_probe in {4, 16} under verify="hof"
   and verify="batched" — identical survivor sets gated in-script,
   zero clone leaks, zero false drops at threshold 0.99;
2. exact-duplicate guarantee at the minimum probe: the same batch at
   n_probe=1 must still drop every planted exact clone (identical
   vectors share a nearest centroid — the contract's floor);
3. recall curve: 3 × 1,000 synthetic near-threshold plants at target
   cosine c in {0.86, 0.90, 0.95} vs threshold 0.85 (constructed as
   u·c + w⊥·sqrt(1−c²) against indexed unit vectors, so the true
   cosine is c up to fp), probed at n_probe in {1, 2, 4, 8, 16, 32,
   64, 1000}: recall(n_probe, c) = fraction of plants dropped.
   Random 64-dim pairs sit ~7σ below 0.85, so a plant's only
   qualifying partner is its source — detection == drop.

Run: python scripts/probe_semantic_1m.py [workdir]
"""

from __future__ import annotations

import json
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
BATCH_FRESH = 9_900
N_CLONES = 100
N_PLANTS = 1_000
TARGET_COS = (0.86, 0.90, 0.95)
CURVE_PROBES = (1, 2, 4, 8, 16, 32, 64, N_CLUSTERS)


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


def clone_rows(spark, base: str, n: int, id_offset: int):
    """n exact copies of indexed vectors under shifted ids."""
    return (
        spark.read.parquet(base)
        .filter(F.col("vec_id") % (N // n) == 7)
        .limit(n)
        .select((F.col("vec_id") + id_offset).alias("vec_id"), "embedding")
    )


def near_threshold_plants(spark, base: str, cos: float, n: int, id_offset: int):
    """n plants at EXACT cosine ``cos`` against indexed vectors:
    v' = u·cos + w⊥·sqrt(1−cos²) with u the source unit vector and w⊥
    a random direction orthogonalized against u."""
    import numpy as np
    import pandas as pd

    src = (
        spark.read.parquet(base)
        .filter(F.col("vec_id") % (N // n) == 3)
        .limit(n)
    )

    def gen(batches):
        for pdf in batches:
            ids = pdf["vec_id"].values
            vecs = np.stack(pdf["embedding"].map(np.asarray).values).astype(
                np.float64
            )
            u = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
            rs = np.random.RandomState(int(ids[0]) % (2**31) + 13)
            w = rs.standard_normal(u.shape)
            w -= (w * u).sum(axis=1, keepdims=True) * u
            w /= np.linalg.norm(w, axis=1, keepdims=True)
            out = (cos * u + np.sqrt(1.0 - cos * cos) * w).astype("float32")
            yield pd.DataFrame(
                {"vec_id": ids + id_offset, "embedding": list(out)}
            )

    return src.mapInPandas(gen, "vec_id long, embedding array<float>")


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="ccpd_sem1m_")
    spark = get_spark(app_name="semantic_1m_probe")
    print(f"workdir: {work}  loadavg_start: {os.getloadavg()}", flush=True)

    base = f"{work}/base_vectors"
    if not os.path.exists(f"{base}/_SUCCESS"):
        t0 = time.perf_counter()
        build_vectors(spark, base, N)
        print(f"base vectors built: {time.perf_counter() - t0:.1f}s", flush=True)

    index = f"{work}/ivf"
    if not os.path.exists(f"{index}/_centroids"):
        t0 = time.perf_counter()
        SIM.write_ivf_index(
            spark.read.parquet(base), index, n_clusters=N_CLUSTERS, seed=42,
            files_per_cluster=1,
        )
        print(f"index built ({N_CLUSTERS} clusters): "
              f"{time.perf_counter() - t0:.1f}s", flush=True)

    # ---- measurement 1+2: throughput A/B + exact-dup floor ----------
    fresh = f"{work}/fresh"
    if not os.path.exists(f"{fresh}/_SUCCESS"):
        build_vectors(spark, fresh, BATCH_FRESH, start=10 * N)
    batch = (
        spark.read.parquet(fresh)
        .unionByName(clone_rows(spark, base, N_CLONES, 20 * N))
        .persist()
    )
    n_batch = batch.count()
    clone_ids = {
        r.vec_id for r in clone_rows(spark, base, N_CLONES, 20 * N)
        .select("vec_id").collect()
    }
    assert len(clone_ids) == N_CLONES, len(clone_ids)
    print(f"batch: {n_batch} rows ({N_CLONES} exact clones planted)", flush=True)

    ab: dict[str, dict] = {}
    survivor_sets: dict[tuple, frozenset] = {}
    for n_probe in (4, 16):
        for verify in ("hof", "batched"):
            t0 = time.perf_counter()
            surv = SIM.semantic_dedup_against(
                batch, index, threshold=0.99, n_probe=n_probe, verify=verify,
            )
            ids = frozenset(r.vec_id for r in surv.select("vec_id").collect())
            secs = round(time.perf_counter() - t0, 1)
            survivor_sets[(n_probe, verify)] = ids
            leaked = sorted(ids & clone_ids)
            false_drops = n_batch - N_CLONES - len(ids - clone_ids)
            assert not leaked, f"clones leaked at n_probe={n_probe}/{verify}: {leaked[:5]}"
            assert false_drops == 0, f"{false_drops} false drops at {n_probe}/{verify}"
            ab[f"n_probe={n_probe} verify={verify}"] = {
                "secs": secs, "survivors": len(ids),
            }
            print(f"  n_probe={n_probe:>2} verify={verify:<7} {secs:>7.1f}s "
                  f"survivors={len(ids)} loadavg={os.getloadavg()}", flush=True)
    for np_ in (4, 16):
        assert survivor_sets[(np_, "hof")] == survivor_sets[(np_, "batched")], (
            f"verify regimes disagree at n_probe={np_}"
        )

    # exact-duplicate floor: every clone drops even at n_probe=1
    t0 = time.perf_counter()
    surv1 = SIM.semantic_dedup_against(batch, index, threshold=0.99, n_probe=1)
    ids1 = {r.vec_id for r in surv1.select("vec_id").collect()}
    secs1 = round(time.perf_counter() - t0, 1)
    assert not (ids1 & clone_ids), "exact clones leaked at n_probe=1"
    print(f"  n_probe= 1 (exact-dup floor) {secs1:>7.1f}s — all "
          f"{N_CLONES} clones dropped", flush=True)
    batch.unpersist()

    # ---- measurement 3: recall-vs-n_probe for near-threshold pairs --
    plants = {}
    for c in TARGET_COS:
        p = f"{work}/plants_{int(c * 100)}"
        if not os.path.exists(f"{p}/_SUCCESS"):
            near_threshold_plants(
                spark, base, c, N_PLANTS, (30 + int(c * 100)) * N
            ).write.mode("overwrite").parquet(p)
        plants[c] = spark.read.parquet(p)

    curve: dict[str, dict] = {}
    for n_probe in CURVE_PROBES:
        row = {}
        for c in TARGET_COS:
            surv = SIM.semantic_dedup_against(
                plants[c], index, threshold=0.85, n_probe=n_probe,
            )
            kept = surv.count()
            row[f"cos={c}"] = round((N_PLANTS - kept) / N_PLANTS, 3)
        curve[f"n_probe={n_probe}"] = row
        print(f"  recall {row} at n_probe={n_probe}", flush=True)
    # exhaustive probe must be brute force: recall 1.0 across the band
    assert all(v == 1.0 for v in curve[f"n_probe={N_CLUSTERS}"].values()), (
        f"exhaustive probe missed plants: {curve[f'n_probe={N_CLUSTERS}']}"
    )

    print(json.dumps(
        {
            "n": N, "n_clusters": N_CLUSTERS, "batch": n_batch,
            "throughput_ab": ab, "exact_floor_secs": secs1,
            "recall_curve": curve, "loadavg_end": os.getloadavg(),
        },
        indent=2,
    ), flush=True)


if __name__ == "__main__":
    main()
