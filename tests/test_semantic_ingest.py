"""The embeddings (semantic) member of the cross-run ingest-round
family — r14, completing the family across all four at-rest signature
types: one-call round semantics, verify-regime parity (per-pair HOF
fold vs Arrow-batched matmul), the staged-move txn ledger under
replay/crash, and the streamed drain's parity with hand-run rounds.
Mirrors tests/test_streaming.py's MinHash coverage per the r13 verdict
mandate (item 3)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from chicago_crash_data_pipeline_dashboard_spark.operators import similarity as SIM
from chicago_crash_data_pipeline_dashboard_spark.sources import fsutil as FS


def _vec_fixture(spark, ids, clone_of=None, dim=16, seed=17):
    """Deterministic per-id embeddings; ``clone_of={new: src}`` plants
    exact duplicates. Random normal 16-dim vectors sit far below any
    0.9-cosine threshold pairwise, so the only >=0.9 pairs are the
    planted clones."""
    rows = []
    for i in ids:
        rng = np.random.default_rng(seed + int(i))
        rows.append((int(i), [float(x) for x in rng.normal(size=dim)]))
    for new, src in (clone_of or {}).items():
        rng = np.random.default_rng(seed + int(src))
        rows.append((int(new), [float(x) for x in rng.normal(size=dim)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _ids(df) -> set:
    return {r.vec_id for r in df.select("vec_id").collect()}


def test_semantic_verify_regime_parity(spark, tmp_path):
    """The three verify paths (HOF join, Arrow-batched matmul,
    no-broadcast distributed HOF) produce identical survivor sets —
    on the small-k fixture AND on a >=_BATCHED_ASSIGN_MIN_K-cluster
    index where 'auto' resolves to the matmul."""
    corpus = _vec_fixture(spark, range(60))
    batch = _vec_fixture(spark, range(100, 110), clone_of={200: 3, 201: 7})

    idx = str(tmp_path / "ivf_small")
    SIM.write_ivf_index(corpus, idx, n_clusters=8, seed=42)
    kw = dict(threshold=0.9, n_probe=8)
    hof = _ids(SIM.semantic_dedup_against(batch, idx, verify="hof", **kw))
    mat = _ids(SIM.semantic_dedup_against(batch, idx, verify="batched", **kw))
    nob = _ids(
        SIM.semantic_dedup_against(batch, idx, broadcast_batch=False, **kw)
    )
    assert hof == mat == nob == set(range(100, 110))

    # production-k index: write-side assignment, probe AND verify all
    # resolve to the batched regime; forced-HOF verify must agree
    idx2 = str(tmp_path / "ivf_large")
    SIM.write_ivf_index(corpus, idx2, n_clusters=40, seed=42)
    kw2 = dict(threshold=0.9, n_probe=40)
    auto = _ids(SIM.semantic_dedup_against(batch, idx2, **kw2))
    hof2 = _ids(SIM.semantic_dedup_against(batch, idx2, verify="hof", **kw2))
    assert auto == hof2 == set(range(100, 110))

    with pytest.raises(ValueError, match="broadcast_batch=False"):
        SIM.semantic_dedup_against(
            batch, idx, verify="batched", broadcast_batch=False, **kw
        )


def test_semantic_null_vector_batched_verify(spark, tmp_path):
    """ADVICE r14: a NULL-vector batch row on a small-k (HOF-regime)
    index with verify='batched' forced used to crash the matmul with
    an opaque np.asarray(None) TypeError — the old probe filter
    checked _probes.isNotNull(), which is never NULL (the probe array
    transforms the non-null centroid literal). The probe now filters
    on the VECTOR column, matching the HOF join's semantics: a NULL
    vector can never hit (NULL cosine fails every threshold), so it
    SURVIVES dedup under every verify path."""
    corpus = _vec_fixture(spark, range(40))
    batch = _vec_fixture(spark, range(100, 105), clone_of={200: 3}).unionByName(
        spark.createDataFrame(
            [(999, None)], "vec_id long, embedding array<double>"
        )
    )
    idx = str(tmp_path / "ivf_null")
    SIM.write_ivf_index(corpus, idx, n_clusters=8, seed=42)
    kw = dict(threshold=0.9, n_probe=8)
    expect = set(range(100, 105)) | {999}
    for v in ("hof", "batched"):
        got = _ids(SIM.semantic_dedup_against(batch, idx, verify=v, **kw))
        assert got == expect, f"verify={v}: {got}"
    # the matmul's own guard stays explicit for rows that do reach it
    with pytest.raises(ValueError, match="NULL vector"):
        SIM._matmul_blocks(
            spark, [{"query_id": 1, "qvec": None, "qn": None, "_probes": [0]}]
        )


def test_semantic_dedup_against_return_release(spark, tmp_path):
    """ADVICE r14 / VERDICT r14 item 5: looped callers can release the
    matmul broadcast explicitly — (survivors, release) comes back, the
    survivor set is unchanged, and release() is idempotent and a no-op
    under the HOF verify."""
    corpus = _vec_fixture(spark, range(60))
    batch = _vec_fixture(spark, range(100, 110), clone_of={200: 3})
    idx = str(tmp_path / "ivf_rel")
    SIM.write_ivf_index(corpus, idx, n_clusters=40, seed=42)  # batched regime
    surv, release = SIM.semantic_dedup_against(
        batch, idx, threshold=0.9, n_probe=40, return_release=True
    )
    assert _ids(surv) == set(range(100, 110))
    release()
    release()  # Broadcast.unpersist is idempotent
    # HOF verify: release is the default no-op
    surv2, release2 = SIM.semantic_dedup_against(
        batch, idx, threshold=0.9, n_probe=40, verify="hof", return_release=True
    )
    assert _ids(surv2) == set(range(100, 110))
    release2()


def test_semantic_ingest_round_sequential(spark, tmp_path):
    """Two hand-run rounds: within-batch clone keeps the min id, a
    corpus clone drops, and batch 2's clone of a batch-1 SURVIVOR
    drops THROUGH the index (cross-run, not within-frame). The grown
    index then probes identically to a same-quantizer rebuild over
    corpus + survivors."""
    corpus = _vec_fixture(spark, range(30))
    b1 = _vec_fixture(spark, range(100, 110), clone_of={200: 3, 201: 100})
    b2 = _vec_fixture(spark, range(120, 130), clone_of={210: 100, 211: 5})

    idx = str(tmp_path / "ivf")
    SIM.write_ivf_index(corpus, idx, n_clusters=8, seed=42)
    kw = dict(threshold=0.9, n_probe=8)

    r1 = SIM.semantic_ingest_round(b1, idx, **kw)
    assert _ids(r1["survivors"]) == set(range(100, 110))
    assert r1["n_cross_pairs"] == 1  # 200 vs corpus 3
    assert r1["n_within_pairs"] == 1  # 201 vs 100
    assert set(r1["secs"]) == {"probe", "within", "survivors", "append", "compact"}

    r2 = SIM.semantic_ingest_round(b2, idx, **kw)
    # 210 (clone of batch-1 survivor 100, caught through the index)
    # and 211 (corpus clone) both drop
    assert _ids(r2["survivors"]) == set(range(120, 130))
    assert r2["n_cross_pairs"] == 2

    # the index now holds exactly corpus + both survivor sets, and a
    # same-quantizer rebuild probes identically to the grown index
    held = _ids(spark.read.parquet(idx).select(F.col("neighbor_id").alias("vec_id")))
    assert held == set(range(30)) | set(range(100, 110)) | set(range(120, 130))
    q = _vec_fixture(spark, range(5))
    got = sorted(map(tuple, SIM.ivf_topk_indexed(spark, idx, q, k=5, n_probe=8).collect()))
    idx2 = str(tmp_path / "rebuild")
    full = corpus.unionByName(b1).unionByName(b2).join(
        spark.createDataFrame([(i,) for i in held], "vec_id long"), "vec_id", "left_semi"
    )
    SIM.write_ivf_index(full, idx2, centroids=SIM.read_ivf_centroids(spark, idx))
    want = sorted(map(tuple, SIM.ivf_topk_indexed(spark, idx2, q, k=5, n_probe=8).collect()))
    assert got == want


def test_semantic_ingest_round_txn_replay_and_crash(spark, tmp_path):
    """The transactional round under the at-least-once contract,
    mirroring test_minhash_ingest_round_txn_replay_and_crash: a
    committed txn replays as a no-op with the identical report; a
    crash AFTER the staged moves but BEFORE the marker replays to
    completed_replay WITHOUT re-probing (a re-probe would find the
    batch's own appended vectors at cosine 1.0 and report zero
    survivors); a crash BEFORE the manifest froze restages from
    scratch."""
    import unittest.mock as mock

    from chicago_crash_data_pipeline_dashboard_spark.sources import fsutil
    from chicago_crash_data_pipeline_dashboard_spark.sources.txn import txn_committed

    corpus = _vec_fixture(spark, range(30))
    idx = str(tmp_path / "ivf")
    SIM.write_ivf_index(corpus, idx, n_clusters=8, seed=42)
    kw = dict(threshold=0.9, n_probe=8)

    def census() -> int:
        return len(FS.glob_paths(f"{idx}/_cluster=*/*.parquet"))

    b1 = _vec_fixture(spark, range(100, 108), clone_of={200: 3})
    rep1 = SIM.semantic_ingest_round(b1, idx, txn="rt-b0", **kw)
    assert rep1["action"] == "appended"
    assert rep1["n_survivors"] == 8
    assert _ids(rep1["survivors"]) == set(range(100, 108))
    c1 = census()

    rep1r = SIM.semantic_ingest_round(b1, idx, txn="rt-b0", **kw)
    assert rep1r["action"] == "skipped_replay"
    assert rep1r["n_survivors"] == 8
    assert _ids(rep1r["survivors"]) == set(range(100, 108))
    assert census() == c1

    # crash in the window the ledger exists for: moves done, marker lost
    real_write_text = fsutil.write_text

    def crash_on_marker(p, text, spark_=None):
        if "/_ledger/" in p:
            raise OSError("injected crash before marker write")
        return real_write_text(p, text, spark_)

    b2 = _vec_fixture(spark, range(120, 128), clone_of={210: 100})
    with mock.patch.object(fsutil, "write_text", crash_on_marker):
        with pytest.raises(OSError, match="injected"):
            SIM.semantic_ingest_round(b2, idx, txn="rt-b1", **kw)
    assert not txn_committed(idx, "rt-b1")
    c2 = census()
    assert c2 > c1  # the appends landed before the "crash"

    rep2 = SIM.semantic_ingest_round(b2, idx, txn="rt-b1", **kw)
    assert rep2["action"] == "completed_replay"
    # NOT zero — the probe did not re-run against the mutated index
    assert rep2["n_survivors"] == 8
    assert _ids(rep2["survivors"]) == set(range(120, 128))
    assert census() == c2  # nothing double-appended
    assert txn_committed(idx, "rt-b1")

    # crash BEFORE the manifest froze: replay restages from scratch
    def crash_on_manifest(p, text, spark_=None):
        if "/_ingest_tmp/" in p and p.endswith("_manifest.json"):
            raise OSError("injected crash before manifest freeze")
        return real_write_text(p, text, spark_)

    b3 = _vec_fixture(spark, range(140, 148), clone_of={220: 120})
    with mock.patch.object(fsutil, "write_text", crash_on_manifest):
        with pytest.raises(OSError, match="injected"):
            SIM.semantic_ingest_round(b3, idx, txn="rt-b2", **kw)
    assert census() == c2  # nothing moved
    rep3 = SIM.semantic_ingest_round(b3, idx, txn="rt-b2", **kw)
    assert rep3["action"] == "appended"
    assert _ids(rep3["survivors"]) == set(range(140, 148))


def test_stream_semantic_ingest_sequential_rounds(spark, tmp_path):
    """The streamed drain == calling semantic_ingest_round per batch by
    hand: batch 2's clone of a batch-1 SURVIVOR drops through the
    index, a re-drain runs zero batches, a manual replay of the
    drained txn id is a no-op, and the final index holds exactly
    corpus + survivors."""
    from chicago_crash_data_pipeline_dashboard_spark.streaming.ingest import (
        _stream_ledger_id,
        stream_semantic_ingest,
    )

    corpus = _vec_fixture(spark, range(30))
    b1 = _vec_fixture(spark, range(100, 110), clone_of={200: 3, 201: 100})
    b2 = _vec_fixture(spark, range(120, 130), clone_of={210: 100, 211: 5})

    idx = str(tmp_path / "ivf")
    SIM.write_ivf_index(corpus, idx, n_clusters=8, seed=42)
    idx2 = str(tmp_path / "ivf_manual")
    SIM.write_ivf_index(corpus, idx2, n_clusters=8, seed=42)

    src = str(tmp_path / "incoming")
    args = dict(
        spark=spark, src_dir=src, index_path=idx,
        checkpoint_dir=str(tmp_path / "ckpt"), threshold=0.9, n_probe=8,
        survivors_dir=str(tmp_path / "surv"),
    )
    b1.coalesce(1).write.mode("append").parquet(src)
    r1 = stream_semantic_ingest(**args)
    b2.coalesce(1).write.mode("append").parquet(src)
    r2 = stream_semantic_ingest(**args)
    assert [r["action"] for r in r1 + r2] == ["appended", "appended"]

    surv1 = _ids(spark.read.parquet(f"{tmp_path}/surv/batch=0"))
    surv2 = _ids(spark.read.parquet(f"{tmp_path}/surv/batch=1"))
    assert surv1 == set(range(100, 110))
    assert surv2 == set(range(120, 130))

    # re-drain: the file-source checkpoint dedups input
    assert stream_semantic_ingest(**args) == []

    # manual replay of the drained batch's txn id: no-op, same count
    replay = SIM.semantic_ingest_round(
        b1, idx, threshold=0.9, n_probe=8,
        txn=f"{_stream_ledger_id(args['checkpoint_dir'])}-b0",
    )
    assert replay["action"] == "skipped_replay"
    assert replay["n_survivors"] == len(surv1)

    # parity with hand-run sequential rounds on an identical index
    m1 = SIM.semantic_ingest_round(b1, idx2, threshold=0.9, n_probe=8)
    m2 = SIM.semantic_ingest_round(b2, idx2, threshold=0.9, n_probe=8)
    assert _ids(m1["survivors"]) == surv1
    assert _ids(m2["survivors"]) == surv2
    held = _ids(spark.read.parquet(idx).select(F.col("neighbor_id").alias("vec_id")))
    assert held == set(range(30)) | surv1 | surv2


def test_semantic_ingest_round_ivfpq(spark, tmp_path):
    """The round over the IVF-PQ kind: survivors appended under the
    index's own encode mode, txn replay is a no-op, and the grown
    index's probe equals a same-quantizer rebuild's."""
    corpus = _vec_fixture(spark, range(60))
    b1 = _vec_fixture(spark, range(100, 110), clone_of={200: 3})
    idx = str(tmp_path / "ivfpq")
    SIM.write_ivfpq_index(corpus, idx, n_clusters=8, m=4, ks=16, seed=42)

    rep = SIM.semantic_ingest_round(b1, idx, threshold=0.9, n_probe=8, txn="pq-b0")
    assert rep["action"] == "appended"
    assert _ids(rep["survivors"]) == set(range(100, 110))
    rep2 = SIM.semantic_ingest_round(b1, idx, threshold=0.9, n_probe=8, txn="pq-b0")
    assert rep2["action"] == "skipped_replay"
    assert rep2["n_survivors"] == 10

    q = _vec_fixture(spark, range(5))
    got = sorted(map(tuple, SIM.ivfpq_topk_indexed(spark, idx, q, k=5, n_probe=8).collect()))
    grown = corpus.unionByName(b1.join(
        rep["survivors"].select("vec_id"), "vec_id", "left_semi"
    ))
    idx2 = str(tmp_path / "rebuild")
    SIM.write_ivfpq_index(
        grown, idx2,
        quantizers=(
            SIM.read_ivf_centroids(spark, idx),
            SIM.read_pq_codebook(spark, idx),
        ),
        encode=SIM.read_ivfpq_encode_mode(spark, idx),
    )
    want = sorted(map(tuple, SIM.ivfpq_topk_indexed(spark, idx2, q, k=5, n_probe=8).collect()))
    assert got == want


def test_semantic_regime_matches_ivfpq_write_side(spark, tmp_path):
    """r14 review-pass regression: a small-CLUSTER IVF-PQ index can
    still be batched-assigned at write time (residual encode or
    ks >= _LLOYD_MATMUL_MIN_K force the numpy regime regardless of
    cluster count) — the semantic probe must follow the index's full
    write-side switch, exactly as ivfpq_topk_indexed does, or a
    near-tie could prune away an indexed exact duplicate's cluster.
    Pins: regime resolution for all three index shapes, and the
    exact-duplicate guarantee on a residual-encoded small-k index at
    the minimum probe."""
    corpus = _vec_fixture(spark, range(60))
    idx = str(tmp_path / "ivfpq_res")
    SIM.write_ivfpq_index(
        corpus, idx, n_clusters=8, m=4, ks=16, seed=42, encode="residual"
    )
    cents = SIM.read_ivf_centroids(spark, idx)
    assert SIM._index_assign_regime(spark, idx, True, cents) == "batched"

    idx2 = str(tmp_path / "ivf_small")
    SIM.write_ivf_index(corpus, idx2, n_clusters=8, seed=42)
    assert (
        SIM._index_assign_regime(
            spark, idx2, False, SIM.read_ivf_centroids(spark, idx2)
        )
        == "hof"
    )

    idx3 = str(tmp_path / "ivfpq_direct")
    SIM.write_ivfpq_index(
        corpus, idx3, n_clusters=8, m=4, ks=16, seed=42, encode="direct"
    )
    assert (
        SIM._index_assign_regime(
            spark, idx3, True, SIM.read_ivf_centroids(spark, idx3)
        )
        == "hof"
    )

    # exact-duplicate guarantee on the residual (batched-regime) index
    # at the minimum probe width — the invariant the regime match
    # protects
    batch = _vec_fixture(spark, range(100, 108), clone_of={200: 3, 201: 7})
    surv = SIM.semantic_dedup_against(batch, idx, threshold=0.99, n_probe=1)
    assert _ids(surv) == set(range(100, 108))
    rep = SIM.semantic_ingest_round(batch, idx, threshold=0.99, n_probe=1)
    assert _ids(rep["survivors"]) == set(range(100, 108))


def test_bulk_rename_protocol_semantics(spark, tmp_path):
    """fsutil.bulk_rename (r15 — the txn ledger's batched move loop):
    fresh moves, partial-replay convergence under skip_existing,
    missing-parent creation, and the existing-destination refusal that
    mirrors fsutil.rename."""
    src = tmp_path / "src"
    dst = tmp_path / "dst"
    src.mkdir()
    for i in range(6):
        (src / f"f{i}").write_text(str(i))

    # fresh path: destinations' parent doesn't exist yet -> created on
    # demand, all files moved
    pairs = [(f"{src}/f{i}", f"{dst}/sub{i % 2}/f{i}") for i in range(4)]
    assert FS.bulk_rename(pairs) == 4
    for i in range(4):
        assert (dst / f"sub{i % 2}" / f"f{i}").read_text() == str(i)

    # replay convergence: 2 of 3 already moved -> only the third moves
    (src / "f0").write_text("again")  # simulate a restaged file
    replay = [(f"{src}/f0", f"{dst}/sub0/f0"),  # dest exists: skip
              (f"{src}/f4", f"{dst}/sub0/f4"),
              (f"{src}/f5", f"{dst}/sub1/f5")]
    assert FS.bulk_rename(replay, skip_existing=True) == 2
    assert (dst / "sub0" / "f0").read_text() == "0"  # original kept
    assert (src / "f0").exists()  # skipped source left in place

    # without skip_existing an existing destination refuses loudly
    (src / "f6").write_text("6")
    import pytest as _pytest

    with _pytest.raises(FileExistsError):
        FS.bulk_rename([(f"{src}/f6", f"{dst}/sub0/f4")])
    # and a missing source is a real failure, not a silent skip
    # (Hadoop raises FileNotFoundException through the gateway)
    with _pytest.raises(Exception, match="missing"):
        FS.bulk_rename([(f"{src}/missing", f"{dst}/sub0/nope")])
