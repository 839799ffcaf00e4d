"""Connected-components semantics (operators/graph.py) against a
hand-computed union-find, including a long chain (multi-round
convergence) — the registered `doc_dup_clusters` query goes through
the recursive-CTE differential oracle in test_analytics_oracle.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from chicago_crash_data_pipeline_dashboard_spark.operators.graph import (
    connected_components,
    dedup_clusters,
)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_components_match_union_find(spark):
    # chain 1-2-3-4-5 (diameter 4 → multiple propagation rounds),
    # triangle 10-11-12, isolated pair (20, 21)
    edges = [(2, 1), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["comp"] for r in connected_components(df).collect()}
    assert got == _union_find(edges)


def test_dedup_clusters_summary(spark):
    edges = [(7, 3), (3, 9), (100, 101)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    rows = {r["cluster"]: r for r in dedup_clusters(df).collect()}
    assert set(rows) == {3, 100}
    assert rows[3]["n_docs"] == 3 and rows[3]["doc_ids"] == "3,7,9"
    assert rows[100]["doc_ids"] == "100,101"


def test_components_keep_one_policy(spark):
    """Semi-join on cluster == node keeps exactly one doc per group."""
    edges = [(1, 2), (2, 3), (10, 11)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    comp = connected_components(df, "doc_a", "doc_b")
    keep = comp.filter(F.col("node") == F.col("comp"))
    assert sorted(r["node"] for r in keep.collect()) == [1, 10]


def test_components_reliable_checkpoint_equivalent(spark, tmp_path):
    """use_reliable_checkpoint must not change results — only where the
    lineage-truncation blocks live."""
    from chicago_crash_data_pipeline_dashboard_spark.operators.graph import (
        connected_components,
    )

    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        ["src", "dst"],
    )
    local = {(r.node, r.comp) for r in connected_components(edges).collect()}
    reliable = {
        (r.node, r.comp)
        for r in connected_components(edges, use_reliable_checkpoint=True).collect()
    }
    assert local == reliable


def test_components_empty_edges_converge_immediately(spark):
    """SUM over zero rows observes NULL; the convergence test must
    treat that as 0 changes, not run all max_iter rounds."""
    import time

    from chicago_crash_data_pipeline_dashboard_spark.operators.graph import (
        connected_components,
    )

    empty = spark.createDataFrame([], "src long, dst long")
    t0 = time.perf_counter()
    out = connected_components(empty, max_iter=25)
    assert out.count() == 0
    assert time.perf_counter() - t0 < 20  # 25 un-converged rounds would take far longer
