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


def test_extend_components_equals_full_recompute(spark):
    """Star-graph exactness gate: extending run-1 assignments with
    run-2's edge batch must equal connected_components over the full
    union — including batch-only chains, batch-vs-corpus merges, a
    chain of new edges fusing two old components, and a new node
    taking over as a component's canonical (smaller id than every
    member)."""
    from chicago_crash_data_pipeline_dashboard_spark.operators.graph import (
        extend_components,
    )

    run1 = [(2, 1), (2, 3), (10, 11), (11, 12), (20, 21), (30, 31), (40, 41)]
    # 50-51-52: new-only chain; 3-10: merges comps 1 and 10;
    # 21-30: merges comps 20 and 30 through a new node 99;
    # 0-40: new node 0 becomes comp 40's canonical
    run2 = [(50, 51), (51, 52), (3, 10), (21, 99), (99, 30), (0, 40)]

    e1 = spark.createDataFrame(run1, "src long, dst long")
    e2 = spark.createDataFrame(run2, "src long, dst long")
    assignments = connected_components(e1)

    got = {r["node"]: r["comp"] for r in extend_components(assignments, e2).collect()}
    want = {
        r["node"]: r["comp"]
        for r in connected_components(e1.unionByName(e2)).collect()
    }
    assert got == want == _union_find(run1 + run2)
    assert got[40] == 0  # new canonical adopted
    assert got[12] == 1  # old comps 1+10 fused
    assert got[30] == 20  # fused through the new bridge node
    assert got[52] == 50  # batch-only chain clustered


def test_extend_components_leaves_untouched_rows_alone(spark):
    """Components with no endpoint in the batch pass through via the
    broadcast anti-join — same rows, and the iterative recompute never
    sees them (the affected star excludes their nodes)."""
    from chicago_crash_data_pipeline_dashboard_spark.operators.graph import (
        extend_components,
    )

    run1 = [(2, 1), (10, 11), (20, 21)]
    run2 = [(11, 99)]
    e1 = spark.createDataFrame(run1, "src long, dst long")
    e2 = spark.createDataFrame(run2, "src long, dst long")
    assignments = connected_components(e1)

    stats: dict = {}
    out = extend_components(assignments, e2, stats_out=stats)
    got = {r["node"]: r["comp"] for r in out.collect()}
    assert got == _union_find(run1 + run2)
    # the iteration ran over the affected subgraph only: comp 10's
    # 2 members + the new node — comps 1 and 20 never entered it
    assert stats["rounds"] >= 1
    affected_nodes = {10, 11, 99}
    recomputed = {
        r["node"]
        for r in extend_components(assignments, e2)
        .join(assignments.withColumnRenamed("comp", "_old"), "node", "left")
        .filter(F.col("_old").isNull() | (F.col("comp") != F.col("_old")))
        .collect()
    }
    assert recomputed <= affected_nodes


def test_components_at_rest_extends_in_place(spark, tmp_path):
    """Cross-run clustering at rest: each round's pairs fold into the
    persisted (node, comp) table; only touched comp-hash partitions
    rewrite (merged components move to their new partition, emptied
    partitions are cleared); interleaved extends equal one full-union
    recompute."""
    from chicago_crash_data_pipeline_dashboard_spark.operators.graph import (
        extend_components_at_rest,
        read_components,
        write_components,
    )

    run1 = [(2, 1), (2, 3), (10, 11), (20, 21), (40, 41)]
    run2 = [(3, 10), (50, 51)]          # merge comps 1+10; new pair
    run3 = [(51, 52), (0, 40), (21, 1)]  # grow 50s; new canonical; merge 20s into 1s

    e1 = spark.createDataFrame(run1, "src long, dst long")
    path = str(tmp_path / "cc")
    write_components(connected_components(e1), path, parts=8)

    s2 = extend_components_at_rest(
        spark, path, spark.createDataFrame(run2, "src long, dst long")
    )
    assert s2["touched_comps"] == 2  # comps 1 and 10 (50/51 are new nodes)
    got2 = {r["node"]: r["comp"] for r in read_components(spark, path).collect()}
    assert got2 == _union_find(run1 + run2)

    s3 = extend_components_at_rest(
        spark, path, spark.createDataFrame(run3, "src long, dst long")
    )
    got3 = {r["node"]: r["comp"] for r in read_components(spark, path).collect()}
    assert got3 == _union_find(run1 + run2 + run3)
    assert got3[21] == 1 and got3[40] == 0 and got3[52] == 50
    # table stays consistent: one row per node, no stale leftovers
    n = read_components(spark, path).count()
    assert n == len(got3) == len(_union_find(run1 + run2 + run3))
    assert s3["n_updated"] >= s3["touched_comps"]


def test_components_at_rest_prunes_scan_and_clears_emptied(spark, tmp_path):
    """The members re-read is partition-pruned to the touched comps'
    part values, and an old partition whose rows all moved to a merged
    component's new partition is removed rather than left stale."""
    import glob as globmod

    from chicago_crash_data_pipeline_dashboard_spark.operators.graph import (
        extend_components_at_rest,
        read_components,
        write_components,
    )

    # many parts so each comp very likely has its own partition
    run1 = [(100, 101), (200, 201)]
    e1 = spark.createDataFrame(run1, "src long, dst long")
    path = str(tmp_path / "cc2")
    write_components(connected_components(e1), path, parts=64)
    parts_before = {
        d.rsplit("=", 1)[1] for d in globmod.glob(f"{path}/assign/part=*")
    }

    # merge both comps: comp 200's rows move into comp 100's partition
    edges = spark.createDataFrame([(101, 200)], "src long, dst long")
    stats = extend_components_at_rest(spark, path, edges)
    assert stats["touched_comps"] == 2
    got = {r["node"]: r["comp"] for r in read_components(spark, path).collect()}
    assert got == {100: 100, 101: 100, 200: 100, 201: 100}
    parts_after = {
        d.rsplit("=", 1)[1] for d in globmod.glob(f"{path}/assign/part=*")
    }
    # the merged-away component's partition is gone unless it collided
    # with the survivor's partition value
    if len(parts_before) == 2:
        assert len(parts_after) == 1


def test_components_at_rest_string_ids(spark, tmp_path):
    """Doc ids are often strings — the at-rest tables and the touched-
    comp literal frame must carry the source type through (no
    hardcoded long schema)."""
    from chicago_crash_data_pipeline_dashboard_spark.operators.graph import (
        extend_components_at_rest,
        read_components,
        write_components,
    )

    e1 = spark.createDataFrame([("d2", "d1"), ("d5", "d6")], "src string, dst string")
    path = str(tmp_path / "cc_str")
    write_components(connected_components(e1), path, parts=8)
    extend_components_at_rest(
        spark, path, spark.createDataFrame([("d1", "d0"), ("d6", "d7")], "src string, dst string")
    )
    got = {r["node"]: r["comp"] for r in read_components(spark, path).collect()}
    assert got == {"d0": "d0", "d1": "d0", "d2": "d0", "d5": "d5", "d6": "d5", "d7": "d5"}


def test_components_at_rest_new_comp_landing_in_foreign_partition(spark, tmp_path):
    """A merged/new component's comp-hash can land in a partition that
    holds only UNTOUCHED components; the dynamic-overwrite write must
    carry that partition's existing rows along or they are silently
    dropped. parts=1 forces the collision deterministically."""
    from chicago_crash_data_pipeline_dashboard_spark.operators.graph import (
        extend_components_at_rest,
        read_components,
        write_components,
    )

    run1 = [(100, 101), (200, 201)]
    run2 = [(50, 51)]  # brand-new component, no touched comps at all
    path = str(tmp_path / "cc_foreign")
    write_components(
        connected_components(spark.createDataFrame(run1, "src long, dst long")),
        path,
        parts=1,
    )
    extend_components_at_rest(
        spark, path, spark.createDataFrame(run2, "src long, dst long")
    )
    got = {r["node"]: r["comp"] for r in read_components(spark, path).collect()}
    assert got == _union_find(run1 + run2)  # 100s and 200s must survive
