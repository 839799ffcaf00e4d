"""Connected components over a pair/edge list — the dedup-clustering
step that turns near-duplicate PAIRS (Jaccard / MinHash / SimHash /
embedding output) into groups with one canonical document each.

Algorithm: minimum-label propagation WITH pointer jumping — every
node starts as its own component id; each round takes the min id over
itself and its neighbors, then follows its label's label
(``comp := comp[comp]``). The jump halves label-tree depth each round,
so convergence needs O(log diameter) rounds, not O(diameter) — at
local scale each round costs ~0.5 s of job latency regardless of data
size, and at 100 TB each round is a full shuffle, so round count is
THE cost either way (same reason the large-star/small-star algorithm
of Kiveris et al., "Connected Components in MapReduce and Beyond",
exists). Per round: two joins + one groupBy (shuffles on the node
id) and a ``localCheckpoint`` to truncate lineage (otherwise the plan
doubles every round and the driver becomes the bottleneck); the
convergence test rides the checkpoint job as an in-plan Observation
metric, so each round is exactly ONE Spark action.

Min-label semantics map 1:1 onto a recursive-CTE oracle (transitive
closure + group-min), putting even this iterative operator under the
differential gate.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    use_reliable_checkpoint: bool = False,
    stats_out: dict | None = None,
) -> DataFrame:
    """(node, comp) for every node appearing in ``edges``; ``comp`` is
    the minimum node id reachable from the node (undirected).

    ``use_reliable_checkpoint=True`` swaps ``localCheckpoint`` (blocks
    on executor storage — lost forever if an executor dies mid-
    iteration) for a reliable ``checkpoint()`` persisted to the
    SparkContext's checkpoint dir — the right choice on a real cluster
    where executor churn over a many-round job is expected. Requires
    ``spark.sparkContext.setCheckpointDir(...)`` to have been called.

    ``stats_out``: pass a dict to receive ``{"rounds": int,
    "round_secs": [float, ...]}`` for THIS run — round count is the
    operator's real cost (each round is a full shuffle at scale), so
    the bench records it alongside wall time to explain run-to-run
    movement. A caller-owned dict, not a module global: concurrent
    runs (parallel tests, nested pipelines) each see their own stats.
    """

    def _ckpt(df: DataFrame) -> DataFrame:
        if use_reliable_checkpoint:
            # persist first: reliable checkpoint materializes via the
            # eager job and then RE-RUNS the lineage to write the
            # checkpoint files — uncached, every round would compute
            # its shuffles twice (the documented persist-before-
            # checkpoint caveat). localCheckpoint caches by design.
            df = df.persist()
            out = df.checkpoint(eager=True)
            df.unpersist()
            return out
        return df.localCheckpoint()

    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = sym.union(
        sym.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    sym = _ckpt(sym)

    # Seed labels with min(self, direct neighbors) — the fixpoint of
    # round 1's min-label step without its two joins (one groupBy over
    # the already-checkpointed symmetric edges): cuts one full round
    # off every run.
    labels = (
        sym.groupBy("a")
        .agg(F.least(F.col("a"), F.min("b")).alias("comp"))
        .select(F.col("a").alias("node"), "comp")
    )
    rounds, round_secs = 0, []
    for _ in range(max_iter):
        t0 = time.perf_counter()
        nbr_min = (
            sym.join(labels, sym["a"] == labels["node"])
            .select(F.col("b").alias("node"), F.col("comp"))
        )
        propagated = (
            labels.select("node", "comp")
            .union(nbr_min)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        )
        # pointer jump: comp := comp[comp] (label of my label). The
        # label is always an existing node id, so the self-join hits.
        hop = propagated.select(
            F.col("node").alias("comp"), F.col("comp").alias("comp2")
        )
        stepped = propagated.join(hop, "comp", "left").select(
            "node", F.coalesce("comp2", "comp").alias("comp")
        )
        # Convergence via an in-plan Observation riding the checkpoint
        # job: join the previous labels back on (co-partitioned — the
        # checkpointed side keeps its hash partitioning) and SUM the
        # changed flags as a query metric. Zero extra actions: the
        # eager checkpoint's own job populates the observation, where
        # the previous design paid a separate join+count job every
        # second round. Labels only ever decrease, so changed == 0 in
        # any round means a fixpoint.
        obs = Observation()
        flagged = (
            stepped.join(labels.select("node", F.col("comp").alias("_prev")), "node")
            .observe(
                obs,
                # coalesce: SUM over ZERO rows is NULL, and None != 0 —
                # without it an empty edge list runs all max_iter rounds
                F.coalesce(
                    F.sum((F.col("comp") != F.col("_prev")).cast("long")), F.lit(0)
                ).alias("changed"),
            )
            .select("node", "comp")
        )
        labels = _ckpt(flagged)
        rounds += 1
        round_secs.append(round(time.perf_counter() - t0, 4))
        if obs.get["changed"] == 0:
            break
    if stats_out is not None:
        stats_out.clear()
        stats_out.update({"rounds": rounds, "round_secs": round_secs})
    return labels


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iter: int = 25,
    use_reliable_checkpoint: bool = False,
    stats_out: dict | None = None,
) -> DataFrame:
    """Near-dup pair list → per-cluster summary: canonical id (= min
    member), member count, sorted member list. The keep-one-per-cluster
    policy of a curation pipeline is then a semi-join on
    ``cluster == node``.

    ``doc_ids`` is emitted as a comma-joined STRING, not an array:
    string scalars survive any downstream tabular canonicalization
    (pandas cannot sort/hash list cells), and the serialization is
    deterministic because members are sorted on their native type
    before stringification.
    """
    from .dedup import joined_doc_ids

    comp = connected_components(
        pairs,
        src=id_a,
        dst=id_b,
        max_iter=max_iter,
        use_reliable_checkpoint=use_reliable_checkpoint,
        stats_out=stats_out,
    )
    return (
        comp.groupBy(F.col("comp").alias("cluster"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            joined_doc_ids("node").alias("doc_ids"),
        )
    )
