"""Partition-pruned hard deletion from hive-partitioned lake tables —
right-to-be-forgotten for the at-rest family (signature tables, ANN
indexes, component tables). The one lifecycle operation append /
compact / probe did not cover: removing rows for a key set WITHOUT
rewriting (or even reading) the rest of a 100 TB table.

Plan shape (the same discipline as ``graph.extend_components_at_rest``):

1. ONE column-pruned scan — key + partition column only, two small
   values per row — semi-joined with the BROADCAST key set finds the
   partitions that hold hits (bounded collect: ≤ #partition values);
2. only those partitions are re-read in full, anti-joined against the
   keys, and written back with dynamic partition overwrite (surviving
   rows of a touched partition ride along in the same write);
3. a partition whose every row matched receives no rows — dynamic
   overwrite cannot clear it — so those are removed explicitly through
   the Hadoop FileSystem API (file/hdfs/s3a alike).

Untouched partitions are never read past the pruned key scan and never
rewritten. Write amplification ≈ touched partitions × partition size —
for key-hash-partitioned tables (the signature family) a k-key delete
touches ≤ k partitions; for cluster-partitioned ANN indexes it touches
the deleted vectors' clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import fsutil as FS


def dynamic_partition_overwrite(df: DataFrame, data_dir: str, partition_col: str):
    """Write ``df`` with dynamic partition overwrite (replacing ONLY
    the partitions it carries rows for) and return the set of
    partition values written — the save/set/restore of
    ``spark.sql.sources.partitionOverwriteMode`` plus the
    written-partitions collect that every at-rest rewrite needs
    (extend_components_at_rest / forget_nodes / deletion). Emptied
    partitions (a value the caller expected but df doesn't carry) are
    the caller's to clear: dynamic overwrite cannot delete them."""
    spark = df.sparkSession
    written = {
        r[partition_col] for r in df.select(partition_col).distinct().collect()
    }
    saved = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.partitionBy(partition_col).mode("overwrite").parquet(data_dir)
    finally:
        if saved is not None:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", saved)
        else:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    return written


def delete_rows_partitioned(
    spark,
    data_dir: str,
    keys: DataFrame,
    key_col: str,
    partition_col: str = "part",
    files_per_part: int = 1,
    refresh_stats: tuple[str, list[str]] | None = None,
) -> dict:
    """Delete every row of the hive-partitioned parquet table at
    ``data_dir`` whose ``key_col`` appears in ``keys`` (a one-column
    DataFrame; broadcast — the key set is the small side by contract,
    like every forget request). Returns {rows_deleted, parts_touched,
    parts_emptied, parts_total, stats_refreshed}.

    ``refresh_stats=(stats_col, bucket_key_cols)``: refresh a
    write-time bucket-count statistics column (the MinHash/SimHash
    ``bucket_size`` hot-bucket cap) inside the rewrite the deletion
    already pays for. Without it, stale stats over-state bucket sizes
    after a delete, so a capped probe may skip a bucket that has
    shrunk below the cap — a recall loss (VERDICT r12 item 5). The
    refreshed value is ``max(0, old value − rows deleted from the
    bucket)`` — a DELTA, not a recount: the per-bucket deleted counts
    come from the already-pruned hit scan (a frame bounded by the
    forget request: ≤ |keys| × bands rows) and broadcast-join onto the
    surviving rows, so the wide rewrite never gains a shuffle (a
    windowed recount over the touched partitions measured 2.2× on the
    sf0.1 gate — ~400k near-unique window groups of wide signature
    rows). Soundness: the delta is monotone non-increasing per row, so
    no bucket newly drops — the family's cap semantics are per WRITE
    SEGMENT, and a multi-segment bucket's merged total could otherwise
    exceed every per-segment value and newly exclude buckets the
    forget never targeted; deletions landing in a DIFFERENT write
    segment over-subtract, which only under-states sizes — the probe
    checks more buckets, never fewer (the recall-safe direction).
    Tables without the column (exact fingerprints) pass None."""
    key_set = F.broadcast(keys.select(F.col(keys.columns[0]).alias(key_col)).distinct())
    table = spark.read.parquet(data_dir)
    if partition_col not in table.columns:
        raise ValueError(
            f"{data_dir} is not partitioned by {partition_col!r} — "
            "partition-pruned deletion needs a hive partition column; "
            "rewrite flat tables with a filter instead"
        )
    hits = table.select(key_col, partition_col).join(key_set, key_col, "left_semi")
    # bounded collect: ≤ #partition values by construction
    touched = sorted(
        r[partition_col]
        for r in hits.select(partition_col).distinct().collect()
    )
    if not touched:
        return {
            "rows_deleted": 0, "parts_touched": 0, "parts_emptied": 0,
            "parts_total": len(FS.glob_paths(f"{data_dir.rstrip('/')}/{partition_col}=*")),
            "stats_refreshed": False,
        }
    sub = table.filter(F.col(partition_col).isin(touched))
    remain = sub.join(key_set, key_col, "left_anti")
    refreshed = False
    if refresh_stats is not None:
        stats_col, bucket_keys = refresh_stats
        if stats_col in table.columns:
            deltas = (
                sub.join(key_set, key_col, "left_semi")
                .groupBy(*bucket_keys)
                .agg(F.count(F.lit(1)).alias("__sf_del"))
            )
            remain = (
                remain.join(F.broadcast(deltas), list(bucket_keys), "left")
                .withColumn(
                    stats_col,
                    F.greatest(
                        F.lit(0).cast("long"),
                        F.col(stats_col) - F.coalesce("__sf_del", F.lit(0)),
                    ),
                )
                .drop("__sf_del")
                .select(*sub.columns)  # the join moved keys first; restore
            )
            refreshed = True
    if files_per_part > 1:
        salt = F.pmod(F.xxhash64(key_col), F.lit(files_per_part))
        remain = remain.repartition(F.col(partition_col), salt)
    else:
        remain = remain.repartition(F.col(partition_col))
    # rows_deleted from the already-required pruned key scan — not a
    # second full read of the touched partitions
    n_deleted = hits.count()
    remain = remain.persist()
    try:
        written = dynamic_partition_overwrite(remain, data_dir, partition_col)
    finally:
        remain.unpersist()
    emptied = set(touched) - written
    for p in emptied:
        FS.delete(f"{data_dir.rstrip('/')}/{partition_col}={p}")
    return {
        "rows_deleted": int(n_deleted),
        "parts_touched": len(touched),
        "parts_emptied": len(emptied),
        "parts_total": len(
            FS.glob_paths(f"{data_dir.rstrip('/')}/{partition_col}=*")
        ),
        "stats_refreshed": refreshed,
    }
