"""Small-file compaction for the lake layers.

Streaming ingest and per-run bronze writes produce many small files
(one per micro-batch × partition); at 100 TB the resulting listing +
task-scheduling overhead dominates scan time long before data volume
does (every file is a task, every task is ~100 ms of overhead, and the
name-node/object-store listing is O(files)). Compaction rewrites a
directory to ~``target_bytes`` files:

- file count = ceil(input_bytes / target_bytes), derived from the
  actual on-disk size, not guessed;
- ``repartition(n)`` (round-robin) rather than ``coalesce(n)``:
  coalesce merges whole input partitions and inherits their skew —
  1000 tiny files + 1 huge one coalesce into lopsided outputs, while
  round-robin rebalances bytes evenly at the cost of one shuffle (the
  point of the job);
- hive-partitioned layouts are compacted per partition directory so
  partition pruning keeps working;
- writes land in a ``_compact_tmp`` sibling then atomically replace
  the input (same-filesystem rename) — readers never see a
  half-compacted directory.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession


def dir_stats(path: str) -> dict[str, int]:
    """(files, bytes) for the data files under ``path`` (recursive,
    ignoring _SUCCESS/_compact artifacts and hidden files)."""
    n_files = 0
    n_bytes = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            n_files += 1
            n_bytes += os.path.getsize(os.path.join(root, f))
    return {"files": n_files, "bytes": n_bytes}


def recover_compaction(path: str) -> str | None:
    """Repair leftovers from a compaction that crashed mid-swap.

    States (in swap order) and their repairs:

    - ``_compact_tmp`` present, ``path`` present → the rewrite aborted
      before the swap: discard tmp (possibly incomplete).
    - ``_compact_old`` present, ``path`` missing → crashed between the
      two renames: restore old → path (tmp, even if complete, is
      discarded — restoring the input is always safe; re-running the
      compaction is idempotent).
    - ``_compact_old`` present, ``path`` present → crashed after the
      swap, before cleanup: finish the cleanup.

    Returns the repair performed (or None).
    """
    tmp = path.rstrip("/") + "_compact_tmp"
    old = path.rstrip("/") + "_compact_old"
    action = None
    if os.path.exists(old) and not os.path.exists(path):
        os.rename(old, path)
        action = "restored_old"
    elif os.path.exists(old):
        shutil.rmtree(old)
        action = "removed_old"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
        action = (action + "+removed_tmp") if action else "removed_tmp"
    return action


def compact_dir(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    target_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
    sort_col: str | None = None,
    n_files: int | None = None,
) -> dict[str, int]:
    """Rewrite ``path`` (one non-partitioned dataset directory) into
    ~``target_bytes`` files. No-op if it already has fewer than
    ``min_files`` files. Returns before/after stats.

    ``sort_col``: preserve (and tighten) a sorted-within-files layout —
    the rewrite range-partitions on the column and sorts within
    partitions, so per-file row-group min/max stats stay selective for
    id-fetch scans (the PQ ``vectors`` table's contract). Round-robin
    ``repartition`` would destroy that ordering.

    ``n_files``: exact output file count override (e.g. an index's
    ``files_per_cluster``) instead of the size-derived count."""
    recover_compaction(path)
    before = dir_stats(path)
    if before["files"] < min_files:
        return {**before, "files_after": before["files"], "compacted": 0}

    n_out = n_files if n_files else max(1, math.ceil(before["bytes"] / target_bytes))
    if n_out >= before["files"]:  # already at/under target size
        return {**before, "files_after": before["files"], "compacted": 0}

    tmp = path.rstrip("/") + "_compact_tmp"
    df = spark.read.format(fmt).load(path)
    if sort_col is not None:
        df = (
            df.repartitionByRange(n_out, sort_col).sortWithinPartitions(sort_col)
            if n_out > 1
            else df.coalesce(1).sortWithinPartitions(sort_col)
        )
    else:
        df = df.repartition(n_out)
    df.write.format(fmt).mode("overwrite").save(tmp)

    old = path.rstrip("/") + "_compact_old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return {**before, "files_after": dir_stats(path)["files"], "compacted": 1}


def compact_partitioned(
    spark: SparkSession,
    base: str,
    fmt: str = "parquet",
    target_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
) -> dict[str, int]:
    """Compact every leaf partition directory (``k=v`` components)
    under ``base`` independently, preserving the hive layout (and so
    partition pruning). Partitions are independent jobs — on a
    cluster they can run concurrently; sequential here."""
    # Recover crash leftovers FIRST: a partition that died mid-swap may
    # exist only as `k=v_compact_old` (its `k=v` dir missing), which the
    # leaf walk below would never visit.
    for root, dirs, _files in os.walk(base):
        for d in list(dirs):
            if d.endswith(("_compact_old", "_compact_tmp")):
                orig = os.path.join(
                    root, d[: -len("_compact_old")]
                )  # both suffixes same length
                recover_compaction(orig)
                if d in dirs:
                    dirs.remove(d)
    leaves = []
    for root, dirs, files in os.walk(base):
        base_name = os.path.basename(root)
        if "_compact_" in base_name:  # crash leftovers, not partitions
            dirs[:] = []
            continue
        if any(not f.startswith(("_", ".")) for f in files) and "=" in base_name:
            leaves.append(root)
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
    totals = {"files": 0, "bytes": 0, "files_after": 0, "compacted": 0}
    for leaf in sorted(leaves):
        r = compact_dir(spark, leaf, fmt=fmt, target_bytes=target_bytes, min_files=min_files)
        for k in totals:
            totals[k] += r[k]
    return totals
