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


def compact_dir(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    target_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
) -> dict[str, int]:
    """Rewrite ``path`` (one non-partitioned dataset directory) into
    ~``target_bytes`` files. No-op if it already has fewer than
    ``min_files`` files. Returns before/after stats."""
    before = dir_stats(path)
    if before["files"] < min_files:
        return {**before, "files_after": before["files"], "compacted": 0}

    n_out = max(1, math.ceil(before["bytes"] / target_bytes))
    if n_out >= before["files"]:  # already at/under target size
        return {**before, "files_after": before["files"], "compacted": 0}

    tmp = path.rstrip("/") + "_compact_tmp"
    df = spark.read.format(fmt).load(path)
    df.repartition(n_out).write.format(fmt).mode("overwrite").save(tmp)

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
    leaves = []
    for root, dirs, files in os.walk(base):
        if any(not f.startswith(("_", ".")) for f in files) and "=" in os.path.basename(
            root
        ):
            leaves.append(root)
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
    totals = {"files": 0, "bytes": 0, "files_after": 0, "compacted": 0}
    for leaf in sorted(leaves):
        r = compact_dir(spark, leaf, fmt=fmt, target_bytes=target_bytes, min_files=min_files)
        for k in totals:
            totals[k] += r[k]
    return totals
