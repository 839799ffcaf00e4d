"""Small-file compaction (sources/compact.py): file counts shrink,
data survives byte-for-byte, hive partitions keep pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from chicago_crash_data_pipeline_dashboard_spark.sources.compact import (
    compact_dir,
    compact_partitioned,
    dir_stats,
)


def test_compact_dir_preserves_data(spark, tmp_path):
    path = str(tmp_path / "flat")
    df = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
    df.repartition(40).write.parquet(path)  # 40 small files
    assert dir_stats(path)["files"] == 40

    before_sum = spark.read.parquet(path).agg(F.sum("v")).first()[0]
    r = compact_dir(spark, path, target_bytes=10 * 1024 * 1024)
    assert r["compacted"] == 1
    assert r["files_after"] < 40
    after = spark.read.parquet(path)
    assert after.count() == 10_000
    assert after.agg(F.sum("v")).first()[0] == before_sum


def test_compact_dir_noop_when_already_compact(spark, tmp_path):
    path = str(tmp_path / "one")
    spark.range(100).coalesce(1).write.parquet(path)
    r = compact_dir(spark, path)
    assert r["compacted"] == 0 and r["files_after"] == 1


def test_compact_partitioned_keeps_layout_and_pruning(spark, tmp_path):
    base = str(tmp_path / "part")
    df = spark.range(0, 4_000).withColumn("year", (F.col("id") % 2 + 2023).cast("int"))
    df.repartition(20).write.partitionBy("year").parquet(base)
    assert dir_stats(base)["files"] >= 40  # 20 per partition

    totals = compact_partitioned(spark, base, target_bytes=10 * 1024 * 1024)
    assert totals["compacted"] == 2
    assert totals["files_after"] < totals["files"]

    out = spark.read.parquet(base)
    assert out.count() == 4_000
    # partition pruning still applies after compaction
    plan = (
        out.filter(F.col("year") == 2023)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [isnotnull(year" in plan
    assert out.filter(F.col("year") == 2023).count() == 2_000


def test_compact_recovers_mid_swap_crash(spark, tmp_path):
    """A compaction that died between the two renames leaves only the
    `_compact_old__{name}` sibling; recovery must restore the original
    directory and discard the tmp before re-compacting."""
    import os
    import shutil

    from chicago_crash_data_pipeline_dashboard_spark.sources.compact import (
        _staging_paths,
        compact_dir,
        recover_compaction,
    )

    path = str(tmp_path / "ds")
    tmp, old = _staging_paths(path)
    assert tmp == str(tmp_path / "_compact_staging" / "tmp__ds")
    assert old == str(tmp_path / "_compact_staging" / "old__ds")
    spark.range(100).repartition(4).write.parquet(path)
    n = spark.read.parquet(path).count()

    # simulate: write finished to tmp, first rename done, then crash
    shutil.copytree(path, tmp)
    os.rename(path, old)
    assert not os.path.exists(path)
    assert os.path.isdir(str(tmp_path / "_compact_staging"))

    assert recover_compaction(path) == "restored_old+removed_tmp"
    assert spark.read.parquet(path).count() == n
    assert not os.path.exists(old)
    assert not os.path.exists(tmp)

    # stale tmp next to an intact dir is discarded inside compact_dir
    shutil.copytree(path, tmp)
    r = compact_dir(spark, path, min_files=2)
    assert not os.path.exists(tmp)
    assert spark.read.parquet(path).count() == n
    assert r["compacted"] == 1


def test_compact_partitioned_recovers_lost_partition(spark, tmp_path):
    """A partition existing only under the `_compact_staging` sibling
    must be restored and then compacted like any other leaf — and the
    staging layout must be INVISIBLE to partition discovery while it
    exists (a leaf-adjacent `k=v_compact_old` — or even
    `_compact_old__k=v`, since Spark's listing filter keeps
    underscore names containing '=' — would surface as a bogus
    partition value; a staging ROOT without '=' is skipped whole)."""
    import os

    from chicago_crash_data_pipeline_dashboard_spark.sources.compact import (
        _staging_paths,
        compact_partitioned,
        recover_partitioned,
    )
    from pyspark.sql import functions as F

    base = str(tmp_path / "part")
    df = spark.range(200).withColumn("k", (F.col("id") % 2).cast("int"))
    df.repartition(4).write.partitionBy("k").parquet(base)
    total = spark.read.parquet(base).count()
    _tmp1, old1 = _staging_paths(os.path.join(base, "k=1"))
    os.makedirs(os.path.dirname(old1))
    os.rename(os.path.join(base, "k=1"), old1)

    # the crash state is invisible: no bogus partition value surfaces
    crashed = spark.read.parquet(base)
    assert crashed.select("k").distinct().count() == 1

    compact_partitioned(spark, base, min_files=2)
    assert os.path.isdir(os.path.join(base, "k=1"))
    assert not os.path.exists(old1)
    assert spark.read.parquet(base).count() == total

    # probe-side insurance: recover_partitioned alone repairs the state
    _tmp0, old0 = _staging_paths(os.path.join(base, "k=0"))
    os.makedirs(os.path.dirname(old0), exist_ok=True)
    os.rename(os.path.join(base, "k=0"), old0)
    assert recover_partitioned(base) == 1
    assert spark.read.parquet(base).count() == total
    assert recover_partitioned(base) == 0
