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
