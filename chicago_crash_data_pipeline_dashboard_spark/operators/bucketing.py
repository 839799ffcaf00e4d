"""Bucketed tables: co-located joins and aggregations without shuffles.

At 100 TB the dominant cost of the silver merge (J2-J4) and the gold
anti-join (J6) is shuffling the fact side on the join key. Writing both
sides bucketed (and sorted) by that key pins partitioning AT REST:
Spark's scan reports the bucket distribution, the join's Exchange
disappears, and a sort-merge join runs bucket-by-bucket
(`tests/test_plans.py` asserts the shuffle-free plan).

Rules of thumb encoded here:
- bucket count = expected table size / healthy partition size
  (128-512 MB per bucket file); both sides MUST use the same count and
  key for co-location;
- `sortBy` the bucket key too — the merge join skips its sort;
- repartition by the bucket key before writing so each task writes one
  file per bucket (otherwise tasks × buckets small files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    name: str,
    key: str,
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (+sorted) table registered in the
    session catalog."""
    writer = (
        df.repartition(n_buckets, key)
        .write.mode("overwrite")
        .bucketBy(n_buckets, key)
    )
    if sort:
        writer = writer.sortBy(key)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str
) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs the
    plan contains no Exchange on either side."""
    left, right = spark.table(left_table), spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key])
