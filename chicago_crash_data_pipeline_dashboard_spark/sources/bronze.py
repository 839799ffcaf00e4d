"""Bronze layer: partitioned gzip-JSON pages, Spark-native read/write.

The reference extractor writes pages as gzip JSON arrays under
``{prefix}/{alias}/year=YYYY/corr={corr}/offset=..._limit=....json.gz``
(extractor/main.go:636-651, 886-907). Re-expressed Spark-first:

- S3/S4 sink: ``df.write.partitionBy('year','corr').json(path,
  compression='gzip')`` — the hive layout the extractor hand-builds is
  what partitionBy produces natively;
- S5/S6/S7 source: ``spark.read.schema(...).json`` over the layout with
  ``basePath`` so ``year``/``corr`` become partition columns; path
  globs give partition pruning (only the requested corr's files are
  listed and read);
- object user-metadata (run_id, ingest_ts) becomes ordinary columns —
  Spark has no object metadata (SURVEY §1.3).

At 100 TB: bronze should be parquet, not JSON — both writers are
provided; the JSON one exists for layout parity with the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def write_bronze(
    df: DataFrame,
    base_dir: str,
    alias: str,
    corr: str,
    year_col: str = "crash_date",
    fmt: str = "json",
) -> None:
    """S3/S4: partition rows by event-time year + run id and write
    gzip-JSON (reference layout) or parquet (scale layout).

    Unknown year is kept as year=0 (ST6, extractor/main.go:876-883
    keeps crashes with y==0 rather than dropping).
    """
    out = df.withColumn(
        "year", F.coalesce(F.year(F.to_timestamp(F.col(year_col))), F.lit(0))
    ).withColumn("corr", F.lit(corr))
    writer = out.write.mode("append").partitionBy("year", "corr")
    if fmt == "json":
        writer.option("compression", "gzip").json(f"{base_dir}/{alias}")
    else:
        writer.parquet(f"{base_dir}/{alias}")


def read_bronze(
    spark: SparkSession,
    base_dir: str,
    alias: str,
    schema: T.StructType,
    corr: str | None = None,
    fmt: str = "json",
) -> DataFrame:
    """S5-S7: read bronze pages for one run (or all runs).

    The ``corr={corr}`` path glob prunes partitions at file-listing
    time — the Spark-native version of the reference's key-substring
    filter (transformer.py:185-190). An explicit schema skips the
    inference pass (deterministic types, one less scan).
    """
    base = f"{base_dir}/{alias}"
    path = f"{base}/year=*/corr={corr}" if corr else base
    reader = spark.read.schema(_with_partitions(schema)).option("basePath", base)
    if fmt == "json":
        return reader.json(path)
    return reader.parquet(path)


def _with_partitions(schema: T.StructType) -> T.StructType:
    fields = list(schema.fields)
    names = {f.name for f in fields}
    if "year" not in names:
        fields.append(T.StructField("year", T.IntegerType(), True))
    if "corr" not in names:
        fields.append(T.StructField("corr", T.StringType(), True))
    return T.StructType(fields)
