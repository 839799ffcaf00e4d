"""Silver layer CSV sink/source (S8/S9) + catalog introspection (S12).

The reference persists Silver as one ``merged.csv`` per run in object
storage (transformer.py:171-181 write; cleaner/minio_io.py:71-137
read). Spark-first:

- sink: ``make_csv_safe`` (F18) first — Array/Struct columns become
  ``*_json`` strings — then a header CSV under ``corr={corr}/``;
- source: header CSV read with explicit schema (deterministic) or
  inference (the reference's pandas behavior);
- at 100 TB silver should be parquet — CSV kept for reference layout
  parity, and both sinks write the same frame.

S12 catalog introspection mirrors the dashboard's
``information_schema.tables`` / ``DESCRIBE`` queries
(streamlit_frontend.py:440-515) over the Spark catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..operators.transform import make_csv_safe


def write_silver_csv(df: DataFrame, base_dir: str, corr: str) -> str:
    """S8: CSV-safe the frame and write ``{base}/corr={corr}/`` with a
    header. Returns the written path."""
    path = f"{base_dir}/corr={corr}"
    make_csv_safe(df).write.mode("overwrite").option("header", "true").csv(path)
    return path


def read_silver_csv(
    spark: SparkSession,
    base_dir: str,
    corr: str,
    schema: T.StructType | None = None,
) -> DataFrame:
    """S9: read one run's Silver CSV; explicit schema when given
    (deterministic types), else inference (pandas read_csv analog)."""
    path = f"{base_dir}/corr={corr}"
    reader = spark.read.option("header", "true")
    if schema is not None:
        return reader.schema(schema).csv(path)
    return reader.option("inferSchema", "true").csv(path)


# --- S12: catalog introspection ------------------------------------------


def list_tables(spark: SparkSession, database: str | None = None) -> list[dict]:
    """information_schema.tables analog (streamlit_frontend.py:440-444)."""
    tables = spark.catalog.listTables(database) if database else spark.catalog.listTables()
    return [
        {
            "name": t.name,
            "database": t.namespace[0] if t.namespace else None,
            "is_temporary": t.isTemporary,
            "table_type": t.tableType,
        }
        for t in tables
    ]


def describe_table(spark: SparkSession, name: str) -> list[dict]:
    """DESCRIBE analog (streamlit_frontend.py:503-507): column name/type/
    nullable from the catalog."""
    return [
        {"name": c.name, "type": c.dataType, "nullable": c.nullable}
        for c in spark.catalog.listColumns(name)
    ]


def current_database(spark: SparkSession) -> str:
    """current_database() (streamlit_frontend.py:515)."""
    return spark.catalog.currentDatabase()


def validate_upload_schema(df: DataFrame, required: list[str]) -> list[str]:
    """S13 (streamlit_frontend.py:2189-2207): required-column check for
    an uploaded frame; returns the missing columns (empty = valid)."""
    present = set(df.columns)
    return [c for c in required if c not in present]
