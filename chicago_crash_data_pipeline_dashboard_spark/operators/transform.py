"""Silver transform — Bronze crashes/vehicles/people → one wide frame.

Re-expresses the reference transformer (transformer/transformer.py:
201-305) Spark-first:

- column-name canonicalization (F1/F2) is a schema-level rename —
  zero-cost, no data movement;
- full-row dedup (W8) and keep-first-by-key dedup (W9): Polars'
  ``maintain_order``/``keep='first'`` is insertion-order-defined; the
  distributed-correct equivalent is an explicit total order + window
  row_number (SURVEY §4.3). We carry a ``_row_order`` surrogate from
  the source (file order) when available, else synthesize one.
- many-to-one pre-aggregation BEFORE the join (J2): the semi-join
  reduction the reference designs in; keeps the join 1:1 so the output
  row count equals the crash count — at 100 TB this avoids a row
  explosion and lets AQE pick broadcast for the aggregated side when
  small;
- list columns are real ArrayType; CSV-safety (F18 make_csv_safe,
  transformer.py:263-305) serializes them with ``to_json`` into
  ``*_json`` string columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W
from pyspark.sql import types as T

ROW_ORDER_COL = "_row_order"


def standardize_columns(df: DataFrame) -> DataFrame:
    """F1 (transformer.py:201-204): strip+lowercase every column name."""
    return df.toDF(*[c.strip().lower() for c in df.columns])


def canonicalize_id(df: DataFrame, id_col: str = "crash_record_id") -> DataFrame:
    """F2 (transformer.py:233-243): case-insensitive find of the join
    column, renamed to the lowercase canonical name."""
    if id_col in df.columns:
        return df
    for c in df.columns:
        if c.lower() == id_col:
            return df.withColumnRenamed(c, id_col)
    return df


def with_row_order(df: DataFrame) -> DataFrame:
    """Attach a deterministic-enough row-order surrogate for keep-first
    semantics. monotonically_increasing_id is stable for a fixed file
    layout + partitioning (partition-major, position-minor) — the Spark
    analog of 'file order'."""
    if ROW_ORDER_COL in df.columns:
        return df
    return df.withColumn(ROW_ORDER_COL, F.monotonically_increasing_id())


def dedup_full_rows(df: DataFrame) -> DataFrame:
    """W8 (transformer.py:205): distinct over all data columns, keeping
    the first occurrence by row order."""
    data_cols = [c for c in df.columns if c != ROW_ORDER_COL]
    if ROW_ORDER_COL not in df.columns:
        return df.dropDuplicates(data_cols)
    w = W.partitionBy(*data_cols).orderBy(ROW_ORDER_COL)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def dedup_keep_first(df: DataFrame, key: str) -> DataFrame:
    """W9 (transformer.py:258): one row per key, first by row order
    (explicit order column when present — deterministic on a cluster)."""
    order = F.col(ROW_ORDER_COL) if ROW_ORDER_COL in df.columns else F.monotonically_increasing_id()
    w = W.partitionBy(key).orderBy(order)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def aggregate_many_to_one(df: DataFrame, id_col: str, prefix: str, max_text_cols: int = 5) -> DataFrame:
    """J2/A1/A2/W2 (transformer.py:207-219): per-key count + up to 5
    sorted-distinct string-list columns.

    collect_set drops nulls and sort_array orders ascending — exactly
    Polars ``drop_nulls().unique().sort().implode()``.
    """
    text_cols = [c for c, t in df.dtypes if c != id_col and t == "string"][:max_text_cols]
    aggs = [F.count(F.lit(1)).alias(f"{prefix}_count")]
    for c in text_cols:
        aggs.append(
            F.sort_array(F.collect_set(F.col(c).cast("string"))).alias(f"{prefix}_{c}_list")
        )
    return df.groupBy(id_col).agg(*aggs)


def merge_crash_vehicles_people(
    crashes: DataFrame,
    vehicles: DataFrame | None,
    people: DataFrame | None,
    id_col: str = "crash_record_id",
) -> DataFrame:
    """J3/J4 + W8/W9 (transformer.py:221-258): standardize all three,
    pre-aggregate the many side, left-join onto crashes, keep-first
    dedup by crash id."""
    crashes = dedup_full_rows(canonicalize_id(standardize_columns(with_row_order(crashes)), id_col))
    out = crashes

    for df, prefix in ((vehicles, "veh"), (people, "ppl")):
        if df is None:
            continue
        side = canonicalize_id(standardize_columns(df), id_col)
        if id_col not in side.columns:
            continue
        side = side.drop(ROW_ORDER_COL) if ROW_ORDER_COL in side.columns else side
        agg = aggregate_many_to_one(side.dropDuplicates(), id_col, prefix)
        out = out.join(agg, id_col, "left")

    if id_col in out.columns:
        out = dedup_keep_first(out, id_col)
    return out.drop(ROW_ORDER_COL)


def make_csv_safe(df: DataFrame) -> DataFrame:
    """F18 (transformer.py:263-305): JSON-stringify every Array/Struct/
    Map column into ``{name}_json`` and drop the original — the frame
    becomes CSV-serializable."""
    out = df
    for field in df.schema.fields:
        if isinstance(field.dataType, (T.ArrayType, T.StructType, T.MapType)):
            out = out.withColumn(f"{field.name}_json", F.to_json(F.col(field.name))).drop(
                field.name
            )
    return out


def silver_transform(
    crashes: DataFrame,
    vehicles: DataFrame | None = None,
    people: DataFrame | None = None,
) -> DataFrame:
    """Full Silver stage: merge + CSV-safety. Output is the reference's
    ``merged.csv`` frame (transformer.py:310-343) as a lazy plan."""
    return make_csv_safe(merge_crash_vehicles_people(crashes, vehicles, people))
