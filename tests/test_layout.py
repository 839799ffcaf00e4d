"""Z-order layout (operators/layout.py): key correctness vs a Python
model, and the actual file-skipping effect — z-ordered files bound
BOTH dimensions where a single-column sort bounds only one."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from chicago_crash_data_pipeline_dashboard_spark.operators.layout import (
    write_zordered,
    z_value,
)


def _z_model(vals, bits=16):
    z = 0
    for b in range(bits):
        for i, v in enumerate(vals):
            z |= ((int(v) >> b) & 1) << (b * len(vals) + i)
    return z


def test_z_value_matches_model(spark):
    rows = [(i, (i * 37) % 1000, (i * 91) % 500) for i in range(200)]
    df = spark.createDataFrame(rows, "i long, x long, y long")
    got = {
        r["i"]: r["z"]
        for r in df.select("i", z_value([F.col("x"), F.col("y")]).alias("z")).collect()
    }
    for i, x, y in rows:
        assert got[i] == _z_model([x, y]), (i, x, y)


def _file_ranges(path: str, col: str):
    """(min, max) per parquet file from footer stats — what min/max
    file skipping would see."""
    ranges = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            stats = md.row_group(rg).column(idx).statistics
            mins.append(stats.min)
            maxs.append(stats.max)
        ranges.append((min(mins), max(maxs)))
    return ranges


def test_zorder_bounds_both_dimensions(spark, tmp_path):
    # 64x64 grid, shuffled — each of x and y spans 0..63
    grid = spark.range(0, 64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    n_files = 16

    zpath = str(tmp_path / "zorder")
    write_zordered(grid, zpath, ["x", "y"], n_files=n_files)

    xpath = str(tmp_path / "xsort")
    (
        grid.repartitionByRange(n_files, "x")
        .sortWithinPartitions("x")
        .write.parquet(xpath)
    )

    def avg_span(path, col):
        rs = _file_ranges(path, col)
        return sum(mx - mn for mn, mx in rs) / len(rs)

    # x-sorted: x tight but y spans ~the full domain in every file
    assert avg_span(xpath, "y") > 55
    # z-ordered: BOTH dimensions bounded well below the full domain
    assert avg_span(zpath, "x") < 32
    assert avg_span(zpath, "y") < 32

    # data survives the layout rewrite
    assert spark.read.parquet(zpath).count() == 64 * 64
