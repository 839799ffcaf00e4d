"""Z-order (Morton-curve) data layout for multi-dimensional file
skipping.

A single-column sort gives parquet files tight min/max stats on ONE
predicate column; queries filtering the other dimensions still read
every file. Interleaving the bits of k columns into one Morton key and
range-partitioning + sorting on it gives every file a bounded range in
EVERY interleaved dimension — min/max pruning then skips files for
filters on any of them (the same layout trick behind Delta/Iceberg
Z-ORDER clustering, built here from plain Spark expressions).

``z_value`` is pure column arithmetic (shift/mask/sum — no UDF) and is
registered under the differential oracle gate; ``write_zordered`` is
the layout writer: range-partition on the key (equal-sized output
files), sort within partitions (tight per-row-group stats), write.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(cols: list[Column], bits: int = 16) -> Column:
    """Morton key: bit ``b`` of column ``i`` lands at interleaved
    position ``b * k + i``. Inputs are taken modulo 2^bits (callers
    bucket/scale real values into that range first); k * bits must be
    <= 63 to stay in a signed long."""
    k = len(cols)
    if k * bits > 63:
        raise ValueError(f"{k} cols x {bits} bits exceeds a signed long")
    terms = []
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, b * k + i))
    return reduce(lambda a, x: a + x, terms).cast("long")


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 16,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` clustered on the Morton key of ``cols``:
    repartitionByRange gives ~equal file sizes (range boundaries from a
    sampled sketch — one extra pass), sortWithinPartitions makes
    per-row-group stats tight; the key column itself is dropped from
    the output."""
    z = z_value([F.col(c) for c in cols], bits=bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.format(fmt)
        .mode("overwrite")
        .save(path)
    )
