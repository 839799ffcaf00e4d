"""Local replica of the driver's DuckDB differential comparison.

Runs a registered Spark query and its oracle SQL over the same parquet
tables, canonicalizes both results (columns sorted by name, rows sorted
by their full value tuple), and asserts row-count + value equality with
a small float tolerance for display; the goal remains EXACT equality —
queries are written so both engines produce identical values (see
plans/registry.py conventions).
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def canonicalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def compare(spark_df, oracle: str, sf_dir: str, float_tol: float = 1e-9):
    """Return (ok, message). Exact compare, with tiny relative float tolerance."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols, d_rows = duckdb_run(oracle, sf_dir)

    sc, sr = canonicalize(s_cols, s_rows)
    dc, dr = canonicalize(d_cols, d_rows)

    if sc != dc:
        return False, f"column mismatch: spark={sc} duckdb={dc}"
    if len(sr) != len(dr):
        return False, f"row count mismatch: spark={len(sr)} duckdb={len(dr)}"
    for i, (a, b) in enumerate(zip(sr, dr)):
        for j, (x, y) in enumerate(zip(a, b)):
            if x == y:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isclose(x, y, rel_tol=float_tol, abs_tol=float_tol):
                    continue
            return False, f"value mismatch row {i} col {sc[j]}: spark={x!r} duckdb={y!r}"
    return True, f"ok ({len(sr)} rows)"
