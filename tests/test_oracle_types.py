"""Static result-type lint over every registered DuckDB oracle.

The driver's hasher canonicalizes values by their Python repr, so a
DuckDB result column whose logical type differs from the Spark result's
(e.g. ``HUGEINT`` from an un-cast ``SUM(CASE ...)`` vs Spark's
``bigint``) hash-mismatches even when the values are numerically
identical — exactly the r4 ``doc_repetition_stats`` red cell. This lint
binds every oracle under ``LIMIT 0`` (sf-0 cost, no Spark needed) and
asserts only driver-stable logical types survive, making that bug class
impossible to reintroduce.

Allowed: BIGINT / INTEGER / DOUBLE / VARCHAR / DATE / TIMESTAMP /
BOOLEAN. Forbidden by construction: HUGEINT (uncast integer SUMs),
DECIMAL (must be routed back to DOUBLE after exact aggregation),
TINYINT/SMALLINT/FLOAT (never produced by the Spark twins).
"""

from __future__ import annotations

import duckdb
import pytest

from tests.oracle_harness import TABLES

_ALLOWED = {
    "BIGINT",
    "INTEGER",
    "DOUBLE",
    "VARCHAR",
    "DATE",
    "TIMESTAMP",
    "BOOLEAN",
}


def _all_oracles() -> dict[str, str]:
    import __spark_entry__ as entry

    return entry.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_smoke):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_smoke}/{t}.parquet'")
    yield con
    con.close()


def test_every_oracle_binds_and_yields_driver_stable_types(duck):
    oracles = _all_oracles()
    assert len(oracles) >= 85  # every SQL-expressible registered query
    offenders: dict[str, list[tuple[str, str]]] = {}
    for name, sql in oracles.items():
        rel = duck.sql(f"SELECT * FROM ({sql}) _q LIMIT 0")
        bad = [
            (col, str(typ))
            for col, typ in zip(rel.columns, rel.types)
            if str(typ) not in _ALLOWED
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracle columns with driver-unstable DuckDB types (wrap integer "
        f"SUMs in CAST(... AS BIGINT), route DECIMAL back to DOUBLE): {offenders}"
    )
