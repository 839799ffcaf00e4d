"""Named query plans — the engine's user-facing query surface.

``registry`` collects every named query as a (spark, sf_dir) -> DataFrame
callable plus (when SQL-expressible) a DuckDB oracle SQL string used by
the differential correctness harness.
"""

from .registry import QUERIES, OracleSpec, register  # noqa: F401
