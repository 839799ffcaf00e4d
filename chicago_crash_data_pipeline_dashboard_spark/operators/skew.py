"""Skew mitigation for hot keys at cluster scale.

AQE (enabled in session.py) already splits skewed sort-merge-join
partitions at runtime (``spark.sql.adaptive.skewJoin``); these
utilities cover the two cases AQE doesn't:

- ``salted_join``: a hot key overwhelming one task in a shuffled
  equi-join against a replicable (but not broadcast-small) side — the
  classic salt-and-replicate: the large side gets a random salt in
  [0, n), the small side is exploded n ways, the join key becomes
  (key, salt) so one hot key fans out over n tasks;
- ``two_phase_agg``: a hot group key in an aggregation whose combiner
  alone can't save the final reducer (e.g. exact count-distinct-ish
  payloads): pre-aggregate on (key, salt), then finish on key. For
  algebraic aggregates (sum/count/min/max) the result is exactly the
  direct aggregation.

Both are deterministic in RESULT for any salt assignment; the salt
itself intentionally isn't (it only balances partitions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "_salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str | list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the large side salted and the small side
    replicated ``n_salts``×. Use when the small side is too big to
    broadcast and the key distribution is heavy-tailed.

    Cost model: small side shuffles n× its size; the hot key's rows
    spread over n tasks instead of one. Pick n ≈ (hot-key rows) /
    (rows a task should own).
    """
    keys = [on] if isinstance(on, str) else list(on)
    salted_large = large.withColumn(
        _SALT, F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    replicated_small = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_large.join(replicated_small, keys + [_SALT], how).drop(_SALT)


def two_phase_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Salted two-phase aggregation.

    ``aggs`` maps output name → (partial_agg_expr, final_agg_expr over
    the partial column). E.g. a global-sum-per-key:
    ``{"total": (F.sum("x"), F.sum("total"))}``; a count:
    ``{"n": (F.count(F.lit(1)), F.sum("n"))}``.
    """
    salted = df.withColumn(
        _SALT, F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    partial = salted.groupBy(*key_cols, _SALT).agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    return partial.groupBy(*key_cols).agg(
        *[final.alias(name) for name, (_, final) in aggs.items()]
    )
