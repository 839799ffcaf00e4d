"""As-of (point-in-time) join — an operator Spark's DataFrame API
lacks natively.

``asof_join(left, right, on, by)`` attaches to every left row the most
recent right row with ``right.on <= left.on`` within the same ``by``
key (backward as-of; the financial "last known value" join).

Scale design — the union+window form, NOT a range join:

- a naive inequality join (``l.ts >= r.ts``) is a quadratic range join
  per key and explodes on hot keys;
- instead, union both sides with a side marker, shuffle ONCE on the
  ``by`` key, sort each partition by (ts, marker), and carry the last
  seen right-side payload forward with ``last(..., ignoreNulls=True)``
  over an unbounded-preceding window. Cost: one shuffle + one
  partition-local sort over |L|+|R| rows, independent of key skew's
  quadratic blow-up (a hot key costs |L_k|+|R_k| log, not |L_k|·|R_k|).

Tie semantics: right rows order BEFORE left rows at equal ``on``
values (marker 0 < 1), so an exactly-simultaneous right row IS visible
to the left row — matching DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts``,
which the differential oracle uses as an independent implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join: left rows + latest right ``value_cols``
    (and the matching right ``on`` as ``{on}{suffix}``) with
    ``right.on <= left.on``, per ``by`` group. Left rows with no prior
    right row keep NULLs.

    ``right`` should hold at most one row per (by, on) — dedupe first
    (e.g. ``dedup_keep_first``) — otherwise which tied row wins is
    tie-broken by the window order below deterministically only if
    value columns are included in the sort; we dedupe defensively.
    """
    value_cols = value_cols or [c for c in right.columns if c not in (on, by)]
    # the carried struct reserves the field name '_on' for the matched
    # right timestamp; a value column named '_on' (or carrying the on/by
    # columns themselves) would create duplicate struct fields and wrong
    # carried values — reject loudly instead
    clash = {"_on", on, by}.intersection(value_cols)
    if clash:
        raise ValueError(
            f"value_cols may not contain {sorted(clash)} — '_on' is reserved "
            f"for the carried right-side {on!r}, and the on/by key columns "
            "already ride with every row"
        )

    # defensive dedupe: one right row per (by, on) — keep the row with
    # the greatest value tuple (deterministic regardless of input order)
    w_dedup = W.partitionBy(by, on).orderBy(*[F.desc(c) for c in value_cols])
    r = (
        right.withColumn("_rn", F.row_number().over(w_dedup))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    # The right payload rides as ONE struct so a single
    # last(ignoreNulls=True) carries a whole right ROW forward. Carrying
    # each value column independently would mix columns from different
    # right rows whenever a right value column is NULL (chimera rows);
    # the struct itself is never NULL for a right row even when all its
    # fields are, so genuine NULLs propagate — matching DuckDB ASOF.
    r_dtypes = dict(r.dtypes)
    payload_type = (
        "struct<"
        + ",".join(f"`{c}`:{r_dtypes[c]}" for c in value_cols)
        + f",`_on`:{r_dtypes[on]}>"
    )
    l_tagged = left.select(
        F.col(by), F.col(on), F.lit(1).alias("_side"),
        F.lit(None).cast(payload_type).alias("_r"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
    )
    r_tagged = r.select(
        F.col(by), F.col(on), F.lit(0).alias("_side"),
        F.struct(
            *[F.col(c) for c in value_cols], F.col(on).alias("_on")
        ).alias("_r"),
        F.lit(None).cast(
            "struct<" + ",".join(f"`{c}`:{t}" for c, t in left.dtypes) + ">"
        ).alias("_l"),
    )

    unioned = l_tagged.unionByName(r_tagged)
    w = (
        W.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.select(
        "*", F.last("_r", ignorenulls=True).over(w).alias("_carry")
    )
    out = carried.filter(F.col("_side") == 1).select(
        *[F.col("_l")[c].alias(c) for c in left.columns],
        F.col("_carry")["_on"].alias(f"{on}{suffix}"),
        *[F.col("_carry")[c].alias(f"{c}{suffix}") for c in value_cols],
    )
    return out
