"""Hand-fixture semantic pins for the funnel / cohort / incremental
gates — the oracle suite proves Spark ≡ DuckDB on the shared corpus;
these pin the SEMANTICS of the shared production transformations
(plans/analytics.py funnel_chain / cohort_triangle — the registered
queries call the same functions) on adversarial micro-fixtures:
ordering violations, cohort staggering, null timestamps."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from chicago_crash_data_pipeline_dashboard_spark.plans.analytics import (
    cohort_triangle,
    funnel_chain,
)

T0 = dt.datetime(2025, 6, 1, 12, 0, 0)


def _t(s: int) -> dt.datetime:
    return T0 + dt.timedelta(seconds=s)


def test_funnel_orders_strictly(spark):
    rows = [
        # user 1: proper view -> click -> purchase
        (1, "view", _t(0)), (1, "click", _t(10)), (1, "purchase", _t(20)),
        # user 2: purchased BEFORE ever viewing — must NOT convert
        (2, "purchase", _t(0)), (2, "view", _t(10)), (2, "click", _t(20)),
        # user 3: clicked before viewing, again after — converts at click
        # via the later click, but has no purchase
        (3, "click", _t(0)), (3, "view", _t(10)), (3, "click", _t(20)),
        # user 4: click at the SAME instant as first view — strict '>'
        # excludes it
        (4, "view", _t(0)), (4, "click", _t(0)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    v, c, p = funnel_chain(ev)
    assert {r.user_id for r in v.collect()} == {1, 2, 3, 4}
    assert {r.user_id for r in c.collect()} == {1, 2, 3}  # user 4's tie loses
    assert {r.user_id for r in p.collect()} == {1}  # user 2's early purchase fails


def test_funnel_null_edges_match_join_form(spark):
    """Pins the join-form edge semantics the r15 windowed rewrite must
    preserve: (a) a user whose only view rows have NULL ts still counts
    as entering the funnel (the old step-0 groupBy kept them with
    t=NULL) but can never advance (ts > NULL is NULL); (b) a NULL
    user_id enters step 0 (groupBy keeps the NULL group) but never
    advances (the old equi-join dropped NULL keys)."""
    rows = [
        # user 5: NULL-ts view only, then a click — in v (t NULL), not in c
        (5, "view", None), (5, "click", _t(10)),
        # NULL user: complete view->click chain — in v, must NOT reach c
        (None, "view", _t(0)), (None, "click", _t(10)),
        # user 6: control — normal two-step conversion
        (6, "view", _t(0)), (6, "click", _t(5)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    v, c, p = funnel_chain(ev)
    v_rows = {r.user_id: r.t for r in v.collect()}
    assert set(v_rows) == {5, None, 6}
    assert v_rows[5] is None  # NULL-ts view keeps membership, t stays NULL
    assert {r.user_id for r in c.collect()} == {6}
    assert c.filter(F.col("user_id").isNull()).count() == 0
    assert p.count() == 0


def test_cohort_offsets_per_user(spark):
    # two users joining two weeks apart, each active in their join week
    # and one later week — offsets are relative to EACH user's cohort
    rows = [
        (1, dt.datetime(2025, 6, 2)), (1, dt.datetime(2025, 6, 16)),  # Mon wk0, wk2
        (2, dt.datetime(2025, 6, 16)), (2, dt.datetime(2025, 6, 23)),  # Mon wk0, wk1
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r.cohort_week.isoformat(), r.week_offset, r.n_users)
        for r in cohort_triangle(ev).collect()
    }
    assert got == {
        ("2025-06-02", 0, 1), ("2025-06-02", 2, 1),
        ("2025-06-16", 0, 1), ("2025-06-16", 1, 1),
    }


def test_incremental_merge_keeps_null_ts_rows(spark):
    rows = [
        (1, _t(0), 1.0),
        (2, None, 2.5),  # NULL ts must land in the history partial
        (3, _t(100), 4.0),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    cutoff = _t(50)

    def partial(df):
        return df.groupBy((F.col("user_id") % 50).alias("bucket")).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(25,6)")).alias("s"),
        )

    base = partial(ev.filter((F.col("ts") < cutoff) | F.col("ts").isNull()))
    delta = partial(ev.filter(F.col("ts") >= cutoff))
    merged = (
        base.unionByName(delta)
        .groupBy("bucket")
        .agg(F.sum("n").alias("n"), F.sum("s").cast("double").alias("s"))
    )
    full = (
        ev.groupBy((F.col("user_id") % 50).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("s"),
        )
    )
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in full.collect()}


def test_ols_moments_match_numpy(spark):
    """The exact-decimal-moment slope/intercept (doc_quality_regression's
    formula) must agree with numpy's least-squares fit on arbitrary
    integer-x / fixed-point-y points."""
    import numpy as np

    rng_pts = [
        (i, (i * 37) % 113, round(0.003 * ((i * 53) % 97) + 0.1 * (i % 7), 6))
        for i in range(60)
    ]
    df = spark.createDataFrame(rng_pts, "i long, x long, y double")
    pts = df.select(
        F.col("x").cast("decimal(25,6)").alias("x"),
        F.col("y").cast("decimal(25,6)").alias("y"),
    )
    mom = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    ).first()
    n, sx, sy = mom["n"], float(mom["sx"]), float(mom["sy"])
    sxy, sxx = float(mom["sxy"]), float(mom["sxx"])
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    xs = np.array([p[1] for p in rng_pts], dtype=float)
    ys = np.array([p[2] for p in rng_pts], dtype=float)
    ref_slope, ref_intercept = np.polyfit(xs, ys, 1)
    assert abs(slope - ref_slope) < 1e-9
    assert abs(intercept - ref_intercept) < 1e-9


def test_adhoc_sql_rewrite_touches_only_table_references():
    """The sql_adhoc_query view rewrite must rename exactly the two
    FROM/JOIN table references — and must NOT touch occurrences of the
    words 'orders'/'lineitem' inside string literals or comments (the
    regex is anchored to the FROM/JOIN token for that reason)."""
    import re

    names = {"orders": "ccpd_adhoc_orders", "lineitem": "ccpd_adhoc_lineitem"}

    def rewrite(sql: str) -> str:
        return re.sub(
            r"\b(FROM|JOIN)\s+(orders|lineitem)\b",
            lambda m: f"{m.group(1)} {names[m.group(2)]}",
            sql,
            flags=re.IGNORECASE,
        )

    from chicago_crash_data_pipeline_dashboard_spark.plans.analytics import _ADHOC_SQL

    got = rewrite(_ADHOC_SQL)
    assert got.count("ccpd_adhoc_") == 2  # exactly the two table refs
    assert "FROM lineitem" not in got and "JOIN orders" not in got

    tricky = (
        "SELECT 'orders placed' AS label, o_comment -- lineitem notes\n"
        "FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey\n"
        "WHERE o_comment <> 'all my orders'"
    )
    got = rewrite(tricky)
    assert "FROM ccpd_adhoc_orders o" in got
    assert "JOIN ccpd_adhoc_lineitem l" in got
    assert "'orders placed'" in got  # literal untouched
    assert "-- lineitem notes" in got  # comment untouched
    assert "'all my orders'" in got  # literal untouched


def test_session_window_boundary_merges_at_exact_gap(spark):
    """Pins the native session_window boundary semantics the
    event_sessions_native oracle depends on: an event exactly gap
    seconds after its predecessor MERGES (new session strictly > gap),
    and the emitted end is last-event + gap."""
    rows = [
        ("a", T0), ("a", _t(3599)), ("a", _t(7199)),   # chained merge
        ("b", T0), ("b", _t(3600)),                     # exact-gap merge
        ("c", T0), ("c", _t(3601)),                     # split
    ]
    df = spark.createDataFrame(rows, ["k", "ts"])
    out = {
        (r.k, r.start, r.n)
        for r in df.groupBy("k", F.session_window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("k", F.col("w.start").alias("start"), F.col("w.end").alias("end"), "n")
        .collect()
    }
    assert ("a", T0, 3) in out
    assert ("b", T0, 2) in out
    assert ("c", T0, 1) in out and ("c", _t(3601), 1) in out


def _quantiles_vs_builtin(spark, vals):
    """Run the quantiles query over a lineitem fixture built from
    ``vals`` and the built-in `percentile` reference over the same
    frame; reference rounded THROUGH SPARK's F.round (HALF_UP), not
    Python round() (banker's), so 6th-decimal ties can never diverge
    (ADVICE r15)."""
    from chicago_crash_data_pipeline_dashboard_spark.plans.registry import QUERIES

    df = spark.createDataFrame([(v,) for v in vals], "l_extendedprice double")
    df = df.withColumn("l_quantity", F.coalesce(F.col("l_extendedprice"), F.lit(0.0)))
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "lineitem.parquet"))
        got = QUERIES["quantiles"].fn(spark, d).first()
    ref = (
        df.agg(
            F.expr("percentile(l_quantity, array(0.5, 0.95))").alias("q"),
            F.expr("percentile(l_extendedprice, array(0.5, 0.95))").alias("p"),
        )
        .select(
            F.round(F.col("q")[0], 6).alias("q0"),
            F.round(F.col("q")[1], 6).alias("q1"),
            F.round(F.col("p")[0], 6).alias("p0"),
            F.round(F.col("p")[1], 6).alias("p1"),
        )
        .first()
    )
    assert got["median_qty"] == ref["q0"]
    assert got["p95_qty"] == ref["q1"]
    assert got["median_price"] == ref["p0"]
    assert got["p95_price"] == ref["p1"]


def test_sort_based_percentile_matches_builtin(spark):
    """Pins the quantiles query's distributed exact percentile (the
    high-cardinality l_extendedprice branch) against the built-in
    `percentile` on an adversarial micro-fixture: NULLs (dropped by
    both), duplicate values (row_number ties), and fraction positions
    that land exactly ON a row (frac == 0) and between rows. With 9
    non-null rows and 64+ buckets, most splits are duplicate values —
    the degenerate-bucket edge of the r16 distributed form."""
    vals = [3.25, None, 1.5, 1.5, 2.75, None, 9.0, 4.125, 0.5, 7.375, 2.75]
    _quantiles_vs_builtin(spark, vals)


def test_distributed_percentile_bucket_edges(spark):
    """r16 distributed exact percentile at a size where the bucket
    machinery is actually exercised (multiple non-empty buckets, the
    bracketing ranks inside interior buckets), with heavy ties so that
    split points collide with data values — a tie block must land
    entirely in one bucket on every pass."""
    vals = []
    for i in range(2000):
        vals.append(float(i % 37) * 0.125)   # heavy ties on 37 values
        vals.append(1000.0 + i * 0.0625)     # distinct tail
    vals.extend([None, None, None])
    _quantiles_vs_builtin(spark, vals)
