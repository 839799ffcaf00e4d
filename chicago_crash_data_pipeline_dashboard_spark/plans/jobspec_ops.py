"""Gate queries for the config/control-plane surface: job-spec extract
semantics, catalog introspection + upload validation, and the skew
toolkit — pulling SURVEY §2 rows that were previously pytest-only
(P1, P2, W1, ST4, S12, S13, S14, skew utilities) under the driver's
differential oracle.

Reference parity targets:

- ``jobspec_extract``: the declarative extract job (extractor/
  main.go:114-157 Job JSON; buildWhere precedence main.go:202-222;
  ensureSelect main.go:409-429; ORDER for stable pagination = W1;
  half-open backfill windows = ST4).
- ``silver_catalog_validate``: the dashboard's information_schema /
  DESCRIBE introspection (streamlit_frontend.py:440-515) and the
  upload required-column check (streamlit_frontend.py:2189-2207),
  plus the Silver CSV download/round-trip machinery (S14).
- ``skew_salted_join_agg``: result-equivalence of the salt-and-
  replicate join + two-phase salted aggregation (the 100 TB hot-key
  toolkit) against the plain shuffled join the oracle runs.
- ``compact_small_files``: the small-file compaction maintenance job
  (sources/compact.py) — fragment a hive-partitioned copy of events,
  compact per partition, and prove bytes/rows survived and the file
  count actually shrank, against the source-table oracle.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.skew import salted_join, two_phase_agg
from ..sources.jobspec import JobSpec, apply_job
from ..sources.silver import (
    describe_table,
    list_tables,
    read_silver_csv,
    validate_upload_schema,
    write_silver_csv,
)
from .registry import load, register

# ---------------------------------------------------------------------------
# Shared plumbing for the file-round-trip gates (compact / ORC / bucketed /
# schema-evolution / dirty-JSON / partition-overwrite): one scratch-dir
# lifecycle and one eager-materialization helper instead of per-gate copies.
# ---------------------------------------------------------------------------
import contextlib as _contextlib
import shutil as _shutil
import tempfile as _tempfile


@_contextlib.contextmanager
def _scratch_dir(prefix: str):
    """Temp dir for a file round-trip gate, removed on exit."""
    tmp = _tempfile.mkdtemp(prefix=prefix)
    try:
        yield tmp
    finally:
        _shutil.rmtree(tmp, ignore_errors=True)


def _materialize(spark: SparkSession, out: DataFrame) -> DataFrame:
    """Eagerly collect a gate result whose backing files/tables are
    about to disappear, preserving the schema (these gates return
    data, not a lazy plan)."""
    return spark.createDataFrame(out.collect(), out.schema)

# Injected run date for reproducible since_days/default predicates
# (the reference reads the clock; build_where takes ``today`` so
# incremental runs are replayable — jobspec.py docstring).
_TODAY = "2024-01-20"


def _spec_summary(mode: str, out: DataFrame) -> DataFrame:
    """One row per job run: row count, distinct ids (present because
    ensureSelect force-includes the id column — P1 is value-verified:
    if projection dropped ``event_id`` this would not resolve), and
    the first 3 ids in the spec's (ts, event_id) order (W1: the global
    sort is verified through the ordered limit, which Spark executes
    as TakeOrderedAndProject — no full sort materialization)."""
    summary = out.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("event_id").alias("n_ids"),
    )
    first = out.limit(3).agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct(F.col("ts"), F.col("event_id")))),
                lambda s: s["event_id"].cast("string"),
            ),
            ",",
        ).alias("first_ids")
    )
    return summary.crossJoin(first).select(
        F.lit(mode).alias("mode"), "n_rows", "n_ids", "first_ids"
    )


@register(
    "jobspec_extract",
    oracle="""
    WITH
    f1 AS (SELECT * FROM events WHERE event_type = 'error' AND value > 5.0),
    f2 AS (SELECT * FROM events
           WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
             AND ts <  TIMESTAMP '2024-01-20 00:00:00'),
    f3 AS (SELECT * FROM events WHERE ts > TIMESTAMP '2024-01-15 00:00:00'),
    f4 AS (SELECT * FROM events WHERE CAST(ts AS DATE) >= DATE '2024-01-20' - 3),
    f5 AS (SELECT * FROM events WHERE CAST(ts AS DATE) >= DATE '2024-01-20' - 7)
    SELECT 'explicit_where' AS mode,
           (SELECT count(*) FROM f1) AS n_rows,
           (SELECT count(DISTINCT event_id) FROM f1) AS n_ids,
           COALESCE((SELECT string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY ts, event_id)
                     FROM (SELECT ts, event_id FROM f1 ORDER BY ts, event_id LIMIT 3) t), '') AS first_ids
    UNION ALL
    SELECT 'date_range',
           (SELECT count(*) FROM f2),
           (SELECT count(DISTINCT event_id) FROM f2),
           COALESCE((SELECT string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY ts, event_id)
                     FROM (SELECT ts, event_id FROM f2 ORDER BY ts, event_id LIMIT 3) t), '')
    UNION ALL
    SELECT 'watermark',
           (SELECT count(*) FROM f3),
           (SELECT count(DISTINCT event_id) FROM f3),
           COALESCE((SELECT string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY ts, event_id)
                     FROM (SELECT ts, event_id FROM f3 ORDER BY ts, event_id LIMIT 3) t), '')
    UNION ALL
    SELECT 'since_days',
           (SELECT count(*) FROM f4),
           (SELECT count(DISTINCT event_id) FROM f4),
           COALESCE((SELECT string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY ts, event_id)
                     FROM (SELECT ts, event_id FROM f4 ORDER BY ts, event_id LIMIT 3) t), '')
    UNION ALL
    SELECT 'default_last_7_days',
           (SELECT count(*) FROM f5),
           (SELECT count(DISTINCT event_id) FROM f5),
           COALESCE((SELECT string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY ts, event_id)
                     FROM (SELECT ts, event_id FROM f5 ORDER BY ts, event_id LIMIT 3) t), '')
    """,
    doc="P1 ensureSelect + P2 buildWhere precedence (extractor/"
    "main.go:202-222,409-429) + W1 deterministic order + ST4 half-open "
    "backfill window, one row per predicate mode over events. Every "
    "predicate compiles to a scan-pushed filter; the ordered first-3 "
    "probe runs as TakeOrderedAndProject.",
)
def jobspec_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    common = dict(id_col="event_id", date_col="ts", order=["ts", "event_id"])
    runs = [
        (
            "explicit_where",
            apply_job(
                ev,
                JobSpec(
                    select=["event_type", "value"],
                    where="event_type = 'error' AND value > 5.0",
                    **common,
                ),
            ),
        ),
        (
            "date_range",
            apply_job(
                ev,
                JobSpec(
                    select=["event_type"],
                    date_range=("2024-01-10 00:00:00", "2024-01-20 00:00:00"),
                    **common,
                ),
            ),
        ),
        (
            "watermark",
            apply_job(ev, JobSpec(**common), watermark="2024-01-15 00:00:00"),
        ),
        (
            "since_days",
            apply_job(ev, JobSpec(select=["value"], since_days=3, **common), today=_TODAY),
        ),
        (
            "default_last_7_days",
            apply_job(ev, JobSpec(**common), today=_TODAY),
        ),
    ]
    return reduce(
        DataFrame.unionByName, [_spec_summary(mode, out) for mode, out in runs]
    )


_CAT_TABLES = ("events", "documents", "embeddings")
_UPLOAD_REQUIRED = ["doc_id", "text", "lang", "source", "n_chars"]


@register(
    "silver_catalog_validate",
    oracle="""
    SELECT 'catalog_events' AS item,
           (SELECT count(*) FROM information_schema.columns WHERE table_name = 'events') AS n,
           (SELECT string_agg(column_name, ',' ORDER BY ordinal_position)
            FROM information_schema.columns WHERE table_name = 'events') AS detail,
           TRUE AS ok
    UNION ALL
    SELECT 'catalog_documents',
           (SELECT count(*) FROM information_schema.columns WHERE table_name = 'documents'),
           (SELECT string_agg(column_name, ',' ORDER BY ordinal_position)
            FROM information_schema.columns WHERE table_name = 'documents'),
           TRUE
    UNION ALL
    SELECT 'catalog_embeddings',
           (SELECT count(*) FROM information_schema.columns WHERE table_name = 'embeddings'),
           (SELECT string_agg(column_name, ',' ORDER BY ordinal_position)
            FROM information_schema.columns WHERE table_name = 'embeddings'),
           TRUE
    UNION ALL
    SELECT 'upload_valid', 0, '', TRUE
    UNION ALL
    SELECT 'upload_invalid', 3, 'lang,source,n_chars', FALSE
    UNION ALL
    SELECT 'csv_roundtrip',
           (SELECT count(*) FROM documents WHERE doc_id % 10 = 0),
           (SELECT CAST(SUM(n_chars) AS VARCHAR) FROM documents WHERE doc_id % 10 = 0),
           TRUE
    """,
    doc="S12 catalog introspection (streamlit_frontend.py:440-515: "
    "information_schema.tables / DESCRIBE over the Spark catalog), S13 "
    "upload required-column validation (streamlit_frontend.py:2189-2207), "
    "and the S14 Silver CSV download round-trip (non-text columns; the "
    "text/quoting path is gated by pipeline_e2e). Catalog metadata is "
    "driver-side by nature (rows ~ number of tables, not data size).",
)
def silver_catalog_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    rows: list[tuple[str, int, str, bool]] = []

    # S12: register temp views for the three LLM-surface tables and
    # introspect them through the catalog APIs the dashboard mirrors.
    for t in _CAT_TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(f"ccpd_cat_{t}")
    listed = {x["name"] for x in list_tables(spark)}  # one listing for all views
    for t in _CAT_TABLES:
        view = f"ccpd_cat_{t}"
        cols = describe_table(spark, view)
        rows.append(
            (f"catalog_{t}", len(cols), ",".join(c["name"] for c in cols), view in listed)
        )

    # S13: required-column validation over an "uploaded" frame.
    docs = load(spark, sf_dir, "documents")
    ok_missing = validate_upload_schema(docs, _UPLOAD_REQUIRED)
    bad_missing = validate_upload_schema(docs.select("doc_id", "text"), _UPLOAD_REQUIRED)
    rows.append(("upload_valid", len(ok_missing), ",".join(ok_missing), not ok_missing))
    rows.append(
        ("upload_invalid", len(bad_missing), ",".join(bad_missing), not bad_missing)
    )

    # S14: CSV download round-trip on the non-text columns (explicit
    # schema read — deterministic types).
    subset = docs.filter(F.col("doc_id") % 10 == 0).select(
        "doc_id", "lang", "source", "n_chars"
    )
    tmp = tempfile.mkdtemp(prefix="ccpd_silver_")
    try:
        write_silver_csv(subset, tmp, corr="dl")
        back = read_silver_csv(spark, tmp, corr="dl", schema=subset.schema)
        agg = back.agg(
            F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("chars")
        ).first()
        n_src = subset.count()
        rows.append(("csv_roundtrip", agg["n"], str(agg["chars"]), agg["n"] == n_src))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    return spark.createDataFrame(
        rows, "item string, n long, detail string, ok boolean"
    )


@register(
    "compact_small_files",
    oracle="""
    SELECT event_type,
           count(*) AS n_rows,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value,
           TRUE AS compacted_ok
    FROM events
    WHERE event_id % 5 = 0
    GROUP BY event_type
    """,
    doc="Small-file compaction gate (sources/compact.py): a filtered "
    "copy of events is written hive-partitioned by event_type with 8 "
    "deliberately tiny files per partition, compact_partitioned "
    "rewrites each leaf to ~1 file (round-robin repartition — coalesce "
    "would inherit input skew — with an atomic tmp/old swap), and the "
    "read-back must reproduce the source per-type counts and exact "
    "decimal value sums with a shrunken file count. Partition pruning "
    "survives because the hive layout is preserved per leaf.",
)
def compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.compact import compact_partitioned, dir_stats
    from .llm_ops import _PhaseTimer

    ev = load(spark, sf_dir, "events").filter(F.col("event_id") % 5 == 0)
    t = _PhaseTimer("compact_small_files")
    with _scratch_dir("ccpd_compact_") as tmp:
        base = f"{tmp}/events"
        ev.repartition(8).write.partitionBy("event_type").parquet(base)
        before = dir_stats(base)
        t.lap("write_fixture")
        totals = compact_partitioned(spark, base, target_bytes=256 * 1024 * 1024)
        t.lap("compact")  # <- the OPERATOR under test
        after = dir_stats(base)
        ok = bool(
            totals["compacted"] >= 1
            and after["files"] < before["files"]
            and after["bytes"] > 0
        )
        back = spark.read.parquet(base)
        out = (
            back.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("value").cast("decimal(25,6)"))
                .cast("double")
                .alias("sum_value"),
            )
            .withColumn("compacted_ok", F.lit(ok))
        )
        res = _materialize(spark, out)
        t.lap("readback_agg")
        return res


@register(
    "skew_salted_join_agg",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
    doc="Result-equivalence gate for the skew toolkit (operators/"
    "skew.py): lineitem joins orders through salted_join (large side "
    "salted, small side replicated 8x — the hot-key shape AQE's "
    "skew-join can't fix when the build side is too big to broadcast) "
    "and aggregates through two_phase_agg (partial on (key, salt), "
    "final on key). The oracle is the PLAIN join+agg — salting must "
    "be invisible in the result. Exact decimal revenue keeps the sum "
    "order-independent across the extra phase.",
)
def skew_salted_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(li, o, on="l_orderkey", n_salts=8)
    rev_d = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(13,6)")
    out = two_phase_agg(
        joined.withColumn("rev_d", rev_d),
        ["o_orderpriority"],
        {
            "n_items": (F.count(F.lit(1)), F.sum("n_items")),
            "revenue": (F.sum("rev_d"), F.sum("revenue")),
        },
        n_salts=8,
    )
    return out.select(
        "o_orderpriority",
        "n_items",
        F.col("revenue").cast("double").alias("revenue"),
    )


@register(
    "orc_roundtrip_stats",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(CAST('0x' || substring(md5(text), 1, 8) AS BIGINT)) AS BIGINT)
             AS text_checksum
    FROM documents
    WHERE doc_id % 3 = 0
    GROUP BY lang
    """,
    doc="Columnar-format breadth gate: a filtered slice of documents is "
    "written as ORC (Spark's second native columnar format — zlib, "
    "predicate-pushdown-capable like parquet) and read back; per-lang "
    "counts, char totals, and an md5-derived content checksum "
    "(functions/text.py hash32) must reproduce the parquet source "
    "exactly, proving the ORC writer/reader round-trips values "
    "byte-for-byte. The oracle computes the same aggregates straight "
    "from the parquet view.",
)
def orc_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import text as TX

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    with _scratch_dir("ccpd_orc_") as tmp:
        path = f"{tmp}/documents_orc"
        docs.select("doc_id", "lang", "text", "n_chars").write.mode(
            "overwrite"
        ).orc(path)
        back = spark.read.orc(path)
        out = back.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(TX.hash32(F.col("text"))).alias("text_checksum"),
        )
        return _materialize(spark, out)


@register(
    "bucketed_join_agg",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total_price,
           TRUE AS colocated_ok
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    doc="Bucketed co-located join gate (operators/bucketing.py): orders "
    "and customer are written as same-spec bucketed+sorted tables "
    "(8 buckets on the join key), broadcast is disabled to force a "
    "sort-merge join, and the gate asserts IN-QUERY that the join plan "
    "contains no Exchange — the at-rest co-location that replaces the "
    "fact-side shuffle at 100 TB — while the per-segment counts and "
    "exact decimal price sums must match the oracle's plain join over "
    "the parquet views.",
)
def bucketed_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bucketing import bucketed_join, write_bucketed_table

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    with _scratch_dir("ccpd_bucketed_") as tmp:
        try:
            spark.sql("DROP TABLE IF EXISTS gate_bkt_orders")
            spark.sql("DROP TABLE IF EXISTS gate_bkt_cust")
            write_bucketed_table(o, "gate_bkt_orders", "o_custkey", 8, path=f"{tmp}/o")
            write_bucketed_table(c, "gate_bkt_cust", "c_custkey", 8, path=f"{tmp}/c")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            j = bucketed_join(
                spark, "gate_bkt_orders", "gate_bkt_cust", "o_custkey", "c_custkey"
            )
            # the co-location claim, checked in-query: no Exchange anywhere
            # in the JOIN's plan (the group-by below adds its own, after)
            plan = j._jdf.queryExecution().executedPlan().toString()
            colocated = "Exchange" not in plan and "SortMergeJoin" in plan
            out = (
                j.groupBy("c_mktsegment")
                .agg(
                    F.count(F.lit(1)).alias("n_orders"),
                    F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
                    .cast("double")
                    .alias("total_price"),
                )
                .withColumn("colocated_ok", F.lit(bool(colocated)))
            )
            return _materialize(spark, out)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
            spark.sql("DROP TABLE IF EXISTS gate_bkt_orders")
            spark.sql("DROP TABLE IF EXISTS gate_bkt_cust")


@register(
    "schema_evolution_merge",
    oracle="""
    SELECT COALESCE(CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END,
                    '<pre-evolution>') AS priority,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY 1
    """,
    doc="Parquet schema-evolution gate: an 'old' batch (o_orderkey, "
    "o_totalprice) and a 'new' batch that adds o_orderpriority are "
    "written as separate files under one dataset root, read back with "
    "mergeSchema=true, and the union'd schema must backfill the "
    "pre-evolution rows with NULL for the added column — the lakehouse "
    "seam where producers add columns before every old file is "
    "rewritten. The oracle recomputes the same split straight from the "
    "orders view (even keys = old batch, NULL priority).",
)
def schema_evolution_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    with _scratch_dir("ccpd_evolve_") as tmp:
        base = f"{tmp}/orders_evolving"
        o.filter(F.col("o_orderkey") % 2 == 0).select(
            "o_orderkey", "o_totalprice"
        ).write.parquet(f"{base}/batch=old")
        o.filter(F.col("o_orderkey") % 2 == 1).select(
            "o_orderkey", "o_totalprice", "o_orderpriority"
        ).write.parquet(f"{base}/batch=new")
        merged = spark.read.option("mergeSchema", "true").parquet(base)
        out = (
            merged.groupBy(
                F.coalesce(F.col("o_orderpriority"), F.lit("<pre-evolution>")).alias(
                    "priority"
                )
            )
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
                .cast("double")
                .alias("total_price"),
            )
        )
        return _materialize(spark, out)


@register(
    "json_malformed_ingest",
    oracle="""
    WITH idx AS (SELECT i FROM range(0, 600) t(i)),
    shaped AS (
      SELECT i,
             (i % 7 = 0) AS corrupt,
             (i % 7 <> 0 AND i % 11 = 0) AS missing_v
      FROM idx
    )
    SELECT CAST(count(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN corrupt THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
           CAST(SUM(CASE WHEN missing_v THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_v,
           CAST(SUM(CASE WHEN NOT corrupt THEN i ELSE 0 END) AS BIGINT) AS sum_id_parsed,
           CAST(SUM(CAST(CASE WHEN NOT corrupt AND NOT missing_v THEN i * 0.5 ELSE 0 END
                         AS DECIMAL(25,6))) AS DOUBLE) AS sum_v
    FROM shaped
    """,
    doc="Error-tolerant ingestion gate (the S6/S7 PERMISSIVE contract "
    "under real dirt): a fixture of 600 JSON lines — every 7th "
    "syntactically broken, every 11th missing a field — reads under an "
    "explicit schema with _corrupt_record; broken lines must surface "
    "whole in the corrupt column (all data fields NULL), missing "
    "fields must parse as NULL without poisoning the row, and nothing "
    "may be dropped or raised. The oracle recomputes every aggregate "
    "from the fixture's closed-form index arithmetic. At 100 TB a "
    "reader that throws on the first bad crawl record never finishes; "
    "quarantine-and-continue is the only viable contract.",
)
def json_malformed_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    lines = []
    for i in range(600):
        if i % 7 == 0:
            lines.append(f'{{"id": {i}, "v": ')  # truncated JSON
        elif i % 11 == 0:
            lines.append(f'{{"id": {i}}}')
        else:
            lines.append(f'{{"id": {i}, "v": {i * 0.5}}}')
    with _scratch_dir("ccpd_dirty_") as tmp:
        path = f"{tmp}/dirty.json"
        with open(path, "w") as f:
            f.write("\n".join(lines))
        df = spark.read.schema("id long, v double, _corrupt_record string").json(
            path, mode="PERMISSIVE", columnNameOfCorruptRecord="_corrupt_record"
        )
        bad = F.col("_corrupt_record").isNotNull()
        out = df.agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(bad, 1).otherwise(0)).cast("long").alias("n_corrupt"),
            F.sum(F.when(~bad & F.col("v").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_missing_v"),
            F.sum(F.when(~bad, F.col("id")).otherwise(0)).alias("sum_id_parsed"),
            # gate on ~bad like every other aggregate: Spark's PERMISSIVE
            # partial-results can populate fields on quarantined rows
            # (fixture-shape dependent), and the oracle zeroes them
            F.sum(
                F.when(~bad, F.coalesce(F.col("v"), F.lit(0.0)))
                .otherwise(0.0)
                .cast("decimal(25,6)")
            )
            .cast("double")
            .alias("sum_v"),
        )
        return _materialize(spark, out)


@register(
    "socrata_paged_scan",
    oracle="""
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier
    WHERE s_acctbal > 0 AND s_suppkey > 10
    """,
    doc="End-to-end gate for the Socrata DataSource (S1/S2) over real "
    "HTTP: a loopback SODA server (sources/soda_fixture.py) serves the "
    "supplier table in SODA's stringly JSON, and the scan goes through "
    "spark.read.format('socrata') with (a) a page size forcing several "
    "partitions — the COUNT probe plans one InputPartition per page, "
    "asserted in-gate against the closed-form page count, (b) one "
    "scripted 429+Retry-After the in-task backoff must absorb, (c) the "
    "'where' option (s_acctbal > 0) AND a DataFrame .filter pushed via "
    "pushFilters (s_suppkey > 10), both of which the probe and every "
    "page request carry as $where, and (d) schema-driven coercion of "
    "the stringly cells back to long/string/double. The oracle is "
    "plain SQL over the same parquet the fixture rows came from, so "
    "paging, pushdown, retry and coercion must all compose losslessly. "
    "Reference parity: extractor/main.go:716-779 (serial paged scan -> "
    "partition-parallel pages), 291-336 (retry/backoff), 202-222 "
    "($where build). At 100 TB the pages fetch concurrently across "
    "executors; no page ever materializes on the driver.",
)
def socrata_paged_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.soda_fixture import LoopbackSoda
    from ..sources.socrata_source import SocrataDataSource

    sup = load(spark, sf_dir, "supplier")
    fixture_rows = [
        {
            "s_suppkey": r.s_suppkey,
            "s_name": r.s_name,
            "s_acctbal": r.s_acctbal,
        }
        # bounded fixture: supplier is the small TPC-H dim (1e4 rows/SF);
        # the collect builds the SERVER, not the scan result
        for r in sup.select("s_suppkey", "s_name", "s_acctbal").collect()
    ]
    expected = [
        r for r in fixture_rows if r["s_acctbal"] > 0 and r["s_suppkey"] > 10
    ]
    page_size = max(7, -(-len(fixture_rows) // 8))  # ~8 pages at any SF
    n_pages = max(-(-len(expected) // page_size), 1)
    prev = spark.conf.get("spark.sql.python.filterPushdown.enabled", None)
    spark.dataSource.register(SocrataDataSource)
    soda = LoopbackSoda(fixture_rows, fail_first=1, fail_status=429)
    with soda as endpoint:
        try:
            spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
            df = (
                spark.read.format("socrata")
                .option("endpoint", endpoint)
                .option("schema", "s_suppkey long, s_name string, s_acctbal double")
                .option("order", "s_suppkey")
                .option("select", "s_suppkey, s_name, s_acctbal")
                .option("where", "s_acctbal > 0")
                .option("page_size", page_size)
                .option("backoff_s", 0.01)
                .option("filter_pushdown", "true")
                .load()
                .filter(F.col("s_suppkey") > 10)
            )
            got_parts = df.rdd.getNumPartitions()
            if got_parts != n_pages:  # the probe must have seen BOTH filters
                raise AssertionError(
                    f"expected {n_pages} page partitions, planned {got_parts}"
                )
            out = _materialize(spark, df)
            # the scan must have issued the scripted-429 request, its
            # retry, at least one COUNT probe, and one GET per page —
            # fewer hits means the retry/paging path was bypassed
            if len(soda.hits) < n_pages + 2:
                raise AssertionError(
                    f"expected >= {n_pages + 2} SODA requests "
                    f"(429 + retried probe + {n_pages} pages), saw {len(soda.hits)}"
                )
            return out
        finally:
            if prev is None:
                spark.conf.unset("spark.sql.python.filterPushdown.enabled")
            else:
                spark.conf.set("spark.sql.python.filterPushdown.enabled", prev)


@register(
    "partition_overwrite_dynamic",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(CASE WHEN event_type = 'click' THEN value * 2
                              ELSE value END AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY event_type
    """,
    doc="Dynamic partition overwrite gate — the 'backfill one day' "
    "write path: events is written hive-partitioned by event_type, "
    "then ONLY the click partition is rewritten (values doubled) via "
    "partitionOverwriteMode=dynamic with an overwrite that carries "
    "just click rows; static mode would TRUNCATE the whole table "
    "here, so the gate proves the other four partitions survive "
    "byte-for-byte (counts + exact decimal sums vs the oracle's "
    "recomputation from the source view). At 100 TB nobody rewrites "
    "the table to fix a day; partition-scoped overwrite is the "
    "idempotent reprocessing primitive.",
)
def partition_overwrite_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    with _scratch_dir("ccpd_dynpart_") as tmp:
        try:
            base = f"{tmp}/events_part"
            ev.write.partitionBy("event_type").parquet(base)
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            fixed = ev.filter(F.col("event_type") == "click").withColumn(
                "value", F.col("value") * 2
            )
            fixed.write.mode("overwrite").partitionBy("event_type").parquet(base)
            back = spark.read.parquet(base)
            out = back.groupBy("event_type").agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("value").cast("decimal(25,6)"))
                .cast("double")
                .alias("sum_value"),
            )
            return _materialize(spark, out)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


@register(
    "binary_file_ingest",
    oracle="""
    WITH idx AS (SELECT i FROM range(0, 48) t(i)),
    bmp AS (SELECT i, 8+(i%5) AS w, 6+(i%7) AS h FROM idx WHERE i%3=0),
    wav AS (SELECT i, 1+(i%2) AS ch, 800+40*(i%10) AS fr FROM idx WHERE i%3=1),
    ppm AS (SELECT i, 4+(i%4) AS w, 3+(i%6) AS h FROM idx WHERE i%3=2)
    SELECT 'bmp' AS ext, CAST(count(*) AS BIGINT) AS n_files,
           CAST(SUM(54 + h*((3*w+3)//4*4)) AS BIGINT) AS total_bytes,
           CAST(SUM(w) AS BIGINT) AS sum_width
    FROM bmp
    UNION ALL
    SELECT 'wav', CAST(count(*) AS BIGINT), CAST(SUM(44 + fr*ch*2) AS BIGINT),
           CAST(0 AS BIGINT)
    FROM wav
    UNION ALL
    SELECT 'ppm', CAST(count(*) AS BIGINT), CAST(SUM(11 + 3*w*h) AS BIGINT),
           CAST(SUM(w) AS BIGINT)
    FROM ppm
    """,
    doc="binaryFile-source ingestion — how raw media actually enters a "
    "100 TB lake (one row per FILE: path, length, content bytes — no "
    "parsing at scan time, lengths served from file metadata): 48 "
    "deterministic BMP/WAV/PPM files are written to disk from the "
    "closed-form fixture generators (operators/multimodal.py), read "
    "back through spark.read.format('binaryFile'), decoded at the "
    "header level (extract_media_meta's Arrow-batched mapInPandas), "
    "and the per-extension file counts / byte totals / decoded widths "
    "must reproduce the oracle's fixture arithmetic exactly.",
)
def binary_file_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import multimodal as MM

    with _scratch_dir("ccpd_binfile_") as tmp:
        for i in range(48):
            kind = i % 3
            if kind == 0:
                blob, ext = MM.make_bmp(8 + (i % 5), 6 + (i % 7), seed=i), "bmp"
            elif kind == 1:
                blob, ext = (
                    MM.make_wav(800 + 40 * (i % 10), sample_rate=8000,
                                n_channels=1 + (i % 2), seed=i),
                    "wav",
                )
            else:
                blob, ext = MM.make_ppm(4 + (i % 4), 3 + (i % 6), seed=i), "ppm"
            with open(f"{tmp}/m{i:03d}.{ext}", "wb") as f:
                f.write(blob)
        files = spark.read.format("binaryFile").load(tmp)
        # media_id derives deterministically from the file path: the
        # decoded/ext join stays aligned under any recompute or
        # partition-layout change (monotonically_increasing_id would
        # need a persist pin and could still misalign on eviction)
        media = files.select(
            F.xxhash64("path").alias("media_id"),
            F.col("content"),
            F.struct(
                F.lit(None).cast("string").alias("media_type"),
                F.element_at(F.split(F.col("path"), r"\."), -1).alias("format"),
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                F.lit(None).cast("int").alias("duration_ms"),
                F.lit(None).cast("int").alias("n_channels"),
            ).alias("meta"),
        )
        decoded = MM.extract_media_meta(media)
        out = (
            decoded.join(
                media.select("media_id", F.col("meta")["format"].alias("ext")),
                "media_id",
            )
            .groupBy("ext")
            .agg(
                F.count(F.lit(1)).alias("n_files"),
                F.sum("n_bytes").alias("total_bytes"),
                F.coalesce(F.sum("width"), F.lit(0)).cast("long").alias("sum_width"),
            )
        )
        return _materialize(spark, out)
