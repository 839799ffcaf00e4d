"""applyInPandasWithState operators: session windows and streaming
first-seen dedup, cross-checked against batch equivalents."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from chicago_crash_data_pipeline_dashboard_spark.streaming.stateful import (
    running_dedup,
    sessionize,
    sessionize_batch,
)

T0 = dt.datetime(2025, 3, 1, 10, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        [(k, T0 + dt.timedelta(seconds=s)) for k, s in rows],
        "event_type string, ts timestamp",
    )


ROWS = [
    ("a", 0), ("a", 30), ("a", 60),      # session 1 (3 events)
    ("a", 400), ("a", 410),              # session 2 (2 events)
    ("a", 900),                          # session 3 (open tail)
    ("b", 0),                            # session 1
    ("b", 1000), ("b", 1010),            # session 2 (open tail)
]


def test_sessionize_batch_windows(spark):
    df = _events(spark, ROWS)
    out = {
        (r.key, r.session_start): (r.session_end, r.n_events)
        for r in sessionize_batch(df, gap_seconds=120).collect()
    }
    t = lambda s: T0 + dt.timedelta(seconds=s)
    assert out[("a", t(0))] == (t(60), 3)
    assert out[("a", t(400))] == (t(410), 2)
    assert out[("a", t(900))] == (t(900), 1)
    assert out[("b", t(0))] == (t(0), 1)
    assert out[("b", t(1000))] == (t(1010), 2)


def test_sessionize_stream_matches_batch_closed_sessions(spark, tmp_path):
    df = _events(spark, ROWS)
    src = str(tmp_path / "src")
    df.withColumn("ts", F.date_format("ts", "yyyy-MM-dd HH:mm:ss")).write.json(src)

    stream = spark.readStream.schema("event_type string, ts timestamp").json(src)
    q = (
        sessionize(stream, gap_seconds=120)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.key, r.session_start): (r.session_end, r.n_events)
        for r in spark.table("sessions").collect()
    }
    # closed sessions = batch sessions minus each key's final (open) one
    batch = sessionize_batch(df, gap_seconds=120)
    last_start = {
        r.key: r.session_start
        for r in batch.groupBy("key").agg(F.max("session_start").alias("session_start")).collect()
    }
    expected = {
        (r.key, r.session_start): (r.session_end, r.n_events)
        for r in batch.collect()
        if r.session_start != last_start[r.key]
    }
    assert got == expected


def test_running_dedup_across_restarts(spark, tmp_path):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        stream = spark.readStream.schema("k string, v long").json(src)
        q = (
            running_dedup(stream, "k")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {r.k for r in spark.read.parquet(sink).collect()}

    spark.createDataFrame([("x", 1), ("y", 2), ("x", 3)], "k string, v long").write.json(src)
    assert drain() == {"x", "y"}

    spark.createDataFrame([("x", 9), ("z", 4)], "k string, v long").write.mode("append").json(src)
    seen = drain()
    assert seen == {"x", "y", "z"}  # x re-delivery swallowed, z new
    # exactly one row per key ever emitted
    counts = spark.read.parquet(sink).groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in counts)


def test_sessionize_late_event_widens_session_start(spark, tmp_path):
    """A late-but-in-watermark event earlier than the recorded session
    start must pull session_start back (matching the batch twin's
    min(ts)), not be silently absorbed with the old start."""
    import datetime as dt

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def write(rows, mode):
        _events(spark, rows).withColumn(
            "ts", F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
        ).write.mode(mode).json(src)

    def drain():
        stream = spark.readStream.schema("event_type string, ts timestamp").json(src)
        q = (
            sessionize(stream, gap_seconds=120, watermark_delay="1000 seconds")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write([("a", 100), ("a", 130)], "overwrite")
    drain()
    # batch 2: t=50 arrives late (within the 1000 s watermark) and a
    # far-future event closes the widened session in-batch
    write([("a", 50), ("a", 10000)], "append")
    drain()

    rows = spark.read.parquet(sink).collect()
    closed = {(r.key, r.session_start): (r.session_end, r.n_events) for r in rows}
    t = lambda s: T0 + dt.timedelta(seconds=s)  # noqa: E731
    assert closed[("a", t(50))] == (t(130), 3)


def test_sessionize_late_event_beyond_gap_separate_session(spark, tmp_path):
    """A late event more than gap_seconds BEFORE the live session's
    start must emit as its own closed session (batch-twin semantics),
    not be absorbed into the live session."""
    import datetime as dt

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def write(rows, mode):
        _events(spark, rows).withColumn(
            "ts", F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
        ).write.mode(mode).json(src)

    def drain():
        stream = spark.readStream.schema("event_type string, ts timestamp").json(src)
        q = (
            sessionize(stream, gap_seconds=120, watermark_delay="5000 seconds")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write([("a", 1000), ("a", 1030)], "overwrite")
    drain()
    # t=50 is 950 s before the live session start (> gap): its own
    # session, closed. t=400 within-gap of nothing; chains with t=300.
    write([("a", 50), ("a", 300), ("a", 400), ("a", 9000)], "append")
    drain()

    rows = spark.read.parquet(sink).collect()
    got = {(r.key, r.session_start): (r.session_end, r.n_events) for r in rows}
    t = lambda s: T0 + dt.timedelta(seconds=s)  # noqa: E731
    assert got[("a", t(50))] == (t(50), 1)       # solo late session
    assert got[("a", t(300))] == (t(400), 2)     # late chain
    assert got[("a", t(1000))] == (t(1030), 2)   # live session closed by 9000
