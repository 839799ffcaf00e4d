"""Structured Streaming ingest: exactly-once file processing via the
checkpoint, PK upsert under re-delivery, watermark advance semantics,
and late-data windowed aggregation parity with batch."""

from __future__ import annotations

from pyspark.sql import functions as F

from chicago_crash_data_pipeline_dashboard_spark.operators.clean import clean_crashes
from chicago_crash_data_pipeline_dashboard_spark.operators.gold import GoldTable
from chicago_crash_data_pipeline_dashboard_spark.plans.crash_ops import synth_bronze_spark
from chicago_crash_data_pipeline_dashboard_spark.schemas import BRONZE_CRASHES
from chicago_crash_data_pipeline_dashboard_spark.sources.bronze import write_bronze
from chicago_crash_data_pipeline_dashboard_spark.streaming.ingest import (
    stream_bronze_to_gold,
    windowed_event_counts,
)
from chicago_crash_data_pipeline_dashboard_spark.streaming.watermark import WatermarkStore


def test_stream_ingest_end_to_end(spark, sf_smoke, tmp_path):
    bronze_dir = str(tmp_path / "bronze")
    gold_path = str(tmp_path / "gold")
    ckpt = str(tmp_path / "ckpt")
    wm_path = str(tmp_path / "wm.json")

    bronze = synth_bronze_spark(spark, sf_smoke).cache()
    first = bronze.filter(F.col("crash_record_id").isNotNull()).limit(400)
    write_bronze(first, bronze_dir, "crashes", corr="run-1")

    # batch 1: everything cleans + inserts (mode=backfill → watermark untouched)
    stats1 = stream_bronze_to_gold(
        spark, bronze_dir, "crashes", BRONZE_CRASHES, gold_path, ckpt, wm_path,
        mode="backfill",
    )
    gold = GoldTable(spark, gold_path)
    n1 = gold.read().count()
    assert n1 == sum(s["inserted"] for s in stats1) > 0
    assert WatermarkStore(wm_path).get() is None  # backfill never advances

    # drain again with the same checkpoint: no new files → no new batches
    stats2 = stream_bronze_to_gold(
        spark, bronze_dir, "crashes", BRONZE_CRASHES, gold_path, ckpt, wm_path,
        mode="backfill",
    )
    assert sum(s.get("inserted", 0) for s in stats2) == 0
    assert gold.read().count() == n1

    # batch 2 re-delivers run-1 rows plus fresh ones → only fresh insert
    write_bronze(bronze, bronze_dir, "crashes", corr="run-2")
    stats3 = stream_bronze_to_gold(
        spark, bronze_dir, "crashes", BRONZE_CRASHES, gold_path, ckpt, wm_path,
        mode="streaming",
    )
    n2 = gold.read().count()
    assert n2 > n1
    assert sum(s["skipped"] for s in stats3) > 0  # re-delivered PKs skipped
    assert gold.verify_integrity()["ok"] == 1  # no dup/null PKs
    assert WatermarkStore(wm_path).get() is not None  # streaming advances


def test_watermark_monotonic(tmp_path):
    wm = WatermarkStore(str(tmp_path / "w.json"))
    assert wm.get() is None
    assert wm.advance("2025-01-05", mode="streaming") == "2025-01-05"
    assert wm.advance("2025-01-03", mode="streaming") == "2025-01-05"  # never regresses
    assert wm.advance("2025-02-01", mode="backfill") == "2025-01-05"  # backfill frozen
    assert wm.advance("2025-02-01", mode="streaming") == "2025-02-01"


def test_windowed_counts_stream_matches_batch(spark, sf_smoke, tmp_path):
    ev = spark.read.parquet(f"{sf_smoke}/events.parquet")
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    ev = ev.select("event_id", "ts").limit(500)

    src_dir = str(tmp_path / "events_json")
    ev.withColumn("ts", F.date_format("ts", "yyyy-MM-dd HH:mm:ss")).write.json(src_dir)

    batch_expected = {
        (r.window_start, r.window_end): r.n_events
        for r in windowed_event_counts(ev).collect()
    }

    schema = "event_id bigint, ts timestamp"
    stream = spark.readStream.schema(schema).json(src_dir)
    out = windowed_event_counts(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.window_start, r.window_end): r.n_events
        for r in spark.table("win_counts").collect()
    }
    assert got == batch_expected
