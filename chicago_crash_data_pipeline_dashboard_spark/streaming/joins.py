"""Stream-stream joins and streaming deduplication.

The reference's pipeline joins enrich datasets AFTER landing them
(batch left joins in the transformer, SURVEY §2.3); at 100 TB the
streaming-native equivalents avoid ever materializing the unjoined
middle:

- ``interval_join``: watermarked stream-stream inner join with an
  event-time interval constraint. Both sides carry a watermark so the
  join state is BOUNDED — rows age out once the other side can no
  longer produce a match (Spark drops them from the state store);
  without the time constraint a stream-stream join would buffer both
  streams forever.
- ``dedup_within_watermark``: exactly-once-per-key emission under
  bounded state — the streaming twin of ``dropDuplicates``. State for
  a key is kept only while a duplicate could still arrive (the
  watermark delay), so 100 TB of historical keys never accumulates.

Both functions are plain DataFrame transformations: applied to a batch
frame the watermark is a no-op and the same code produces the batch
answer — tests pin stream ≡ batch on identical input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    interval_seconds: int = 3600,
    watermark_delay: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join right rows to left rows with the same ``key`` whose event
    time falls in ``[left_ts, left_ts + interval_seconds]``.

    State bound: each side buffers at most ``watermark_delay`` +
    ``interval_seconds`` of data per key. The join condition keeps the
    equality conjunct FIRST so the state store is hash-partitioned on
    the key (one shuffle per side, co-partitioned)."""
    l = left.withWatermark(left_ts, watermark_delay).alias("l")
    r = right.withWatermark(right_ts, watermark_delay).alias("r")
    lts, rts = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (rts >= lts)
        & (rts <= lts + F.expr(f"INTERVAL {int(interval_seconds)} SECONDS"))
    )
    return l.join(r, cond, how)


def dedup_within_watermark(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """First row per key wins; duplicate suppression state expires
    ``watermark_delay`` after the key's event time. On a batch frame
    falls back to plain ``dropDuplicates`` (same visible semantics —
    one row per key — since batch has no arrival order contract)."""
    if not df.isStreaming:
        return df.dropDuplicates(keys)
    return df.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(keys)
