"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no stateful stream processing (its "streams" are
RabbitMQ micro-batches); these are the Structured-Streaming-native
operators a scaled-up version of its ingest needs (SURVEY §2.8 gap +
driver mandate):

- ``sessionize``: event-time session windows with a configurable
  inactivity gap — per-key Arrow-batched state (session start/end/
  count). Sessions closed by a later in-batch event emit immediately;
  open sessions flush via EVENT-TIME timeouts when the watermark
  passes last_event + gap (deterministic — no wall-clock batches, and
  availableNow drains terminate);
- ``running_dedup``: exactly-once-per-key emission across micro-batches
  — the streaming form of the gold PK guard (ST5) when the sink can't
  anti-join.

State is per-group and bounded: sessionize keeps O(1) per active key,
running_dedup keeps the seen-key set (use TTL/timeout for unbounded key
spaces — parameterized).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), True),
        T.StructField("session_start", T.TimestampType(), True),
        T.StructField("session_end", T.TimestampType(), True),
        T.StructField("n_events", T.LongType(), True),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ts", T.DoubleType(), True),
        T.StructField("last_ts", T.DoubleType(), True),
        T.StructField("n", T.LongType(), True),
    ]
)


def _sessionize_fn(gap_seconds: float):
    # State carries epoch MICROseconds (not float seconds): micros up
    # to year ~2255 are exact in a float64 (< 2^53), while float
    # seconds leave sub-microsecond residue that pandas expands into
    # nanoseconds Arrow then refuses to truncate on output.
    gap_us = int(gap_seconds * 1_000_000)

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        out = []
        if state.hasTimedOut:
            # timeout invocation delivers no rows — flush the open session
            if state.exists:
                start, last, n = state.get
                out.append((key[0], start, last, n))
            state.remove()
        else:
            rows = pd.concat(list(pdfs), ignore_index=True)
            s = rows["ts"]
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            ts = sorted(s.astype("datetime64[ns]").astype("int64") // 1000)
            if state.exists:
                start, last, n = state.get
            else:
                start, last, n = float(ts[0]), float(ts[0]), 0
            # Late-but-in-watermark events BEFORE the recorded start:
            # chain them like the batch twin would — pre-sessions more
            # than a gap before their successor emit closed; a trailing
            # pre-session within the gap of `start` merges into (and
            # widens) the live session. An event inside [start, last]
            # cannot split a gap-free span — it just counts.
            orig_start = start
            pre = [float(t) for t in ts if t < orig_start]
            post = [float(t) for t in ts if t >= orig_start]
            if pre:
                p_start = p_last = pre[0]
                p_n = 0
                for t in pre:
                    if t - p_last > gap_us:
                        out.append((key[0], p_start, p_last, p_n))
                        p_start, p_n = t, 0
                    p_last = t
                    p_n += 1
                if start - p_last <= gap_us:
                    start = p_start
                    n += p_n
                else:
                    out.append((key[0], p_start, p_last, p_n))
            for t in post:
                if t - last > gap_us:
                    out.append((key[0], start, last, n))
                    start, n = t, 0
                last = max(last, t)
                n += 1
            state.update((start, last, n))
            # flush when event time passes the inactivity gap (clamped
            # above the current watermark — timers must be in its future)
            deadline_ms = int(last + gap_us) // 1000
            state.setTimeoutTimestamp(max(deadline_ms, state.getCurrentWatermarkMs() + 1))
        if not out:
            return iter([])
        df = pd.DataFrame(out, columns=["key", "session_start", "session_end", "n_events"])
        for c in ("session_start", "session_end"):
            df[c] = pd.to_datetime(df[c].astype("int64"), unit="us")
        return iter([df])

    return fn


def sessionize(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    gap_seconds: float = 3600.0,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Session windows with an inactivity gap over a STREAMING frame.

    In-batch-closed sessions emit immediately; open sessions flush when
    the event-time watermark passes last_event + gap. One shuffle on
    the key; state is one (start, last, count) triple per active key.
    """
    grouped = (
        events.select(
            events[key_col].cast("string").alias("key"),
            # watermarks require TIMESTAMP (ltz); NTZ inputs (Spark >=
            # 4.1 nanos-parquet reads) cast value-preserving under the
            # UTC session timezone
            events[ts_col].cast("timestamp").alias("ts"),
        )
        .withWatermark("ts", watermark_delay)
        .groupBy("key")
    )
    return grouped.applyInPandasWithState(
        _sessionize_fn(gap_seconds),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def sessionize_batch(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    gap_seconds: float = 3600.0,
) -> DataFrame:
    """Batch twin of ``sessionize`` — same semantics via window
    functions (lag → gap flag → running session id → group) so the
    stateful path has a deterministic cross-check (and batch callers
    get sessions without streaming machinery). Includes the final open
    session, which the streaming path only emits on timeout."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    w = W.partitionBy("key").orderBy("ts")
    # Epoch seconds via unix_micros: TIMESTAMP_NTZ (how Spark >= 4.1
    # reads the testdata's TIMESTAMP(NANOS) parquet) cannot be cast to
    # DOUBLE directly, but NTZ -> LTZ is legal and unix_micros is exact.
    ts_sec = F.unix_micros(F.col("ts").cast("timestamp_ltz")) / F.lit(1e6)
    gap = ts_sec - F.lag(ts_sec).over(w)
    sess = (
        events.select(F.col(key_col).cast("string").alias("key"), F.col(ts_col).alias("ts"))
        .withColumn("_new", (F.coalesce(gap > gap_seconds, F.lit(True))).cast("int"))
        .withColumn("_sid", F.sum("_new").over(w))
    )
    return sess.groupBy("key", "_sid").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ).drop("_sid")


_SEEN_SCHEMA = T.StructType([T.StructField("seen", T.LongType(), True)])


def _dedup_fn():
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs), ignore_index=True)
        if state.exists or rows.empty:
            if state.exists:
                (n,) = state.get
                state.update((n + len(rows),))
            return iter([])
        state.update((len(rows),))
        return iter([rows.head(1)])

    return fn


def running_dedup(df: DataFrame, key_col: str) -> DataFrame:
    """Emit each key's FIRST row across the whole stream; later
    micro-batch re-deliveries are swallowed (state = seen-count per
    key). The streaming analog of the gold PK insert-ignore."""
    out_schema = df.schema
    return df.groupBy(key_col).applyInPandasWithState(
        _dedup_fn(),
        outputStructType=out_schema,
        stateStructType=_SEEN_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
