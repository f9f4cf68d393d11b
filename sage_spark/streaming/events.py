"""Streaming analytics over an events stream: watermarked windowed
aggregation and a custom stateful operator via applyInPandasWithState.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_event_counts(
    events: DataFrame,
    *,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling/sliding window counts per event_type — late rows
    beyond the watermark are dropped, state is bounded."""
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end"), "event_type", "n", "sum_value")
    )


SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start", T.TimestampType(), True),
        T.StructField("session_end", T.TimestampType(), True),
        T.StructField("n_events", T.LongType(), True),
        T.StructField("closed", T.BooleanType(), True),
    ]
)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ts", T.DoubleType(), True),
        T.StructField("last_ts", T.DoubleType(), True),
        T.StructField("n", T.LongType(), True),
    ]
)


def sessionize_users(
    events: DataFrame,
    *,
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
) -> DataFrame:
    """Custom stateful operator: per-user session windows with an inactivity
    gap, via applyInPandasWithState (processing-time timeout closes idle
    sessions). Demonstrates the arbitrary-stateful path the built-in
    session_window cannot express when the close condition is custom."""

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        rows = pd.concat(list(pdfs), ignore_index=True)
        timestamps = sorted(float(ts.timestamp()) for ts in rows["ts"])
        if state.exists:
            start_ts, last_ts, n = state.get
        else:
            start_ts, last_ts, n = None, None, 0
        out = []
        for ts in timestamps:
            if last_ts is not None and ts - last_ts > gap_seconds:
                out.append((user_id, start_ts, last_ts, n, True))
                start_ts, n = ts, 0
            if start_ts is None:
                start_ts = ts
            last_ts = ts
            n += 1
        state.update((start_ts, last_ts, n))
        state.setTimeoutDuration(gap_seconds * 1000)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [o[0] for o in out],
                    "session_start": [pd.Timestamp(o[1], unit="s") for o in out],
                    "session_end": [pd.Timestamp(o[2], unit="s") for o in out],
                    "n_events": [o[3] for o in out],
                    "closed": [o[4] for o in out],
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def dedupe_stream(
    docs: DataFrame,
    *,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: content fingerprint (sha2 of the normalized
    text — same rule as the batch operator) deduplicated with
    ``dropDuplicatesWithinWatermark``, so state for a fingerprint is evicted
    once the watermark passes it — bounded state at unbounded input, the
    streaming form of the batch skip-if-exists gate."""
    from ..operators.dedup import normalized_text

    fp = docs.withColumn("fingerprint", F.sha2(normalized_text(F.col(text_col)), 256))
    return fp.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(["fingerprint"])


def batch_sessionize(events: DataFrame, *, gap_seconds: int = 1800) -> DataFrame:
    """Batch sessionization (same semantics, pure SQL): session starts where
    the gap from the previous event exceeds the threshold; cumulative sum of
    starts labels sessions. Used as the oracle for the streaming operator."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    flagged = events.withColumn(
        "new_session",
        (
            F.coalesce(
                F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)) > gap_seconds,
                F.lit(True),
            )
        ).cast("int"),
    ).withColumn("session_id", F.sum("new_session").over(w))
    return (
        flagged.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
    )
