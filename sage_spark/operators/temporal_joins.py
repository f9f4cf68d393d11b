"""Temporal join operators Spark lacks as built-ins: as-of join and range
join, composed from existing DataFrame ops (no UDFs, no per-row Python).

* ``asof_join`` — for every left row, the latest right row with
  ``right.ts <= left.ts`` per key. Implemented as the union-tag + running
  last_value trick: tag both sides, sort within key by (ts, side), and let a
  running ``last(..., ignorenulls)`` window carry the most recent right
  payload forward onto each left row. ONE shuffle (on the key), no join
  blow-up, no point-lookup loop — the classic distributed as-of shape.

* ``range_join`` — events joined to enclosing [start, end) intervals.
  A naive theta-join degenerates to per-key cross products; instead the time
  axis is binned (``bin_seconds``), intervals explode to the bins they span,
  and the join runs on (key, bin) equality before the exact range filter —
  candidate pairs shrink from |events|x|intervals| per key to only
  same-bin pairs. Same technique Databricks ships as "range join
  optimization"; here it is explicit and testable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every left row gains ``prefix + c`` for each
    ``right_cols`` column, from the latest right row at-or-before its
    timestamp (ties: the right row at the same instant matches)."""
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    l_tag = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
    )
    r_tag = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_tag.schema["__lrow"].dataType).alias("__lrow"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    merged = l_tag.unionByName(r_tag)
    # right rows sort before left rows at equal ts, so "<=" semantics hold
    w = Window.partitionBy("__k").orderBy(F.col("__ts").asc(), F.col("__side").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    carried = merged.select(
        "__side",
        "__lrow",
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__rv_{c}") for c in right_cols],
    )
    out = carried.filter(F.col("__side") == 1).select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"__rv_{c}").alias(f"{prefix}{c}") for c in right_cols],
    )
    return out


def range_join(
    events: DataFrame,
    intervals: DataFrame,
    *,
    on: str,
    event_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bin_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join events to intervals with ``start <= ts < end`` per key, binned so
    the equi-join prunes candidates before the exact predicate."""
    ev = events.withColumn("__bin", F.floor(F.unix_timestamp(F.col(event_ts)) / bin_seconds))
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / bin_seconds),
                F.floor((F.unix_timestamp(F.col(end_col)) - 1) / bin_seconds),
            )
        ),
    )
    cond = (
        (ev[on] == iv[on])
        & (ev["__bin"] == iv["__bin"])
        & (ev[event_ts] >= iv[start_col])
        & (ev[event_ts] < iv[end_col])
    )
    joined = ev.join(iv, cond, how)
    return joined.select(
        *[ev[c] for c in events.columns],
        *[iv[c] for c in intervals.columns if c != on],
    )
