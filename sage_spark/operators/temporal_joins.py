"""Temporal join operators Spark lacks as built-ins: as-of join and range
join, composed from existing DataFrame ops (no UDFs, no per-row Python).

* ``asof_join`` — for every left row, the latest right row with
  ``right.ts <= left.ts`` per key. Implemented as the union-tag + running
  last_value trick: tag both sides, sort within key by (ts, side), and let a
  running ``last(struct, ignorenulls)`` window carry the most recent right
  payload forward onto each left row. The ENTIRE right payload travels as
  ONE struct so every output column comes from the SAME latest right row
  (per-column carries would back-fill a NULL in the newest row from an older
  row — not as-of semantics). ONE shuffle (on the key), no join blow-up, no
  point-lookup loop — the classic distributed as-of shape.

  Skew: ``partitionBy(key)`` alone serializes a hot key (a null/default user
  id at crawl scale) into a single task. Pass ``time_bucket_seconds`` to
  split the running carry into per-(key, time-bucket) windows plus a tiny
  per-bucket boundary table (one row per key×bucket, running-carried across
  buckets): the hot key's rows spread over its time buckets while results
  stay identical to the unbucketed plan.

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
from pyspark.sql.types import StructField, StructType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    prefix: str = "asof_",
    time_bucket_seconds: int | None = None,
) -> DataFrame:
    """Left as-of join: every left row gains ``prefix + c`` for each
    ``right_cols`` column, all taken from the SAME latest right row
    at-or-before its timestamp (ties: the right row at the same instant
    matches). ``time_bucket_seconds`` enables the skew-safe bucketed carry
    (identical results, hot keys split across time buckets)."""
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    rrow_type = StructType([StructField(c, right.schema[c].dataType, True) for c in right_cols])
    l_tag = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        F.lit(None).cast(rrow_type).alias("__rrow"),
    )
    r_tag = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_tag.schema["__lrow"].dataType).alias("__lrow"),
        F.struct(*[F.col(c) for c in right_cols]).alias("__rrow"),
    )
    merged = l_tag.unionByName(r_tag)
    if time_bucket_seconds is None:
        # right rows sort before left rows at equal ts, so "<=" semantics hold;
        # ONE struct carry => the whole payload comes from one right row
        w = Window.partitionBy("__k").orderBy(F.col("__ts").asc(), F.col("__side").asc()).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        carried = merged.select(
            "__side", "__lrow", F.last("__rrow", ignorenulls=True).over(w).alias("__rv")
        )
    else:
        bucket = F.floor(F.unix_timestamp(F.col("__ts")) / time_bucket_seconds)
        merged = merged.withColumn("__b", bucket)
        # within-bucket running carry: hot keys parallelize across buckets
        w = Window.partitionBy("__k", "__b").orderBy(
            F.col("__ts").asc(), F.col("__side").asc()
        ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        within = merged.select(
            "__k", "__b", "__side", "__lrow",
            F.last("__rrow", ignorenulls=True).over(w).alias("__rv_in"),
        )
        # boundary table: latest right row per (key, bucket) — ONE row per
        # key×bucket, then a tiny cross-bucket running carry of buckets < b
        per_bucket = (
            merged.filter(F.col("__side") == 0)
            .groupBy("__k", "__b")
            .agg(F.max_by("__rrow", "__ts").alias("__blast"))
        )
        wb = Window.partitionBy("__k").orderBy(F.col("__b").asc()).rowsBetween(
            Window.unboundedPreceding, -1
        )
        prev = (
            merged.select("__k", "__b").distinct()
            .join(per_bucket, ["__k", "__b"], "left")
            .select("__k", "__b", F.last("__blast", ignorenulls=True).over(wb).alias("__prev"))
        )
        carried = within.join(prev, ["__k", "__b"], "left").select(
            "__side", "__lrow", F.coalesce("__rv_in", "__prev").alias("__rv")
        )
    return carried.filter(F.col("__side") == 1).select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"__rv.{c}").alias(f"{prefix}{c}") for c in right_cols],
    )


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
