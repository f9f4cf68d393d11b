"""Sequence packing for LLM training batches (concat-and-chunk layout).

Training pipelines lay documents end-to-end in a deterministic order and
slice the token stream into fixed-size context windows; each document needs
to know its global token offset, which window(s) it lands in, and where it
starts inside its first window. That is a global cumulative sum — and a
naive ``Window.orderBy(...)`` over the whole corpus is a single-partition
bottleneck at 100 TB.

This operator uses the two-phase cumsum: documents are sharded
deterministically (sha256-substring of the id — engine-portable, so the
DuckDB oracle reproduces the layout), the cumsum runs per shard (parallel
windows), per-shard totals (one row per shard) get a running prefix in a
tiny single-partition window, and the broadcast prefix joins back. The
resulting layout order is (shard, order_col, id) — deterministic across
partitionings, retries, and cluster sizes, which is what resumable training
data requires; a global semantic order is not (and cannot cheaply be)
preserved.

Everything is relational and reproducible in ANSI SQL, so the driver oracle
recomputes the identical layout with one global window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pack_sequences(
    df: DataFrame,
    *,
    token_col: str,
    id_col: str = "doc_id",
    window: int = 2048,
    n_shards: int = 32,
    order_col: str | None = None,
) -> DataFrame:
    """Returns (id_col, n_tokens, global_offset, first_pack, last_pack,
    offset_in_pack): the deterministic concat-and-chunk layout of the corpus
    into ``window``-token packs."""
    order_col = order_col or id_col
    # sha256-derived shard (same construction as operators/corpus.py):
    # engine-portable, so the DuckDB oracle reproduces the exact layout
    shard = (
        F.conv(F.substring(F.sha2(F.col(id_col).cast("string"), 256), 1, 8), 16, 10)
        .cast("long") % n_shards
    ).cast("int")
    base = df.select(
        F.col(id_col),
        F.col(token_col).cast("long").alias("__tok"),
        shard.alias("__shard"),
        F.col(order_col).alias("__ord"),
    )
    w_in = (
        Window.partitionBy("__shard")
        .orderBy(F.col("__ord").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = base.withColumn("__cum", F.sum("__tok").over(w_in))
    # one row per shard; the prefix window is single-partition but tiny
    w_pref = Window.orderBy("__shard").rowsBetween(Window.unboundedPreceding, -1)
    prefix = (
        base.groupBy("__shard")
        .agg(F.sum("__tok").alias("__total"))
        .select("__shard", F.coalesce(F.sum("__total").over(w_pref), F.lit(0)).alias("__prefix"))
    )
    laid = within.join(F.broadcast(prefix), "__shard")
    off = F.col("__prefix") + F.col("__cum") - F.col("__tok")
    first = F.floor(off / window)
    last = F.when(F.col("__tok") > 0, F.floor((off + F.col("__tok") - 1) / window)).otherwise(first)
    return laid.select(
        F.col(id_col),
        F.col("__tok").alias("n_tokens"),
        off.cast("long").alias("global_offset"),
        first.cast("long").alias("first_pack"),
        last.cast("long").alias("last_pack"),
        F.pmod(off, F.lit(window)).cast("long").alias("offset_in_pack"),
    )
