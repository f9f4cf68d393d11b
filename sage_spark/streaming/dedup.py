"""Streaming near-duplicate detection: MinHash-LSH over micro-batches.

Batch LSH dedup (operators/dedup.py) sees the whole corpus at once; a
crawl frontier arrives incrementally, and each new page must be checked
against EVERYTHING seen so far without recomputing old signatures. The
standard shape:

* a persistent **bucket index** table (doc_id, band, bucket) in the
  TableStore — the accumulated LSH state, keyed storage instead of
  operator state so it survives restarts and is queryable;
* per micro-batch (foreachBatch): compute the batch's banded buckets once,
  flag a document as near-dup when it shares a (band, bucket) with any
  prior-batch document OR an earlier document of the same batch (earlier =
  smaller id, matching the batch pair rule id_a < id_b), then upsert the
  batch's buckets and flags.

Exactly-once: the bucket upsert is keyed on (doc_id, band) and the flag
upsert on doc_id, so a replayed micro-batch is a no-op — the same
idempotent-resume story as the KG pipeline. Ordering caveat: "earlier"
means arrived in an earlier micro-batch (or smaller id within one batch),
which is the only order a stream has.

At crawl scale the per-batch check is a join of the BATCH's buckets
(small) against the index on (band, bucket). The index is LAID OUT by
xxhash64(band, bucket) (TableStore layout_keys) while keeping its upsert
identity (doc_id, band): the probe computes the batch's touched bucket-id
set (bounded by the store's bucket count) and reads ONLY those partition
dirs — per-batch probe cost is O(batch buckets), not O(accumulated index).
Replay idempotency: foreachBatch re-invokes a failed batch with the SAME
batch id, so the index stores each row's ``batch_seq`` and the probe keeps
only partners with ``batch_seq < current`` — a replayed batch sees the
index exactly as its first run did, even when LATER batches (possibly
containing near-dups of this one) have landed since. The batch's own ids
are additionally anti-joined out (covers same-seq rows and callers that
pass no seq). Without the ordering filter, the smaller-id doc of a
near-dup pair would flip from clean to flagged on replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

from ..operators.dedup import banded_minhash_buckets
from ..store import TableStore

BUCKET_TABLE = "lsh_bucket_index"
FLAG_TABLE = "near_dup_flags"

_BUCKET_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("band", T.IntegerType(), False),
        T.StructField("bucket", T.LongType(), False),
        T.StructField("batch_seq", T.LongType(), False),
    ]
)


def process_near_dup_batch(
    batch: DataFrame,
    store: TableStore,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_len: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    batch_seq: int | None = None,
) -> None:
    """One micro-batch of the streaming near-dup check (also directly
    usable for incremental batch ingestion).

    ``batch_seq`` is the arrival marker (foreachBatch's batch id): replays
    of seq K probe only rows with seq < K. Callers without a seq (ad-hoc
    incremental ingestion) get sentinel -1 rows and an unordered probe —
    first runs behave identically; only replay-after-later-batches needs
    the seq."""
    spark = batch.sparkSession
    ids = batch.select(F.col(id_col).cast("string").alias("doc_id")).distinct()
    banded = banded_minhash_buckets(
        batch.withColumn(id_col, F.col(id_col).cast("string")),
        text_col,
        id_col,
        shingle_len=shingle_len,
        num_hashes=num_hashes,
        bands=bands,
    ).select(F.col(id_col).alias("doc_id"), "band", "bucket")
    banded = banded.localCheckpoint(eager=True)  # one signature pass per batch

    # probe-side pruning: scan only the index dirs the batch's (band, bucket)
    # pairs hash into; then restrict to rows that arrived BEFORE this batch
    # (seq filter + own-id anti-join) so a replayed batch reproduces its
    # first-run view (exactly-once flags under retry)
    index = store.read_pruned(
        spark, BUCKET_TABLE, banded.select("band", "bucket"), _BUCKET_SCHEMA
    )
    if batch_seq is not None:
        index = index.filter(F.col("batch_seq") < F.lit(int(batch_seq)))
    index = index.join(ids, "doc_id", "left_anti")
    prior_hits = banded.join(
        index.withColumnRenamed("doc_id", "partner"), ["band", "bucket"]
    ).select("doc_id", "partner")
    intra_hits = (
        banded.alias("l")
        .join(banded.alias("r"), ["band", "bucket"])
        .filter(F.col("r.doc_id") < F.col("l.doc_id"))
        .select(F.col("l.doc_id").alias("doc_id"), F.col("r.doc_id").alias("partner"))
    )
    flags = (
        ids.join(
            prior_hits.unionByName(intra_hits)
            .groupBy("doc_id")
            .agg(F.min("partner").alias("near_dup_of")),
            "doc_id",
            "left",
        )
        .select("doc_id", F.col("near_dup_of"), F.col("near_dup_of").isNotNull().alias("is_near_dup"))
    )
    store.upsert(flags, FLAG_TABLE, ["doc_id"])
    # identity stays (doc_id, band) — replays are keyed no-ops — but the
    # dirs are laid out by the PROBE key so the read side prunes too
    stamped = banded.withColumn(
        "batch_seq", F.lit(int(batch_seq) if batch_seq is not None else -1).cast("long")
    )
    store.upsert(stamped, BUCKET_TABLE, ["doc_id", "band"], layout_keys=["band", "bucket"])


def evict_index_before(store: TableStore, spark, min_batch_seq: int) -> None:
    """Age-based state eviction: drop bucket-index rows whose ``batch_seq``
    predates the horizon (a compaction rewrite, TableStore.compact(keep=)).

    Without eviction the LSH index grows linearly with the crawl — at
    10^12 documents that is the state-size killer for any always-on
    dedup stream. With a horizon of H batches the state is bounded by the
    documents of the last H batches: a new page is then checked against the
    trailing window rather than all history, which is the standard
    freshness/recall trade for crawl dedup (old near-dups re-enter as
    fresh). Eviction only ever FORGETS pairs whose older partner predates
    the horizon — flags already written stay (the flag table is the output,
    the index is probe state); rows at or after the horizon are untouched
    and keep their (band, bucket) layout, so pruned probes keep working.
    Sentinel -1 rows (callers that pass no seq) are evicted by any horizon
    >= 0, matching their no-ordering contract. A horizon past the newest
    batch evicts EVERYTHING: the index table is dropped (an empty
    partitioned dir would be unreadable) and the next batch rebuilds it —
    the stream continues, all history forgotten."""
    store.compact(
        spark, BUCKET_TABLE, keep=F.col("batch_seq") >= F.lit(int(min_batch_seq))
    )


def start_streaming_near_dedup(
    stream: DataFrame,
    store: TableStore,
    *,
    checkpoint_dir: str,
    available_now: bool = False,
    **kwargs,
):
    """Wire the per-batch check into a Structured Streaming sink."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        process_near_dup_batch(batch_df, store, batch_seq=batch_id, **kwargs)

    writer = stream.writeStream.foreachBatch(handle).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
