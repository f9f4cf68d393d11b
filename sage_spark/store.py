"""Parquet-backed table store with idempotent key-based upsert.

Production target is Iceberg (``MERGE INTO documents USING updates ON
doc_id`` etc. — SURVEY.md §2.1 S8-S15); this container has no Iceberg
runtime jars, so the same contract is provided over plain parquet.
All row identities are content hashes (doc_id/claim_id/fact_id), so re-running
any partition of any stage and upserting again is a no-op — that is the
checkpoint/resume story the north rule requires.

Two layouts:

* legacy (``buckets=None``): ``upsert`` rewrites the whole table as
  (existing ANTI-JOIN updates) UNION updates — simple, O(store) per batch.
* hash-bucketed (``buckets=N``): rows live in ``__bucket=K/`` partition dirs
  keyed by xxhash64 of the upsert key. An upsert reads ONLY the buckets its
  updates hash into (partition pruning on the scan) and rewrites ONLY those
  bucket dirs (dynamic partition overwrite) — per-batch cost scales with the
  batch's touched buckets, not the store, which is the parquet analog of an
  Iceberg MERGE at 10^12-row store scale. Iceberg additionally gives atomic
  snapshot commits; dynamic overwrite swaps each touched bucket dir
  non-atomically, an accepted stand-in here.

Full-table writes go to a temp dir then swap, so a killed job never leaves a
half-written table.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType

BUCKET_COL = "__bucket"


class TableStore:
    def __init__(self, root: str | Path, *, buckets: int | None = None) -> None:
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self.buckets = buckets

    def path(self, table: str) -> Path:
        return self.root / table

    def exists(self, table: str) -> bool:
        return self.path(table).exists()

    def read(self, spark: SparkSession, table: str, schema: StructType | None = None) -> DataFrame:
        if not self.exists(table):
            if schema is None:
                raise FileNotFoundError(f"table {table} does not exist and no schema given")
            return spark.createDataFrame([], schema)
        df = spark.read.parquet(str(self.path(table)))
        # bucketed tables surface the partition dir as a column; the layout
        # is an implementation detail, not part of the table contract
        return df.drop(BUCKET_COL) if BUCKET_COL in df.columns else df

    def overwrite(self, df: DataFrame, table: str) -> None:
        target = self.path(table)
        tmp = target.with_name(target.name + ".__tmp__")
        if tmp.exists():
            shutil.rmtree(tmp)
        df.write.mode("overwrite").parquet(str(tmp))
        if target.exists():
            shutil.rmtree(target)
        tmp.rename(target)

    def append(self, df: DataFrame, table: str) -> None:
        df.write.mode("append").parquet(str(self.path(table)))

    def _bucket_expr(self, keys: list[str]) -> Column:
        key = F.concat_ws("\x1f", *[F.col(k).cast("string") for k in keys])
        return F.pmod(F.xxhash64(key), F.lit(self.buckets)).cast("int")

    def upsert(
        self, df: DataFrame, table: str, keys: list[str], *, layout_keys: list[str] | None = None
    ) -> None:
        """Iceberg-MERGE-equivalent: updates win over existing rows on key.

        Legacy layout rewrites the whole table. Bucketed layout reads and
        rewrites only the bucket dirs the updates hash into: the scan prunes
        untouched ``__bucket=K/`` partitions and the write uses dynamic
        partition overwrite, so per-batch IO is O(touched buckets).

        ``layout_keys`` decouples the partition-dir hash from the upsert
        identity: lay the table out by the columns the READ side probes on
        (e.g. an LSH index keyed (doc_id, band) but probed by (band, bucket))
        so point reads prune too, not just writes. Requires content-immutable
        rows — a key's layout-column values must never change across upserts,
        which holds for this store's hash-identity tables; otherwise a stale
        row could survive in a dir the new version's hash no longer touches.
        """
        spark = df.sparkSession
        if self.buckets is None:
            if not self.exists(table):
                self.overwrite(df.dropDuplicates(keys), table)
                return
            existing = self.read(spark, table)
            kept = existing.join(df.select(*keys).dropDuplicates(keys), on=keys, how="left_anti")
            merged = kept.unionByName(df.dropDuplicates(keys), allowMissingColumns=True)
            self.overwrite(merged, table)
            return

        updates = df.dropDuplicates(keys).withColumn(
            BUCKET_COL, self._bucket_expr(layout_keys or keys)
        )
        # pin the lineage before it is consumed by two separate actions (the
        # touched-bucket collect and the overwrite): a nondeterministic
        # upstream must not emit rows into a bucket absent from `touched`,
        # or dynamic overwrite would drop that bucket's pre-existing rows
        updates = updates.localCheckpoint(eager=True)
        target = self.path(table)
        if not target.exists():
            tmp = target.with_name(target.name + ".__tmp__")
            if tmp.exists():
                shutil.rmtree(tmp)
            updates.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(str(tmp))
            tmp.rename(target)
            return
        # the touched-bucket list is a bounded scalar set (<= self.buckets),
        # never data-sized
        touched = sorted(r[0] for r in updates.select(BUCKET_COL).distinct().collect())
        existing = (
            spark.read.parquet(str(target)).filter(F.col(BUCKET_COL).isin(touched))
        )
        kept = existing.join(updates.select(*keys).dropDuplicates(keys), on=keys, how="left_anti")
        merged = kept.unionByName(updates, allowMissingColumns=True)
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(BUCKET_COL)
            .parquet(str(target))
        )

    def read_pruned(
        self,
        spark: SparkSession,
        table: str,
        layout_values: DataFrame,
        schema: StructType | None = None,
        *,
        layout_keys: list[str] | None = None,
    ) -> DataFrame:
        """Read only the bucket dirs the given layout-key rows hash into.

        ``layout_values`` holds the probe side's layout columns (e.g. the
        batch's (band, bucket) pairs); the touched bucket-id set is bounded
        by ``self.buckets`` — a scalar list, never data-sized — and the scan
        prunes to those ``__bucket=K/`` dirs, the read-side twin of the
        upsert's touched-bucket pruning. Falls back to a full read for
        legacy (unbucketed) layouts.
        """
        if self.buckets is None or not self.exists(table):
            return self.read(spark, table, schema)
        keys = layout_keys or layout_values.columns
        touched = sorted(
            r[0]
            for r in layout_values.select(self._bucket_expr(keys).alias(BUCKET_COL))
            .distinct()
            .collect()
        )
        df = spark.read.parquet(str(self.path(table))).filter(F.col(BUCKET_COL).isin(touched))
        return df.drop(BUCKET_COL) if BUCKET_COL in df.columns else df

    def compact(self, spark: SparkSession, table: str) -> None:
        """Maintenance rewrite (Iceberg's rewrite_data_files analog): every
        keyed upsert appends one file-set into each touched bucket dir, so a
        long-running ingest accumulates many small files per dir and scan
        cost creeps up. Compaction rewrites the table so each bucket dir
        holds one file (rows and bucket assignment unchanged), via a temp
        dir + atomic rename so a killed compaction never corrupts the table.
        Unbucketed tables collapse to a single file."""
        target = self.path(table)
        if not target.exists():
            return
        df = spark.read.parquet(str(target))
        tmp = target.with_name(target.name + ".__compact__")
        if tmp.exists():
            shutil.rmtree(tmp)
        if self.buckets is not None and BUCKET_COL in df.columns:
            # hash-repartition ON the bucket value: each task owns whole
            # buckets, so every dir is written by exactly one task -> one file
            (
                df.repartition(self.buckets, F.col(BUCKET_COL))
                .write.mode("overwrite")
                .partitionBy(BUCKET_COL)
                .parquet(str(tmp))
            )
        else:
            df.coalesce(1).write.mode("overwrite").parquet(str(tmp))
        shutil.rmtree(target)
        tmp.rename(target)

    def drop(self, table: str) -> None:
        target = self.path(table)
        if target.exists():
            shutil.rmtree(target)


def dedupe_latest(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """Keep the newest row per key (window row_number == 1)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(F.col(order_col).desc())
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
