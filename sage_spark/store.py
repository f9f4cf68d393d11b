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

import json
import shutil
from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType

BUCKET_COL = "__bucket"
LAYOUT_FILE = "_LAYOUT.json"


class TableStore:
    def __init__(self, root: str | Path, *, buckets: int | None = None) -> None:
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self.buckets = buckets

    def path(self, table: str) -> Path:
        return self.root / table

    def exists(self, table: str) -> bool:
        self._recover(table)
        return self.path(table).exists()

    def list_tables(self) -> list[str]:
        """Published table names: every table dir in the store root, with
        swap/compaction staging dirs (``name.__tmp__`` etc.) and hidden
        working dirs (``_staging`` and friends — the parquet hidden-path
        convention) excluded."""
        return sorted(
            p.name
            for p in self.root.iterdir()
            if p.is_dir() and ".__" not in p.name and not p.name.startswith(("_", "."))
        )

    # -- crash recovery ----------------------------------------------------
    def _recover(self, table: str) -> None:
        """Heal the two-step swap windows (overwrite/compact rename the old
        table aside before publishing the new one). If a crash left the
        table path absent, restore it from, in order of preference:

        * ``.__old__`` — the pre-swap table, always complete by construction;
        * a COMPLETE staged dir (``.__tmp__``/``.__compact__`` carrying
          Spark's ``_SUCCESS`` marker) — the post-swap content.

        Without this, a killed compaction made ``read`` silently return an
        empty table and a later upsert recreated it fresh — permanent data
        loss with no error (round-4 advice, store.py compact window)."""
        target = self.path(table)
        if target.exists():
            return
        aside = target.with_name(target.name + ".__old__")
        if aside.exists():
            aside.rename(target)
            return
        for suffix in (".__compact__", ".__tmp__"):
            staged = target.with_name(target.name + suffix)
            if staged.exists() and (staged / "_SUCCESS").exists():
                staged.rename(target)
                return

    def _swap_in(self, tmp: Path, target: Path) -> None:
        """Publish ``tmp`` as ``target`` without a window where the table
        path is absent-and-unrecoverable: rename the old table aside, then
        the new one into place, then drop the aside. A crash at any point
        leaves either the target or a recoverable aside/staged dir for
        ``_recover``."""
        aside = target.with_name(target.name + ".__old__")
        if aside.exists():  # stale from an earlier crash; target exists, so it lost
            shutil.rmtree(aside)
        if target.exists():
            target.rename(aside)
        tmp.rename(target)
        if aside.exists():
            shutil.rmtree(aside)

    # -- layout metadata ---------------------------------------------------
    def _write_layout(self, target: Path, layout_keys: list[str]) -> None:
        (target / LAYOUT_FILE).write_text(
            json.dumps({"version": 1, "buckets": self.buckets, "layout_keys": layout_keys})
        )

    def _read_layout(self, table: str) -> dict | None:
        p = self.path(table) / LAYOUT_FILE
        if not p.exists():
            return None
        return json.loads(p.read_text())

    def _check_layout(self, table: str, layout_keys: list[str]) -> None:
        """Bucketed dirs are only prunable if reader and writer agree on the
        hash inputs; a silent mismatch (e.g. a pre-``batch_seq`` index laid
        out by (doc_id, band) probed by (band, bucket)) reads the WRONG dirs
        and misses rows with no error. Fail loudly instead."""
        rec = self._read_layout(table)
        if rec is None:
            raise ValueError(
                f"bucketed table {table!r} has no {LAYOUT_FILE}: it predates layout "
                "versioning (or was written externally); rebuild it or record its "
                "layout with adopt_layout() before upserting/probing"
            )
        if rec["buckets"] != self.buckets or rec["layout_keys"] != layout_keys:
            raise ValueError(
                f"bucketed table {table!r} layout mismatch: stored "
                f"(buckets={rec['buckets']}, keys={rec['layout_keys']}) vs requested "
                f"(buckets={self.buckets}, keys={layout_keys}); pruned reads against "
                "a differently-hashed layout would silently miss rows"
            )

    def adopt_layout(self, table: str, layout_keys: list[str]) -> None:
        """Explicit migration for tables written before layout versioning:
        records the layout the caller asserts the dirs were hashed by."""
        self._write_layout(self.path(table), layout_keys)

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
        self._recover(table)
        target = self.path(table)
        tmp = target.with_name(target.name + ".__tmp__")
        if tmp.exists():
            shutil.rmtree(tmp)
        df.write.mode("overwrite").parquet(str(tmp))
        self._swap_in(tmp, target)

    def append(self, df: DataFrame, table: str) -> None:
        # recover first: appending while the table path is absent after a
        # crashed swap would recreate it fresh and orphan the complete
        # .__old__ copy (silently rmtree'd by the next swap) — the same
        # loss window _recover closes for read/overwrite/upsert/compact
        self._recover(table)
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
        self._recover(table)
        target = self.path(table)
        if not target.exists():
            if updates.isEmpty():
                # creating a table from zero rows would write a partitioned
                # dir with no parquet files (unreadable) — an empty batch
                # against an absent table is a no-op instead
                return
            tmp = target.with_name(target.name + ".__tmp__")
            if tmp.exists():
                shutil.rmtree(tmp)
            updates.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(str(tmp))
            # layout rides inside tmp BEFORE the publish rename: a crash
            # after the rename (or a _recover that adopts this staged dir)
            # must never yield a bucketed table without its layout record
            self._write_layout(tmp, layout_keys or keys)
            tmp.rename(target)
            return
        self._check_layout(table, layout_keys or keys)
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
        legacy (unbucketed) layouts, and REFUSES to prune a bucketed table
        whose recorded layout differs from the probe's (a mismatched hash
        would silently read the wrong dirs and miss rows). When ``schema``
        is given the result is reconciled to it — missing columns (a table
        written before a schema evolution, e.g. pre-``batch_seq`` index
        rows) surface as typed nulls instead of an AnalysisException.
        """
        if self.buckets is None or not self.exists(table):
            return _reconcile(self.read(spark, table, schema), schema)
        keys = layout_keys or layout_values.columns
        self._check_layout(table, keys)
        touched = sorted(
            r[0]
            for r in layout_values.select(self._bucket_expr(keys).alias(BUCKET_COL))
            .distinct()
            .collect()
        )
        df = spark.read.parquet(str(self.path(table))).filter(F.col(BUCKET_COL).isin(touched))
        df = df.drop(BUCKET_COL) if BUCKET_COL in df.columns else df
        return _reconcile(df, schema)

    def compact(self, spark: SparkSession, table: str, *, keep: Column | None = None) -> None:
        """Maintenance rewrite (Iceberg's rewrite_data_files analog): every
        keyed upsert appends one file-set into each touched bucket dir, so a
        long-running ingest accumulates many small files per dir and scan
        cost creeps up. Compaction rewrites the table so each bucket dir
        holds one file (rows and bucket assignment unchanged), via a temp
        dir + rename-aside swap so a killed compaction never corrupts the
        table: the old table is renamed aside before the new one lands and
        ``_recover`` restores whichever complete copy survives a crash.
        Unbucketed tables collapse to a single file.

        ``keep`` optionally filters rows during the rewrite (rows where the
        predicate is false are dropped) — the eviction/TTL primitive for
        unbounded state tables (e.g. the streaming LSH index, keyed by
        ``batch_seq``); layout and bucket assignment of surviving rows are
        unchanged, so pruned reads keep working."""
        self._recover(table)
        target = self.path(table)
        if not target.exists():
            return
        df = spark.read.parquet(str(target))
        if keep is not None:
            df = df.filter(keep)
        partitioned = self.buckets is not None and BUCKET_COL in df.columns
        if partitioned and df.isEmpty():
            # a partitionBy write of zero rows leaves a dir with no parquet
            # files — unreadable (UNABLE_TO_INFER_SCHEMA) and it wedges
            # every later read/upsert. Zero survivors (e.g. a TTL horizon
            # past the newest batch) instead drops the table: schema'd
            # reads (read/read_pruned with schema) treat absent as
            # typed-empty and the next upsert recreates it with a fresh
            # layout record. A crash mid-delete can only leave extra rows
            # that were due for eviction anyway (re-dropped by the next
            # compact) or a layout-less remnant that fails loudly — never
            # silent loss.
            shutil.rmtree(target)
            return
        tmp = target.with_name(target.name + ".__compact__")
        if tmp.exists():
            shutil.rmtree(tmp)
        layout = self._read_layout(table)
        if partitioned:
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
        if layout is not None:  # layout record rides along through the rewrite
            (tmp / LAYOUT_FILE).write_text(json.dumps(layout))
        self._swap_in(tmp, target)

    def drop(self, table: str) -> None:
        target = self.path(table)
        for p in (
            target,
            target.with_name(target.name + ".__old__"),
            target.with_name(target.name + ".__tmp__"),
            target.with_name(target.name + ".__compact__"),
        ):
            if p.exists():
                shutil.rmtree(p)


def _reconcile(df: DataFrame, schema: StructType | None) -> DataFrame:
    """Project ``df`` onto ``schema``: missing columns become typed nulls,
    extra columns are dropped. No-op when no schema is requested."""
    if schema is None:
        return df
    cols = [
        F.col(f.name).cast(f.dataType) if f.name in df.columns else F.lit(None).cast(f.dataType).alias(f.name)
        for f in schema.fields
    ]
    return df.select(cols)


def dedupe_latest(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """Keep the newest row per key (window row_number == 1)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(F.col(order_col).desc())
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
