"""Parquet-backed table store with idempotent key-based upsert.

Production target is Iceberg (``MERGE INTO documents USING updates ON
doc_id`` etc. — SURVEY.md §2.1 S8-S15); this container has no Iceberg
runtime jars, so the same contract is provided over plain parquet:
``upsert`` rewrites the table as (existing ANTI-JOIN updates) UNION updates.
All row identities are content hashes (doc_id/claim_id/fact_id), so re-running
any partition of any stage and upserting again is a no-op — that is the
checkpoint/resume story the north rule requires.

Writes go to a temp dir then swap, so a killed job never leaves a
half-written table.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType


class TableStore:
    def __init__(self, root: str | Path) -> None:
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def path(self, table: str) -> Path:
        return self.root / table

    def exists(self, table: str) -> bool:
        return self.path(table).exists()

    def read(self, spark: SparkSession, table: str, schema: StructType | None = None) -> DataFrame:
        if not self.exists(table):
            if schema is None:
                raise FileNotFoundError(f"table {table} does not exist and no schema given")
            return spark.createDataFrame([], schema)
        return spark.read.parquet(str(self.path(table)))

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

    def upsert(self, df: DataFrame, table: str, keys: list[str]) -> None:
        """Iceberg-MERGE-equivalent: updates win over existing rows on key.

        Implemented as existing.join(updates, keys, 'left_anti') UNION
        updates. On Iceberg this is a metadata-level MERGE INTO; here the
        table is rewritten, which is fine at test scale and keeps identical
        call sites.
        """
        spark = df.sparkSession
        if not self.exists(table):
            self.overwrite(df.dropDuplicates(keys), table)
            return
        existing = self.read(spark, table)
        kept = existing.join(df.select(*keys).dropDuplicates(keys), on=keys, how="left_anti")
        merged = kept.unionByName(df.dropDuplicates(keys), allowMissingColumns=True)
        self.overwrite(merged, table)

    def drop(self, table: str) -> None:
        target = self.path(table)
        if target.exists():
            shutil.rmtree(target)


def dedupe_latest(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """Keep the newest row per key (window row_number == 1)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(F.col(order_col).desc())
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
