"""Catalog sink: materialize KG store tables as catalog (Iceberg) tables.

The north rule's output shape is "materializing node and edge Iceberg
tables in place of Neo4j writes" (the reference pushes every node/edge
through a per-row Neo4j MERGE session — app/saia.py — which caps
throughput at driver round-trip speed). This engine's durable layout is
the resumable, hash-bucketed :class:`~sage_spark.store.TableStore`;
``publish_store_tables`` is the last-mile step that surfaces those tables
to downstream catalog consumers with one distributed ``saveAsTable`` per
table.

Format is engine-agnostic DataFrame code: on a cluster with an Iceberg
catalog configured (``spark.sql.catalog.* = org.apache.iceberg...`` +
the iceberg-spark-runtime jar), ``fmt="iceberg"`` writes true Iceberg
tables through the same call; this container carries no Iceberg jar, so
the default ``fmt="parquet"`` materializes session-catalog tables with
identical schema/contents — the tested path. The internal ``__bucket``
layout column never leaks (``TableStore.read`` drops it), so published
schemas are exactly the logical table contract.
"""

from __future__ import annotations

import re
import shutil
from pathlib import Path
from urllib.parse import urlparse

from pyspark.sql import SparkSession

from ..store import TableStore

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _check_ident(name: str, what: str) -> str:
    if not _IDENT.match(name):
        raise ValueError(f"{what} {name!r} is not a plain SQL identifier")
    return name


def publish_store_tables(
    spark: SparkSession,
    store: TableStore,
    namespace: str,
    *,
    fmt: str = "parquet",
    tables: list[str] | None = None,
) -> dict[str, int]:
    """Materialize ``tables`` (default: every table in the store) as
    ``namespace.<table>`` catalog tables; returns {table: row_count}.

    Each publish is a full-table ``mode("overwrite")`` saveAsTable — an
    idempotent snapshot of the store's current state, so re-running after
    an incremental upsert refreshes the catalog copy. At 100 TB the store
    itself stays the system of record (bucketed upserts rewrite only
    touched dirs); publish only the serving tables a catalog consumer
    needs — typically the node/edge/fact tables, not raw chunks.
    """
    _check_ident(namespace, "namespace")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {namespace}")
    published: dict[str, int] = {}
    for t in tables if tables is not None else store.list_tables():
        _check_ident(t, "table name")
        _clear_orphaned_location(spark, namespace, t, fmt)
        df = store.read(spark, t)
        df.write.format(fmt).mode("overwrite").saveAsTable(f"{namespace}.{t}")
        published[t] = spark.table(f"{namespace}.{t}").count()
    return published


def _clear_orphaned_location(spark: SparkSession, namespace: str, table: str, fmt: str) -> None:
    """The in-memory session catalog forgets tables between processes while
    their managed warehouse dirs persist, so a fresh job's CREATE fails with
    LOCATION_ALREADY_EXISTS on re-publish. When the catalog does NOT know
    the table but its default managed location exists, the dir is an orphan
    of an earlier publish — remove it. A persistent metastore / Iceberg
    catalog never reaches this branch (tableExists is True and
    ``mode("overwrite")`` replaces the table atomically)."""
    if fmt == "iceberg" or spark.catalog.tableExists(f"{namespace}.{table}"):
        return
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path
    if not warehouse:
        return
    orphan = Path(warehouse) / f"{namespace}.db" / table
    if orphan.exists():
        shutil.rmtree(orphan)
