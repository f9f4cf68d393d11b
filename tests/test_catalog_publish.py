"""Catalog publish sink: KG store tables -> catalog tables.

The north rule's output shape is node/edge tables materialized as catalog
(Iceberg) tables in place of the reference's per-row Neo4j MERGE sessions
(app/saia.py). No Iceberg runtime jar ships in this container, so the
session catalog's parquet provider exercises the same
``write.format(fmt).saveAsTable`` path the Iceberg catalog would.
"""

from __future__ import annotations

import pytest

from sage_spark.datagen import build_groups, synth_webtext
from sage_spark.pipeline import run_pipeline
from sage_spark.sinks.catalog import publish_store_tables
from sage_spark.store import TableStore

RUN_TS = "2026-05-01T00:00:00+00:00"


def _build_store(spark, root, n_docs, *, run_id="p1"):
    store = TableStore(root, buckets=4)
    webtext, persons_df = synth_webtext(spark, n_docs, n_persons=10, seed=3, partitions=4)
    persons = [r.asDict() for r in persons_df.collect()]
    run_pipeline(spark, webtext, persons, build_groups(), store, run_id=run_id, run_ts=RUN_TS)
    return store


def test_publish_roundtrip_all_tables(spark, tmp_path):
    store = _build_store(spark, tmp_path / "kg", 60)
    spark.sql("DROP DATABASE IF EXISTS kgpub CASCADE")
    published = publish_store_tables(spark, store, "kgpub")

    assert set(published) == set(store.list_tables()) and published
    for t, n in published.items():
        src = store.read(spark, t)
        cat = spark.table(f"kgpub.{t}")
        # the __bucket layout dir is an implementation detail and must not
        # leak into the published schema
        assert "__bucket" not in cat.columns
        assert set(cat.columns) == set(src.columns)
        assert cat.count() == src.count() == n

    src_edges = {tuple(r) for r in store.read(spark, "edges").collect()}
    cat_edges = {tuple(r) for r in spark.table("kgpub.edges").collect()}
    assert src_edges == cat_edges


def test_publish_is_refreshable_snapshot(spark, tmp_path):
    """Re-publishing after an incremental batch overwrites the catalog copy
    with the store's new state (idempotent snapshot semantics)."""
    store = _build_store(spark, tmp_path / "kg", 40)
    spark.sql("DROP DATABASE IF EXISTS kgpub2 CASCADE")
    first = publish_store_tables(spark, store, "kgpub2", tables=["documents", "edges"])

    webtext, persons_df = synth_webtext(spark, 80, n_persons=10, seed=3, partitions=4)
    persons = [r.asDict() for r in persons_df.collect()]
    run_pipeline(spark, webtext, persons, build_groups(), store, run_id="p2", run_ts=RUN_TS)

    second = publish_store_tables(spark, store, "kgpub2", tables=["documents", "edges"])
    assert second["documents"] == store.read(spark, "documents").count() > first["documents"]
    assert spark.table("kgpub2.documents").count() == second["documents"]
    # republish of the same state is a no-op on contents
    third = publish_store_tables(spark, store, "kgpub2", tables=["documents", "edges"])
    assert third == second


def test_publish_survives_orphaned_warehouse_dir(spark, tmp_path):
    """A fresh process gets a fresh in-memory catalog while the managed
    warehouse dirs persist; re-publish must clear the orphan instead of
    dying with LOCATION_ALREADY_EXISTS (seen on the run_kg.py CLI's second
    invocation)."""
    import shutil
    from pathlib import Path
    from urllib.parse import urlparse

    store = _build_store(spark, tmp_path / "kg", 20)
    spark.sql("DROP DATABASE IF EXISTS kgpub4 CASCADE")
    publish_store_tables(spark, store, "kgpub4", tables=["edges"])

    warehouse = Path(urlparse(spark.conf.get("spark.sql.warehouse.dir")).path)
    loc = warehouse / "kgpub4.db" / "edges"
    aside = tmp_path / "edges_dir"
    shutil.copytree(loc, aside)
    spark.sql("DROP TABLE kgpub4.edges")  # removes the managed dir too
    shutil.copytree(aside, loc)  # ...now restore it: catalog-less orphan

    published = publish_store_tables(spark, store, "kgpub4", tables=["edges"])
    assert published["edges"] == store.read(spark, "edges").count()


def test_publish_rejects_unsafe_identifiers(spark, tmp_path):
    store = _build_store(spark, tmp_path / "kg", 20)
    with pytest.raises(ValueError):
        publish_store_tables(spark, store, "bad-ns;drop")
    with pytest.raises(ValueError):
        publish_store_tables(spark, store, "kgpub3", tables=["edges; --"])


def test_list_tables_skips_staging_dirs(spark, tmp_path):
    store = _build_store(spark, tmp_path / "kg", 20)
    (store.root / "facts.__tmp__").mkdir()
    (store.root / "edges.__compact__").mkdir()
    names = store.list_tables()
    assert "facts" in names and "edges" in names
    assert all(".__" not in n for n in names)
