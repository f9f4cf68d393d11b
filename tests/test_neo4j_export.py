"""Neo4j bulk-import CSV export sink (sinks/neo4j_csv.py): header roles,
RFC4180 quoting roundtrip, referential integrity, Entity synthesis."""

from __future__ import annotations

from pathlib import Path

import pytest

from pyspark.sql import functions as F

from sage_spark.sinks.neo4j_csv import export_neo4j_admin_csv
from sage_spark.store import TableStore

TRICKY = 'He said "hi, there"\nand left; twice'


@pytest.fixture()
def kg_store(spark, tmp_path):
    store = TableStore(tmp_path / "store")
    docs = spark.createDataFrame(
        [
            ("d1", "u://1", "EMP001", ["EMP002", "EMP003"], "subj", "body", TRICKY, "2026-01-01T00:00:00+00:00", "email", "direct", "c1", None, "en"),
            ("d2", "u://2", "EMP002", ["EMP001"], "s2", "b2", "plain", "2026-01-02T00:00:00+00:00", "chat", "direct", "c2", None, "en"),
        ],
        "doc_id string, url string, sender string, receivers array<string>, subject string, "
        "content string, summary string, timestamp string, source string, conversation_type string, "
        "conversation_id string, group_id string, lang string",
    )
    store.upsert(docs, "documents", ["doc_id"])
    chunks = spark.createDataFrame(
        [("ch1", "d1", 0, "text", "sum", [0.5, 0.25]), ("ch2", "d2", 0, "t2", "s2", [1.0, 0.0])],
        "chunk_id string, doc_id string, seq int, content string, summary string, embedding array<float>",
    )
    store.upsert(chunks, "chunks", ["chunk_id"])
    claims = spark.createDataFrame(
        [("cl1", "d1", "REPORTING_LINE", "reports_to", "alice", "bob", "v", "k1")],
        "claim_id string, doc_id string, claim_type string, predicate string, "
        "subject_key string, object_key string, value_text string, canonical_key string",
    )
    store.upsert(claims, "claims", ["claim_id"])
    facts = spark.createDataFrame(
        [("f1", "k1", "REPORTING_LINE", "reports_to", "alice", "bob", "v", "current")],
        "fact_id string, canonical_key string, claim_type string, predicate string, "
        "subject_key string, object_key string, value_text string, status string",
    )
    store.upsert(facts, "facts", ["fact_id"])
    edges = spark.createDataFrame(
        [("EMP001", "d1", "SENT"), ("d1", "EMP002", "RECEIVED_BY"), ("d1", "cl1", "HAS_CLAIM"), ("alice", "f1", "HAS_FACT")],
        "src string, dst string, type string",
    )
    store.upsert(edges, "edges", ["src", "dst", "type"])
    cfe = spark.createDataFrame(
        [("cl1", "f1", "SUPPORTS")], "claim_id string, fact_id string, relation_type string"
    )
    store.upsert(cfe, "claim_fact_edges", ["claim_id", "fact_id", "relation_type"])
    return store


def _read_nodes(spark, out: Path, label: str):
    header = (out / "headers" / f"{label}.csv").read_text().strip().split(",")
    names = [h.split(":")[0] or ("_label" if h == ":LABEL" else h) for h in header]
    df = (
        spark.read.option("quote", '"')
        .option("escape", '"')
        .option("multiLine", True)
        .csv(str(out / "nodes" / label))
    )
    return df.toDF(*names), header


def test_export_layout_headers_and_counts(spark, kg_store, tmp_path):
    out = tmp_path / "neo4j"
    counts = export_neo4j_admin_csv(spark, kg_store, str(out))
    assert counts["nodes:Document"] == 2
    assert counts["nodes:Chunk"] == 2
    assert counts["nodes:Claim"] == 1
    assert counts["nodes:CanonicalFact"] == 1
    assert counts["rels:edges"] == 4
    assert counts["rels:claim_fact"] == 1
    assert counts["rels:part_of"] == 2
    hdr = (out / "headers" / "Document.csv").read_text().strip()
    assert hdr.startswith("doc_id:ID,")
    assert "receivers:string[]" in hdr
    assert hdr.endswith(":LABEL")
    assert (out / "headers" / "relationships.csv").read_text().strip() == ":START_ID,:END_ID,:TYPE"
    assert (out / "headers" / "Chunk.csv").read_text().strip() == "chunk_id:ID,doc_id,seq:int,summary,:LABEL"
    sh = (out / "import.sh").read_text()
    for label in ["Document", "Chunk", "Claim", "CanonicalFact", "Entity"]:
        assert f"headers/{label}.csv" in sh
    assert "--multiline-fields=true" in sh


def test_export_quoting_roundtrip_and_arrays(spark, kg_store, tmp_path):
    out = tmp_path / "neo4j"
    export_neo4j_admin_csv(spark, kg_store, str(out))
    docs, _ = _read_nodes(spark, out, "Document")
    row = {r["doc_id"]: r for r in docs.collect()}
    assert row["d1"]["summary"] == TRICKY  # embedded quotes, comma, newline survive
    assert row["d1"]["receivers"] == "EMP002;EMP003"  # ;-joined array
    assert row["d1"]["_label"] == "Document"


def test_export_referential_integrity_and_entities(spark, kg_store, tmp_path):
    out = tmp_path / "neo4j"
    export_neo4j_admin_csv(spark, kg_store, str(out))
    ids = set()
    for label in ["Document", "Chunk", "Claim", "CanonicalFact", "Entity"]:
        df, _ = _read_nodes(spark, out, label)
        ids.update(r[0] for r in df.select(df.columns[0]).collect())
    assert len(ids) == len(set(ids))
    for rel in ["edges", "claim_fact", "part_of"]:
        rdf = (
            spark.read.option("quote", '"').option("escape", '"').option("multiLine", True)
            .csv(str(out / "rels" / rel))
            .toDF("src", "dst", "type")
        )
        for r in rdf.collect():
            assert r["src"] in ids and r["dst"] in ids, (rel, r)
    ents, _ = _read_nodes(spark, out, "Entity")
    ent_ids = {r["id"] for r in ents.collect()}
    # person ids and mention keys that have no store node row
    assert {"EMP001", "EMP002", "alice"} <= ent_ids
    assert "d1" not in ent_ids and "f1" not in ent_ids


def test_export_embeddings_opt_in(spark, kg_store, tmp_path):
    out = tmp_path / "neo4j_emb"
    export_neo4j_admin_csv(spark, kg_store, str(out), include_embeddings=True)
    hdr = (out / "headers" / "Chunk.csv").read_text().strip()
    assert hdr == "chunk_id:ID,doc_id,seq:int,summary,embedding:float[],:LABEL"
    chunks, _ = _read_nodes(spark, out, "Chunk")
    vals = {r["chunk_id"]: r["embedding"] for r in chunks.collect()}
    assert vals["ch1"] == "0.5;0.25"
