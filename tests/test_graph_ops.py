"""Tests for graph-navigation operators + P8/F6 kernel parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from sage_spark.kernel.retrieval import (
    convert_iso_timestamps_to_ist,
    format_timestamp_ist,
    is_displayable_trace_entity,
)
from sage_spark.operators.graph import (
    distinct_entity_ids,
    expand_one_hop,
    facts_with_evidence,
    ingestion_summary,
    ist_display,
)

from .test_retrieval_parity import services


def test_displayable_entity_parity():
    cases = [
        "Alice Johnson", "EMP001", "currentuser", "unknown", "sage", "chat-msg-42",
        "d1-chunk-3", "assignment::direct:a:b::send-report", "direct:a:b",
        "message-attachment-9", "12345", "a" * 40, "0" * 64, "", "  ", "réunion",
        "Chat Message 7", "group:g1", "groupX", "Node",
    ]
    for case in cases:
        assert is_displayable_trace_entity(case) == services._is_displayable_trace_entity(case), case


def test_ist_formatting_parity():
    samples = [
        "2026-04-01T10:00:00+00:00",
        "2026-04-01T10:00:00Z",
        "2026-12-31T23:45:10.123+05:30",
        "not a timestamp",
    ]
    for s in samples:
        assert format_timestamp_ist(s) == services._format_timestamp_as_ist(s), s
    text = "due 2026-04-01T10:00:00Z and later 2026-04-02T12:30:00+00:00 maybe"
    assert convert_iso_timestamps_to_ist(text) == services._convert_iso_timestamps_to_ist_text(text)


def test_ist_display_column_matches_kernel(spark):
    df = spark.createDataFrame(
        [("2026-04-01T10:00:00+00:00",), ("2026-12-31T23:45:10+00:00",)], "ts string"
    )
    rows = df.select("ts", ist_display(F.col("ts")).alias("ist")).collect()
    for r in rows:
        assert r["ist"] == format_timestamp_ist(r["ts"])


def test_expand_one_hop(spark):
    edges = spark.createDataFrame(
        [("a", "b", "SENT"), ("c", "a", "RECEIVED_BY"), ("b", "c", "SENT")],
        "src string, dst string, type string",
    )
    seeds = spark.createDataFrame([("a",)], "id string")
    out = {(r["neighbor"], r["direction"]) for r in expand_one_hop(seeds, edges).collect()}
    assert out == {("b", "out"), ("c", "in")}


def test_facts_with_evidence_picks_first_doc(spark):
    facts = spark.createDataFrame([("f1", "k1")], "fact_id string, canonical_key string")
    edges = spark.createDataFrame(
        [("c1", "f1", "SUPPORTS"), ("c2", "f1", "SUPPORTS"), ("c3", "f1", "CONTRADICTS")],
        "claim_id string, fact_id string, relation_type string",
    )
    claims = spark.createDataFrame(
        [("c1", "d2"), ("c2", "d1"), ("c3", "d0")], "claim_id string, doc_id string"
    )
    docs = spark.createDataFrame(
        [("d1", "u1", "t1"), ("d2", "u2", "t2")], "doc_id string, url string, timestamp string"
    )
    out = facts_with_evidence(facts, edges, claims, docs).collect()
    assert len(out) == 1 and out[0]["evidence_doc_id"] == "d1"  # min doc_id among SUPPORTS


def test_ingestion_summary_and_entity_ids(spark):
    runs = spark.createDataFrame(
        [("r1", 0, "s", "completed", "t", 10, 5, 4, 1, None)],
        "run_id string, partition_id int, stage string, status string, processed_at string, "
        "docs_processed long, claims_extracted long, claims_canonicalized long, conflicts_found long, errors_json string",
    )
    s = ingestion_summary(runs).collect()[0]
    assert s["status"] == "completed" and s["docs_processed"] == 10

    claims = spark.createDataFrame([("u1", "u2"), ("u1", None)], "subject_entity_id string, object_entity_id string")
    facts = spark.createDataFrame([("g1", None)], "subject_entity_id string, object_entity_id string")
    ids = [r["entity_id"] for r in distinct_entity_ids(claims, facts).collect()]
    assert ids == ["g1", "u1", "u2"]
