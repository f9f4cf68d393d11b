"""Smoke + semantics tests for the distributed retrieval operator."""

from __future__ import annotations

from datetime import datetime, timezone

from sage_spark.kernel.embed import hash_embedding
from sage_spark.operators.retrieval import retrieve

NOW = datetime(2026, 5, 1, tzinfo=timezone.utc)


def _fixture(spark):
    def vec(text):
        return [float(v) for v in hash_embedding(text)]

    chunks = spark.createDataFrame(
        [
            ("d1-chunk-0", "d1", 0, "Bob reports to Alice in the new org", "Bob reports to Alice in the new org", vec("who reports to alice")),
            ("d2-chunk-0", "d2", 0, "lunch menu discussion", "lunch menu discussion", vec("unrelated")),
        ],
        "chunk_id string, doc_id string, seq int, content string, summary string, embedding array<double>",
    )
    documents = spark.createDataFrame(
        [
            ("d1", "Org update", "EMP001", "2026-04-28T10:00:00+00:00"),
            ("d2", "Lunch", "EMP003", "2026-01-01T10:00:00+00:00"),
        ],
        "doc_id string, subject string, sender string, timestamp string",
    )
    facts = spark.createDataFrame(
        [
            (
                "f1", "assignment::direct:EMP001:EMP002::send-report", "TASK_ASSIGNMENT", "current",
                "EMP002", "EMP002", "EMP001", "EMP001",
                "EMP002 will send report to EMP001", "2026-04-30T09:00:00+00:00", "2026-04-30T09:00:00+00:00",
                vec("send report commitment"),
            ),
            (
                "f2", "status::server::general", "STATUS_UPDATE", "current",
                "server", None, None, None,
                "server is down", "2026-04-29T09:00:00+00:00", "2026-04-29T09:00:00+00:00",
                vec("server status"),
            ),
        ],
        "fact_id string, canonical_key string, claim_type string, status string, "
        "subject_key string, subject_entity_id string, object_key string, object_entity_id string, "
        "summary string, first_seen_at string, last_seen_at string, embedding array<double>",
    )
    return chunks, documents, facts


def test_retrieve_returns_topk_with_scores(spark):
    chunks, documents, facts = _fixture(spark)
    out = retrieve(chunks, documents, facts, "who reports to alice", now=NOW, k=5).collect()
    assert 0 < len(out) <= 5
    ids = [r["identifier"] for r in out]
    assert len(ids) == len(set(ids))
    scores = [r["rank_score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    # the reports-to boost puts the org chunk on top
    assert out[0]["identifier"] == "d1-chunk-0"


def test_retrieve_task_lookup_prioritizes_personal_fact(spark):
    chunks, documents, facts = _fixture(spark)
    out = retrieve(
        chunks, documents, facts, "What did I promise to send?", user_id="EMP002", now=NOW, k=5
    ).collect()
    assert out[0]["identifier"] == "f1"
    assert out[0]["kind"] == "fact"
