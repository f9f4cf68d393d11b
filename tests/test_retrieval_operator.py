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


def test_retrieve_person_scope_surfaces_chunk_outside_global_topk(spark):
    """J2/R2 regression: the person-scoped pass is a SEPARATE top-k over the
    user's documents (reference PERSON_GRAPH_VECTOR_QUERY), so a chunk whose
    global similarity rank is below topk_per_source must still be returned
    when it is the best match among the user's own documents."""

    def vec(text):
        return [float(v) for v in hash_embedding(text)]

    query = "what did I say about the budget"
    qvec = vec(query)

    def noisy(i):
        # deterministic decoys that outrank the user's chunk globally
        return [v + 0.0001 * i for v in qvec]

    rows = [(f"g{i}-chunk-0", f"g{i}", 0, f"global decoy {i}", f"global decoy {i}", noisy(i)) for i in range(3)]
    rows.append(("mine-chunk-0", "mine", 0, "budget notes", "budget notes", vec("budget notes")))
    chunks = spark.createDataFrame(
        rows, "chunk_id string, doc_id string, seq int, content string, summary string, embedding array<double>"
    )
    documents = spark.createDataFrame(
        [(f"g{i}", "s", "EMP009", "2026-04-01T00:00:00+00:00") for i in range(3)]
        + [("mine", "Budget", "EMP002", "2026-04-01T00:00:00+00:00")],
        "doc_id string, subject string, sender string, timestamp string",
    )
    facts = spark.createDataFrame(
        [], "fact_id string, canonical_key string, claim_type string, status string, "
        "subject_key string, subject_entity_id string, object_key string, object_entity_id string, "
        "summary string, first_seen_at string, last_seen_at string, embedding array<double>",
    )
    edges = spark.createDataFrame(
        [("EMP002", "mine", "SENT")], "src string, dst string, type string"
    )

    # sanity: globally, the user's chunk is NOT in the top-3
    global_out = retrieve(chunks, documents, facts, query, now=NOW, k=10).collect()
    assert "mine-chunk-0" not in [r["identifier"] for r in global_out]

    scoped = retrieve(
        chunks, documents, facts, query, user_id="EMP002", edges=edges, now=NOW, k=10
    ).collect()
    assert "mine-chunk-0" in [r["identifier"] for r in scoped]


def test_retrieve_task_lookup_prioritizes_personal_fact(spark):
    chunks, documents, facts = _fixture(spark)
    out = retrieve(
        chunks, documents, facts, "What did I promise to send?", user_id="EMP002", now=NOW, k=5
    ).collect()
    assert out[0]["identifier"] == "f1"
    assert out[0]["kind"] == "fact"


def test_trace_evidence_global_scope_paths_and_matched_entities(spark):
    """Non-scoped trace: chunk paths are Document(id) <-PART_OF- Chunk(id)
    with hop 1, fact rows get the CANONICAL_FACT relationship, and matched
    entities pass the displayable filter (machine keys and numeric ids
    dropped, reference services.py:758-780)."""
    from sage_spark.operators.retrieval import trace_evidence, trace_summary

    chunks, documents, facts = _fixture(spark)
    ev = trace_evidence(chunks, documents, facts, "who reports to alice", now=NOW, k=5).collect()
    assert [r["rank"] for r in ev] == list(range(1, len(ev) + 1))
    scores = [r["rank_score"] for r in ev]
    assert scores == sorted(scores, reverse=True)
    by_id = {r["identifier"]: r for r in ev}
    top = by_id["d1-chunk-0"]
    assert top["relationship"] == "RELATED_TO"
    assert top["retrieval_path"] == "Document(d1) <-PART_OF- Chunk(d1-chunk-0)"
    assert top["hop_count"] == 1
    assert top["matched_entities"] == ["EMP001", "Org update"]
    fact_rows = [r for r in ev if r["kind"] == "fact"]
    assert fact_rows and all(r["relationship"] == "CANONICAL_FACT" for r in fact_rows)
    assert all(r["retrieval_path"] == "CanonicalFact -> Document" for r in fact_rows)
    for r in fact_rows:  # EMP-ids are displayable; 'server' plain word kept
        assert all(m and not m.isdigit() for m in r["matched_entities"])

    summary = trace_summary(spark.createDataFrame(ev), user_scoped=False).collect()[0]
    assert summary["result_count"] == len(ev)
    assert summary["max_hop_count"] == 1
    assert summary["retrieval_path"] == ev[0]["retrieval_path"]

    # empty evidence: fallback default path, zero counts
    empty = trace_summary(
        spark.createDataFrame([], spark.createDataFrame(ev).schema), user_scoped=False
    ).collect()[0]
    assert empty["result_count"] == 0 and empty["max_hop_count"] == 0
    assert empty["retrieval_path"] == "Document -> Chunk"
