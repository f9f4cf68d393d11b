"""Pipeline behavior on long documents: multi-chunk output, chunk ids,
overlap continuity, and claims still extracted from deep in the text."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from sage_spark.datagen import build_groups, build_persons
from sage_spark.kernel.chunks import chunk_text
from sage_spark.pipeline import run_pipeline
from sage_spark.schema import WEBTEXT_SCHEMA
from sage_spark.store import TableStore

FILLER = (
    "The weekly sync covered routine items and nothing notable happened during the review. "
    "Attendance was normal and the minutes were circulated to the usual distribution list. "
)


def test_long_document_multi_chunk_and_deep_claims(spark, tmp_path):
    body = FILLER * 40 + "EMP002 reports to EMP001. " + FILLER * 40 + "The server is down. " + FILLER * 10
    persons = build_persons(10, 7)
    row = (
        "https://corp.example/long/1", datetime(2026, 4, 1), None, body, "en",
        "EMP001", ["EMP002"], "direct:EMP001:EMP002", "direct", None, "m1", "chat_message",
    )
    webtext = spark.createDataFrame([row], WEBTEXT_SCHEMA)
    store = TableStore(tmp_path / "long")
    result = run_pipeline(
        spark, webtext, persons, build_groups(), store,
        run_id="r1", run_ts="2026-05-01T00:00:00+00:00",
    )
    assert result.documents == 1

    chunks = store.read(spark, "chunks").orderBy("seq").collect()
    assert len(chunks) > 1  # the 200-word fast path must NOT swallow this
    # chunk contents equal the kernel chunker run on the same text
    assert [c["content"] for c in chunks] == chunk_text(body, 250, 2)
    assert [c["seq"] for c in chunks] == list(range(len(chunks)))
    doc_id = chunks[0]["doc_id"]
    assert all(c["chunk_id"] == f"{doc_id}-chunk-{c['seq']}" for c in chunks)

    claims = store.read(spark, "claims")
    types = {r["claim_type"] for r in claims.collect()}
    assert "REPORTS_TO" in types and "STATUS_UPDATE" in types  # found deep in the text
    facts = store.read(spark, "facts").filter(F.col("status") == "current")
    keys = {r["canonical_key"] for r in facts.collect()}
    assert "reports_to::EMP002" in keys
    assert "status::server::general" in keys
