"""The insight DataFrame operators vs the serial kernel replay: evidence
walk semantics (all three link forms, missing links, supersedence) and the
column-form display decoration vs the pure-Python kernel renderer."""

from __future__ import annotations

from pyspark.sql import functions as F

from sage_spark.kernel.insight import (
    display_label_from_fields,
    render_record_display_text,
)
from sage_spark.kernel.text import humanize_label
from sage_spark.operators.insight import (
    evidence_links,
    humanize_label_col,
    message_insight,
    with_display_labels,
    with_display_text,
)

HUMANIZE_BATTERY = [
    None,
    "",
    "   ",
    "alice smith",
    "project-alpha",
    "data_warehouse_migration",
    "EMP001",
    "u1",
    "alice@example.com",
    "Already Capitalized",
    "MiXeD case here",
    "a-b_c",
    "-leading-dash",
    "12345",
    "q3-2026_plan",
    "  padded slug  ",
    "x9y",
    "one",
]


def test_humanize_label_column_matches_kernel(spark):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(HUMANIZE_BATTERY)], "i int, v string")
    got = {
        r["i"]: r["h"]
        for r in df.select("i", humanize_label_col(F.col("v")).alias("h")).collect()
    }
    for i, v in enumerate(HUMANIZE_BATTERY):
        expected = humanize_label(v.strip() if isinstance(v, str) else v)
        # kernel operates on the stripped text like the reference; the
        # column form trims identically
        assert got[i] == expected, (v, got[i], expected)


def _scenario(spark):
    documents = spark.createDataFrame(
        [
            ("chat-msg-m1", None, None, "2026-01-01T00:00:00+00:00"),
            ("docB", "m2", None, "2026-01-02T00:00:00+00:00"),
            ("docC", None, "m3", "2026-01-03T00:00:00+00:00"),
            ("docD", "m4", "m5", "2026-01-04T00:00:00+00:00"),  # two link forms
            ("docE", None, None, "2026-01-05T00:00:00+00:00"),  # no message link
        ],
        "doc_id string, origin_message_id string, linked_message_id string, timestamp string",
    )
    claims = spark.createDataFrame(
        [
            ("c1", "chat-msg-m1", "STATUS_UPDATE", "server is down", "t1"),
            ("c2", "docB", "REPORTS_TO", "bob reports to alice", "t2"),
            ("c3", "docD", "REQUEST", "u1 requested review", "t3"),
            ("c4", "docE", "STATUS_UPDATE", "orphan", "t4"),
        ],
        "claim_id string, doc_id string, claim_type string, normalized_text string, created_at string",
    )
    edges = spark.createDataFrame(
        [
            ("c1", "f1", "SUPPORTS"),
            ("c2", "f2", "SUPPORTS"),
            ("c2", "f0", "CONTRADICTS"),
        ],
        "claim_id string, fact_id string, relation_type string",
    )
    facts = spark.createDataFrame(
        [
            ("f0", "k0", "old summary", "superseded", 1, "f2", "2026-01-02T00:00:00+00:00"),
            ("f1", "k1", "server down", "current", 2, None, None),
            ("f2", "k0", "new summary", "current", 1, None, None),
        ],
        "fact_id string, canonical_key string, summary string, status string, "
        "support_count int, superseded_by_fact_id string, superseded_at string",
    )
    return documents, claims, edges, facts


def test_evidence_links_all_three_forms(spark):
    documents, *_ = _scenario(spark)
    links = {(r["message_id"], r["doc_id"]) for r in evidence_links(documents).collect()}
    assert links == {
        ("m1", "chat-msg-m1"),
        ("m2", "docB"),
        ("m3", "docC"),
        ("m4", "docD"),
        ("m5", "docD"),
    }


def test_message_insight_walk(spark):
    documents, claims, edges, facts = _scenario(spark)
    rows = message_insight(documents, claims, edges, facts).collect()
    by_claim = {}
    for r in rows:
        by_claim.setdefault(r["claim_id"], []).append(r)
    # c1: one SUPPORTS link, no predecessor
    (r1,) = by_claim["c1"]
    assert (r1["message_id"], r1["fact_id"], r1["previous_fact_id"]) == ("m1", "f1", None)
    assert r1["support_count"] == 2 and r1["fact_status"] == "current"
    # c2: SUPPORTS f2 (with predecessor f0) + CONTRADICTS f0 (no predecessor
    # fan-out on contradicts), duplicated for nothing — docB links only m2
    c2 = {(r["relation_type"], r["fact_id"], r["previous_fact_id"]) for r in by_claim["c2"]}
    assert c2 == {("SUPPORTS", "f2", "f0"), ("CONTRADICTS", "f0", None)}
    assert {r["message_id"] for r in by_claim["c2"]} == {"m2"}
    sup = next(r for r in by_claim["c2"] if r["relation_type"] == "SUPPORTS")
    assert sup["previous_summary"] == "old summary"
    assert sup["previous_superseded_at"] == "2026-01-02T00:00:00+00:00"
    # c3: claim with no promoted fact — fact fields null, both message ids
    assert {(r["message_id"], r["fact_id"]) for r in by_claim["c3"]} == {
        ("m4", None),
        ("m5", None),
    }
    # c4's doc has no message link: absent entirely
    assert "c4" not in by_claim
    # message scoping semi-join
    only_m2 = message_insight(
        documents, claims, edges, facts,
        messages=spark.createDataFrame([("m2",)], "message_id string"),
    ).collect()
    assert {r["claim_id"] for r in only_m2} == {"c2"}


DISPLAY_RECORDS = [
    {
        "rid": 1,
        "claim_type": "TASK_ASSIGNMENT",
        "subject_entity_id": "EMP004",
        "subject_key": None,
        "subject_raw": "David",
        "object_entity_id": "EMP002",
        "object_key": "bob@example.com",
        "object_raw": "Bob",
        "value_text": "send report",
        "temporal_start": "2026-04-02T00:00:00+00:00",
        "payload_json": '{"verb": "send", "recipient_relation": "to"}',
        "normalized_text": "n1",
    },
    {
        "rid": 2,
        "claim_type": "TASK_ASSIGNMENT",
        "subject_entity_id": None,
        "subject_key": "carol-williams",
        "subject_raw": None,
        "object_entity_id": None,
        "object_key": None,
        "object_raw": None,
        "value_text": None,
        "temporal_start": None,
        "payload_json": '{"verb": "review"}',
        "normalized_text": "n2",
    },
    {
        "rid": 3,
        "claim_type": "ASSIGNMENT_STATE",
        "subject_entity_id": "EMP002",
        "subject_key": None,
        "subject_raw": None,
        "object_entity_id": None,
        "object_key": None,
        "object_raw": None,
        "value_text": "inactive",
        "temporal_start": None,
        "payload_json": '{"assignment_target": "project-a"}',
        "normalized_text": "n3",
    },
    {
        "rid": 4,
        "claim_type": "MEETING_EVENT",
        "subject_entity_id": None,
        "subject_key": None,
        "subject_raw": None,
        "object_entity_id": None,
        "object_key": None,
        "object_raw": None,
        "value_text": "quarterly review",
        "temporal_start": "2026-05-04T00:00:00+00:00",
        "payload_json": "{}",
        "normalized_text": "n4",
    },
    {
        "rid": 5,
        "claim_type": "SOMETHING_ELSE",
        "subject_entity_id": None,
        "subject_key": None,
        "subject_raw": None,
        "object_entity_id": None,
        "object_key": None,
        "object_raw": None,
        "value_text": "vt",
        "temporal_start": None,
        "payload_json": "{}",
        "normalized_text": None,
    },
    {
        "rid": 6,
        "claim_type": "APPROVAL_STATE",
        "subject_entity_id": None,
        "subject_key": "travel-request",
        "subject_raw": None,
        "object_entity_id": "EMP003",
        "object_key": None,
        "object_raw": None,
        "value_text": "approved",
        "temporal_start": None,
        "payload_json": "{}",
        "normalized_text": "n6",
    },
]

NAMES = {
    "EMP002": "Bob Smith",
    "EMP003": "Carol Williams",
    "EMP004": "David Lee",
}


def test_display_columns_match_kernel(spark):
    cols = (
        "rid int, claim_type string, subject_entity_id string, subject_key string, "
        "subject_raw string, object_entity_id string, object_key string, object_raw string, "
        "value_text string, temporal_start string, payload_json string, normalized_text string"
    )
    df = spark.createDataFrame(
        [tuple(r[c.split()[0]] for c in cols.split(", ")) for r in DISPLAY_RECORDS], cols
    )
    names_df = spark.createDataFrame(list(NAMES.items()), "entity_id string, display_name string")
    out = {
        r["rid"]: r
        for r in with_display_text(with_display_labels(df, names_df)).collect()
    }
    for rec in DISPLAY_RECORDS:
        got = out[rec["rid"]]
        exp_subject = display_label_from_fields(
            entity_id=rec["subject_entity_id"], key=rec["subject_key"],
            raw=rec["subject_raw"], display_names=NAMES,
        )
        exp_object = display_label_from_fields(
            entity_id=rec["object_entity_id"], key=rec["object_key"],
            raw=rec["object_raw"], display_names=NAMES,
        )
        assert got["subject_display"] == exp_subject, rec["rid"]
        assert got["object_display"] == exp_object, rec["rid"]
        assert got["display_text"] == render_record_display_text(rec, NAMES), rec["rid"]
