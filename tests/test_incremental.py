"""Incremental-maintenance operators (fact diff / impact radius / re-embed),
vs hand-derived cases and the serial replays in kernel/expected.py.

Reference anchors: under_development/saia.py:117-146 (compute_diff),
:147-189 (compute_impact_radius), :191-227 (re_embed_chunks).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sage_spark.kernel.expected import expected_fact_diff, expected_impact_radius
from sage_spark.operators.incremental import (
    affected_documents,
    changed_entities,
    fact_diff,
    impact_radius,
    re_embed_targets,
)

_CLAIM_SCHEMA = (
    "claim_id string, doc_id string, canonical_key string, claim_type string, "
    "predicate string, subject_entity_id string, subject_key string, "
    "object_entity_id string, object_key string, value_text string, "
    "temporal_start string, temporal_granularity string, graph_worthy boolean, "
    "resolution_status string, canonical_confidence double"
)

_FACT_SCHEMA = (
    "fact_id string, canonical_key string, status string, claim_type string, "
    "predicate string, subject_entity_id string, subject_key string, "
    "object_entity_id string, object_key string, value_text string, "
    "temporal_start string, temporal_granularity string"
)


def _claim(**kw) -> dict:
    base = {
        "claim_id": "c0",
        "doc_id": "d0",
        "canonical_key": "k0",
        "claim_type": "ROLE_ASSIGNMENT",
        "predicate": "has_role",
        "subject_entity_id": "EMP001",
        "subject_key": "emp001",
        "object_entity_id": None,
        "object_key": "manager",
        "value_text": "manager",
        "temporal_start": None,
        "temporal_granularity": None,
        "graph_worthy": True,
        "resolution_status": "resolved",
        "canonical_confidence": 0.95,
    }
    base.update(kw)
    return base


def _fact(**kw) -> dict:
    base = {
        "fact_id": "f0",
        "canonical_key": "k0",
        "status": "current",
        "claim_type": "ROLE_ASSIGNMENT",
        "predicate": "has_role",
        "subject_entity_id": "EMP001",
        "subject_key": "emp001",
        "object_entity_id": None,
        "object_key": "manager",
        "value_text": "manager",
        "temporal_start": None,
        "temporal_granularity": None,
    }
    base.update(kw)
    return base


def _frames(spark, claims: list[dict], facts: list[dict]):
    cdf = spark.createDataFrame(
        [tuple(c[k] for k in _CLAIM_SCHEMA.replace(" string", "").replace(" boolean", "").replace(" double", "").split(", ")) for c in claims],
        _CLAIM_SCHEMA,
    )
    fdf = spark.createDataFrame(
        [tuple(f[k] for k in _FACT_SCHEMA.replace(" string", "").split(", ")) for f in facts],
        _FACT_SCHEMA,
    )
    return cdf, fdf


def test_fact_diff_classification(spark):
    facts = [
        _fact(fact_id="f1", canonical_key="k1", value_text="alice"),
        _fact(fact_id="f2", canonical_key="k2", value_text="x", object_key="x"),
        # a superseded fact does NOT make its key live
        _fact(fact_id="f3", canonical_key="k3", status="superseded"),
        _fact(
            fact_id="f5",
            canonical_key="k5",
            claim_type="APPROVAL_STATE",
            value_text="approved",
            predicate="fact-side-pred",
        ),
    ]
    claims = [
        _claim(claim_id="c1", canonical_key="k1", value_text="alice"),  # confirmed
        _claim(claim_id="c2", canonical_key="k2", value_text="y", object_key="y"),  # contradicted
        _claim(claim_id="c3", canonical_key="k4"),  # added: key never seen
        _claim(claim_id="c4", canonical_key="k3"),  # added: only superseded fact
        _claim(claim_id="c5", canonical_key="k1", graph_worthy=False),  # filtered
        _claim(claim_id="c6", canonical_key="k1", resolution_status="unresolved"),  # filtered
        _claim(claim_id="c7", canonical_key="k1", canonical_confidence=0.1),  # filtered
        # APPROVAL_STATE compares key + value only: different predicate still confirms
        _claim(
            claim_id="c8",
            canonical_key="k5",
            claim_type="APPROVAL_STATE",
            value_text="approved",
            predicate="claim-side-pred",
        ),
    ]
    cdf, fdf = _frames(spark, claims, facts)
    got = {r["claim_id"]: r.asDict() for r in fact_diff(cdf, fdf).collect()}
    assert set(got) == {"c1", "c2", "c3", "c4", "c8"}
    assert got["c1"]["change"] == "confirmed" and got["c1"]["existing_fact_id"] == "f1"
    assert got["c2"]["change"] == "contradicted" and got["c2"]["existing_fact_id"] == "f2"
    assert got["c3"]["change"] == "added" and got["c3"]["existing_fact_id"] is None
    assert got["c4"]["change"] == "added"
    assert got["c8"]["change"] == "confirmed" and got["c8"]["existing_fact_id"] == "f5"

    # serial-replay parity on the same inputs
    exp = expected_fact_diff(claims, facts)
    exp_map = {r["claim_id"]: r for r in exp}
    assert set(exp_map) == set(got)
    for cid, row in got.items():
        for col in ("doc_id", "canonical_key", "change", "existing_fact_id"):
            assert row[col] == exp_map[cid][col], (cid, col)


def test_fact_diff_multiple_current_facts_per_key(spark):
    # two live facts on one key: equality to ANY confirms; none -> the
    # contradicted existing_fact_id is the deterministic min
    facts = [
        _fact(fact_id="fb", canonical_key="k1", value_text="beta"),
        _fact(fact_id="fa", canonical_key="k1", value_text="alpha"),
    ]
    claims = [
        _claim(claim_id="c1", canonical_key="k1", value_text="beta"),
        _claim(claim_id="c2", canonical_key="k1", value_text="gamma"),
    ]
    cdf, fdf = _frames(spark, claims, facts)
    got = {r["claim_id"]: r.asDict() for r in fact_diff(cdf, fdf).collect()}
    assert got["c1"]["change"] == "confirmed" and got["c1"]["existing_fact_id"] == "fb"
    assert got["c2"]["change"] == "contradicted" and got["c2"]["existing_fact_id"] == "fa"
    exp = {r["claim_id"]: r for r in expected_fact_diff(claims, facts)}
    assert {c: (r["change"], r["existing_fact_id"]) for c, r in got.items()} == {
        c: (r["change"], r["existing_fact_id"]) for c, r in exp.items()
    }


def test_impact_radius_min_hop_bfs(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("x", "y"), ("a", "a")]
    edf = spark.createDataFrame(edges, "src string, dst string")
    seeds = spark.createDataFrame([("a",), ("e",)], "entity_id string")
    got = {(r["entity_id"], r["depth"]) for r in impact_radius(seeds, edf, max_depth=2).collect()}
    exp = {
        (r["entity_id"], r["depth"])
        for r in expected_impact_radius(["a", "e"], edges, max_depth=2)
    }
    assert got == exp
    # a reaches b(1) c(2); e reaches d(1) c(2) — c's min depth is 2; x/y untouched
    assert got == {("a", 0), ("e", 0), ("b", 1), ("d", 1), ("c", 2)}
    # depth 0 = seeds only
    got0 = {(r["entity_id"], r["depth"]) for r in impact_radius(seeds, edf, max_depth=0).collect()}
    assert got0 == {("a", 0), ("e", 0)}


def test_changed_entities_and_affected_documents(spark):
    facts = [_fact(fact_id="f1", canonical_key="k1", value_text="alice")]
    claims = [
        _claim(claim_id="c1", canonical_key="k1", value_text="bob", doc_id="d1",
               subject_entity_id="E1", object_entity_id="E2"),  # contradicted
        # field-equal to f1 -> confirmed -> contributes no seed
        _claim(claim_id="c2", canonical_key="k1", value_text="alice", doc_id="d2"),
    ]
    cdf, fdf = _frames(spark, claims, facts)
    diff = fact_diff(cdf, fdf)
    seeds = {r["entity_id"] for r in changed_entities(diff, cdf).collect()}
    assert seeds == {"E1", "E2"}
    corpus = spark.createDataFrame(
        [
            ("cc1", "dA", "E2", None),
            ("cc2", "dB", "Z1", "E1"),
            ("cc3", "dC", "Z2", "Z3"),
        ],
        "claim_id string, doc_id string, subject_entity_id string, object_entity_id string",
    )
    impacted = spark.createDataFrame([("E1", 0), ("E2", 0)], "entity_id string, depth int")
    docs = {r["doc_id"] for r in affected_documents(impacted, corpus).collect()}
    assert docs == {"dA", "dB"}


def test_re_embed_targets_threshold(spark):
    chunks = spark.createDataFrame(
        [("ch1", [1.0, 0.0]), ("ch2", [1.0, 0.0]), ("ch3", [0.6, 0.8])],
        "chunk_id string, embedding array<double>",
    )
    fresh = spark.createDataFrame(
        [("ch1", [1.0, 0.0]), ("ch2", [0.0, 1.0]), ("ch3", [0.6, 0.8])],
        "chunk_id string, new_embedding array<double>",
    )
    got = {r["chunk_id"]: r.asDict() for r in re_embed_targets(chunks, fresh, threshold=0.1).collect()}
    assert got["ch1"]["needs_reembed"] is False and abs(got["ch1"]["cosine"] - 1.0) < 1e-5
    assert got["ch2"]["needs_reembed"] is True and abs(got["ch2"]["cosine"]) < 1e-5
    assert got["ch3"]["needs_reembed"] is False


def test_fact_diff_plan_single_key_shuffle_no_cartesian(spark):
    """PL: the diff is one canonical_key-keyed equi-join + one aggregation —
    no cartesian/nested-loop join anywhere in the plan."""
    facts = [_fact(fact_id="f1", canonical_key="k1")]
    claims = [_claim(claim_id="c1", canonical_key="k1")]
    cdf, fdf = _frames(spark, claims, facts)
    plan = fact_diff(cdf, fdf)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    aff_plan = (
        affected_documents(
            spark.createDataFrame([("E1", 0)], "entity_id string, depth int"),
            cdf,
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in aff_plan
    assert "BroadcastNestedLoopJoin" not in aff_plan


def test_fact_diff_duplicate_claim_rows_merge_not_last_wins(spark):
    """Two claim rows sharing (claim_id, doc_id, canonical_key) where only
    one is field-equal to a live fact: the operator ORs equality across the
    duplicates (=> confirmed, min matched fact id); the serial oracle must
    merge identically — last-row-wins would read 'contradicted' when the
    non-equal duplicate iterates last."""
    facts = [_fact(fact_id="f1", canonical_key="k1", value_text="alice")]
    claims = [
        _claim(claim_id="c1", canonical_key="k1", value_text="alice"),  # equal
        _claim(claim_id="c1", canonical_key="k1", value_text="bob"),  # not equal, last
    ]
    cdf, fdf = _frames(spark, claims, facts)
    got = fact_diff(cdf, fdf).collect()
    assert len(got) == 1
    assert got[0]["change"] == "confirmed" and got[0]["existing_fact_id"] == "f1"
    exp = expected_fact_diff(claims, facts)
    assert len(exp) == 1
    assert exp[0]["change"] == "confirmed" and exp[0]["existing_fact_id"] == "f1"
