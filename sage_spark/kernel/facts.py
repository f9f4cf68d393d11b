"""Canonical-fact mutation state machine (K3-K6).

Reference parity: app/saia.py:274-342 (the per-claim mutation loop),
402-411 (choose_mutation_action), 1133-1215 (_persist_fact), 1225-1247
(_touch_existing_fact, _supersede_existing_fact), 1258-1275 (_facts_match).

The reference replays claims serially, one message at a time, against Neo4j.
Mutations only ever interact through the claim's ``canonical_key``
(choose_mutation_action reads current facts for that key alone), so the
whole loop partitions cleanly by canonical_key: the Spark operator groups
claims by key, orders them deterministically by (sent_at, doc_id, claim
sequence) — the batch equivalent of the reference's arrival order — and runs
this pure replay per group. Per-group state is a handful of facts, so groups
stay tiny even at 10^12 documents.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Iterable, Optional

from .claims import promotable
from .embed import hash_embedding

_FACT_EQUALITY_FIELDS = (
    "claim_type",
    "predicate",
    "subject_entity_id",
    "subject_key",
    "object_entity_id",
    "object_key",
    "value_text",
    "temporal_start",
    "temporal_granularity",
)


def facts_equal(fact: dict[str, Any], claim: dict[str, Any]) -> bool:
    """Field-equality test deciding confirm-vs-supersede (saia.py:1258-1275);
    APPROVAL_STATE compares only key + value, None is equivalent to ''."""
    if claim.get("claim_type") == "APPROVAL_STATE":
        return (fact.get("canonical_key") or "") == (claim.get("canonical_key") or "") and (
            fact.get("value_text") or ""
        ) == (claim.get("value_text") or "")
    return all((fact.get(k) or "") == (claim.get(k) or "") for k in _FACT_EQUALITY_FIELDS)


def fact_identity(claim_id: str, canonical_key: str) -> str:
    import hashlib

    return hashlib.sha256(f"fact::{claim_id}::{canonical_key}".encode("utf-8")).hexdigest()


def _fact_from_claim(claim: dict[str, Any], seen_at: str, *, embed: bool) -> dict[str, Any]:
    """Fact row assembly (saia.py:1133-1183)."""
    summary = claim.get("normalized_text") or claim.get("value_text") or claim.get("predicate")
    return {
        "fact_id": fact_identity(claim["claim_id"], claim["canonical_key"]),
        "canonical_key": claim["canonical_key"],
        "claim_type": claim["claim_type"],
        "predicate": claim["predicate"],
        "subject_key": claim.get("subject_key"),
        "subject_entity_id": claim.get("subject_entity_id"),
        "subject_entity_type": claim.get("subject_entity_type"),
        "object_key": claim.get("object_key"),
        "object_entity_id": claim.get("object_entity_id"),
        "object_entity_type": claim.get("object_entity_type"),
        "value_text": claim.get("value_text"),
        "payload_json": claim.get("payload_json"),
        "summary": summary,
        "embedding": hash_embedding(summary or "") if embed else None,
        "scope_type": claim.get("scope_type"),
        "scope_id": claim.get("scope_id"),
        "temporal_start": claim.get("temporal_start"),
        "temporal_end": claim.get("temporal_end"),
        "temporal_granularity": claim.get("temporal_granularity"),
        "timezone": claim.get("timezone"),
        "status": "current",
        "confidence": claim.get("canonical_confidence"),
        "first_seen_at": seen_at,
        "last_seen_at": seen_at,
        "support_count": 1,
        "superseded_by_fact_id": None,
        "superseded_at": None,
    }


@dataclass
class MutationOutcome:
    """Result of replaying one canonical_key group."""

    facts: list[dict[str, Any]] = field(default_factory=list)  # final state (current + superseded)
    claim_updates: list[dict[str, Any]] = field(default_factory=list)  # (claim_id, promotion_status, mutation_action)
    edges: list[dict[str, Any]] = field(default_factory=list)  # (claim_id, fact_id, relation_type)
    canonicalized: int = 0
    conflicts: int = 0


def replay_key_mutations(
    existing_facts: Iterable[dict[str, Any]],
    ordered_claims: Iterable[dict[str, Any]],
    seen_at: str,
    *,
    embed: bool = False,
) -> MutationOutcome:
    """Replay the reference's mutation loop for one canonical_key.

    ``existing_facts`` are this key's rows already in the store (any status),
    in store order; ``ordered_claims`` must be pre-sorted by the batch's
    deterministic arrival order. Each claim is decided against the *live*
    state, exactly as the serial reference run would see it.
    """
    out = MutationOutcome()
    by_id: dict[str, dict[str, Any]] = {}
    # insertion-ordered id log (for stable output order) plus a live
    # current-id list maintained incrementally — rescanning the full log per
    # claim would be O(n^2) on hub keys with thousands of claims
    inserted_order: list[str] = []
    current_ids: list[str] = []
    for fact in existing_facts:
        row = dict(fact)
        by_id[row["fact_id"]] = row
        inserted_order.append(row["fact_id"])
        if row.get("status") == "current":
            current_ids.append(row["fact_id"])

    def record(claim: dict[str, Any], promotion_status: str, mutation_action: str) -> None:
        out.claim_updates.append(
            {
                "claim_id": claim["claim_id"],
                "promotion_status": promotion_status,
                "mutation_action": mutation_action,
            }
        )

    def insert_fact(claim: dict[str, Any]) -> str:
        new_fact = _fact_from_claim(claim, seen_at, embed=embed)
        fid = new_fact["fact_id"]
        if fid in by_id:
            # MERGE semantics: re-inserting the same fact id overwrites its
            # properties and bumps support_count (saia.py:1139-1161).
            new_fact["support_count"] = int(by_id[fid].get("support_count") or 0) + 1
            if fid not in current_ids:
                current_ids.append(fid)
        else:
            inserted_order.append(fid)
            current_ids.append(fid)
        by_id[fid] = new_fact
        return fid

    def retire_fact(fid: str) -> None:
        if fid in current_ids:
            current_ids.remove(fid)

    for claim in ordered_claims:
        if not promotable(claim):
            record(claim, claim.get("promotion_status") or "pending", "not_promoted")
            continue

        current = [by_id[f] for f in current_ids]
        action: str
        target: Optional[str] = None
        if not current:
            action = "insert_new_fact"
        else:
            matched = next((f for f in current if facts_equal(f, claim)), None)
            if matched is not None:
                action, target = "confirm_existing_fact", matched["fact_id"]
            elif len(current) == 1 and float(claim.get("canonical_confidence") or 0.0) >= 0.80:
                action, target = "supersede_current_fact", current[0]["fact_id"]
            else:
                action, target = "pending_review", current[0]["fact_id"]

        if action == "confirm_existing_fact" and target:
            out.edges.append({"claim_id": claim["claim_id"], "fact_id": target, "relation_type": "SUPPORTS"})
            by_id[target]["last_seen_at"] = seen_at
            by_id[target]["support_count"] = int(by_id[target].get("support_count") or 0) + 1
            record(claim, "confirmed", action)
            out.canonicalized += 1
        elif action == "insert_new_fact":
            fid = insert_fact(claim)
            out.edges.append({"claim_id": claim["claim_id"], "fact_id": fid, "relation_type": "SUPPORTS"})
            record(claim, "promoted", action)
            out.canonicalized += 1
        elif action == "supersede_current_fact" and target:
            fid = insert_fact(claim)
            old = by_id[target]
            old["status"] = "superseded"
            old["superseded_at"] = seen_at
            old["superseded_by_fact_id"] = fid
            if target != fid:
                retire_fact(target)
            else:
                # self-supersede (duplicate claim_id in one doc, saia MERGE
                # quirk): the fact ends superseded-by-itself
                retire_fact(fid)
            out.edges.append({"claim_id": claim["claim_id"], "fact_id": fid, "relation_type": "SUPPORTS"})
            out.edges.append({"claim_id": claim["claim_id"], "fact_id": target, "relation_type": "CONTRADICTS"})
            out.conflicts += 1
            record(claim, "promoted", action)
            out.canonicalized += 1
        else:
            if target:
                out.edges.append({"claim_id": claim["claim_id"], "fact_id": target, "relation_type": "CONTRADICTS"})
                out.conflicts += 1
            record(claim, "pending_review", "pending_review")

    for fid in inserted_order:
        out.facts.append(by_id[fid])
    return out
