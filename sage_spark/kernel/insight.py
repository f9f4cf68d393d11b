"""Message-insight assembly: preview claims + display decoration.

The reference's insight endpoint (app/saia.py:1278-1460 collect_message_insight)
assembles, for one message, its evidence documents, stored claims, linked
canonical facts, and supersedence replacements — and decorates every record
with human display text. Two parts are pure per-record logic and live here
as kernel functions:

* ``preview_message_claims`` (saia.py:1654-1695) — when a message has no
  stored claims, run the extraction cascade on its content and mark the
  results ``preview_only``;
* the display decoration (saia.py:1945-2084): ``display_label_from_fields``,
  ``decorate_claim_for_insight`` / ``decorate_fact_for_insight``, and
  ``render_record_display_text`` — entity ids replaced by display names,
  with a per-claim-type sentence template.

The cross-record joins (message -> evidence docs -> claims -> facts ->
replacements) are the DataFrame operator ``operators/insight.py``.
"""

from __future__ import annotations

import json
from typing import Any, Optional

from .claims import _implicit_relation, extract_claims
from .entities import EntityCatalog, MessageContext
from .text import clean_message_text, collapse_ws, humanize_label


def load_json_blob(raw: Any) -> dict[str, Any]:
    """Tolerant JSON-text -> dict (saia.py:1643-1651)."""
    if not raw:
        return {}
    if isinstance(raw, dict):
        return dict(raw)
    try:
        out = json.loads(raw)
    except (TypeError, json.JSONDecodeError):
        return {}
    return out if isinstance(out, dict) else {}


def display_label_from_fields(
    *,
    entity_id: Optional[str],
    key: Optional[str],
    raw: Optional[str],
    display_names: dict[str, str],
) -> Optional[str]:
    """Best human label for an entity mention (saia.py:1964-1980): resolved
    display name by id, then by key, then the humanized key/raw text."""
    if entity_id and display_names.get(entity_id):
        return display_names[entity_id]
    if key and display_names.get(key):
        return display_names[key]
    if key:
        return humanize_label(key)
    if raw:
        return humanize_label(raw)
    return None


def load_entity_display_names(
    catalog: Optional[EntityCatalog], entity_ids: list[str]
) -> dict[str, str]:
    """Batch display-name lookup (saia.py:1921-1942): coalesce(user/group/
    person name, email-matched name, the id itself)."""
    if catalog is None or not entity_ids:
        return {}
    out: dict[str, str] = {}
    for eid in dict.fromkeys(entity_ids):
        if not eid:
            continue
        out[str(eid)] = str(catalog.display_name(str(eid)) or eid)
    return out


def collect_entity_ids(*collections: list[dict[str, Any]]) -> list[str]:
    """Distinct subject/object entity ids across claim/fact/replacement
    record sets, incl. nested previous/replacement facts (saia.py:1945-1961)."""
    ids: set[str] = set()
    for collection in collections:
        for record in collection or []:
            for key in ("subject_entity_id", "object_entity_id"):
                if record.get(key):
                    ids.add(str(record[key]))
            for nested_key in ("_previous_fact", "_replacement_fact"):
                nested = record.get(nested_key)
                if isinstance(nested, dict):
                    for key in ("subject_entity_id", "object_entity_id"):
                        if nested.get(key):
                            ids.add(str(nested[key]))
    return sorted(ids)


def decorate_grounding(
    grounding: dict[str, Any], display_names: dict[str, str]
) -> dict[str, Any]:
    """Stamp display_name onto each grounding reference (saia.py:1982-1996)."""
    references = grounding.get("references") or []
    for reference in references:
        if not isinstance(reference, dict):
            continue
        label = display_label_from_fields(
            entity_id=reference.get("entity_id"),
            key=reference.get("resolved_key"),
            raw=reference.get("raw"),
            display_names=display_names,
        )
        if label:
            reference["display_name"] = label
    grounding["references"] = references
    return grounding


def render_record_display_text(
    record: dict[str, Any], display_names: dict[str, str]
) -> str:
    """Per-claim-type display sentence (saia.py:2032-2084); works for both
    claims and canonical facts (they share the field vocabulary)."""
    claim_type = record.get("claim_type")
    payload = load_json_blob(record.get("payload_json"))
    subject = display_label_from_fields(
        entity_id=record.get("subject_entity_id"),
        key=record.get("subject_key"),
        raw=record.get("subject_raw"),
        display_names=display_names,
    ) or "Unknown"
    obj = display_label_from_fields(
        entity_id=record.get("object_entity_id"),
        key=record.get("object_key"),
        raw=record.get("object_raw"),
        display_names=display_names,
    )
    value_text = record.get("value_text")
    temporal_start = record.get("temporal_start")

    if claim_type == "TASK_ASSIGNMENT":
        text = f"{subject} will {value_text or payload.get('verb') or 'do'}"
        if obj:
            relation = payload.get("recipient_relation") or _implicit_relation(
                payload.get("verb") or ""
            )
            text += f" {relation} {obj}" if relation else f" {obj}"
        if temporal_start:
            text += f" on {temporal_start}"
        return collapse_ws(text)
    if claim_type == "REPORTS_TO":
        return collapse_ws(f"{subject} reports to {obj or 'Unknown'}")
    if claim_type == "APPROVAL_STATE":
        text = f"{subject} is approved"
        if obj:
            text += f" by {obj}"
        return text
    if claim_type == "STATUS_UPDATE":
        return collapse_ws(f"{subject} is {value_text or 'updated'}")
    if claim_type == "ASSIGNMENT_STATE":
        relation_text = (
            "is no longer assigned to" if value_text == "inactive" else "is assigned to"
        )
        target = obj or humanize_label(payload.get("assignment_target")) or "Unknown"
        return collapse_ws(f"{subject} {relation_text} {target}")
    if claim_type == "MEETING_EVENT":
        text = value_text or "meeting"
        if temporal_start:
            text += f" scheduled for {temporal_start}"
        return text
    if claim_type == "REQUEST":
        text = f"{subject} requested"
        if obj:
            text += f" {obj}"
        if value_text:
            text += f" to {value_text}"
        return collapse_ws(text)
    return record.get("normalized_text") or record.get("summary") or value_text or "Unknown"


def decorate_claim_for_insight(
    claim: dict[str, Any], display_names: dict[str, str]
) -> None:
    """In-place display decoration of one claim (saia.py:1998-2014)."""
    claim["grounding"] = decorate_grounding(claim.get("grounding") or {}, display_names)
    claim["subject_display"] = display_label_from_fields(
        entity_id=claim.get("subject_entity_id"),
        key=claim.get("subject_key"),
        raw=claim.get("subject_raw"),
        display_names=display_names,
    )
    claim["object_display"] = display_label_from_fields(
        entity_id=claim.get("object_entity_id"),
        key=claim.get("object_key"),
        raw=claim.get("object_raw"),
        display_names=display_names,
    )
    claim["display_text"] = render_record_display_text(claim, display_names)


def decorate_fact_for_insight(
    fact: dict[str, Any], display_names: dict[str, str]
) -> None:
    """In-place display decoration of one canonical fact (saia.py:2016-2030)."""
    fact["subject_display"] = display_label_from_fields(
        entity_id=fact.get("subject_entity_id"),
        key=fact.get("subject_key"),
        raw=fact.get("subject_raw"),
        display_names=display_names,
    )
    fact["object_display"] = display_label_from_fields(
        entity_id=fact.get("object_entity_id"),
        key=fact.get("object_key"),
        raw=fact.get("object_raw"),
        display_names=display_names,
    )
    fact["display_summary"] = render_record_display_text(fact, display_names)


def preview_message_claims(
    message: dict[str, Any],
    catalog: Optional[EntityCatalog] = None,
    *,
    receiver_ids: Optional[list[str]] = None,
    created_at: str = "",
) -> list[dict[str, Any]]:
    """Live extraction preview for a message with no stored claims
    (saia.py:1654-1695): run the cascade on the cleaned content and mark
    each result preview_only, with empty fact links and parsed grounding.

    ``receiver_ids`` overrides the message's receiver_id field (the
    reference falls back to the document's RECEIVED_BY edges); ``created_at``
    is the audit stamp (the reference stamps wall-clock)."""
    message_id = str(message.get("id") or message.get("message_id") or "")
    content = clean_message_text(message.get("content") or "")
    if not content:
        return []
    if receiver_ids is None:
        receiver_ids = (
            [str(message["receiver_id"])] if message.get("receiver_id") else []
        )
    ctx = MessageContext(
        doc_id=f"chat-msg-{message_id}",
        message_id=message_id,
        linked_message_id=None,
        sender_id=str(message.get("sender_id") or ""),
        receiver_ids=tuple(receiver_ids),
        conversation_id=message.get("conversation_id"),
        conversation_type=message.get("conversation_type"),
        group_id=message.get("group_id"),
        sent_at=message.get("sent_at") or "1970-01-01T00:00:00Z",
        source=message.get("source") or "chat_message",
        source_kind="chat_message",
        is_ai_response=bool(message.get("is_ai_response")),
        attachment_name=message.get("attachment_name"),
    )
    claims = extract_claims(content, ctx, catalog, created_at=created_at)
    for claim in claims:
        claim["facts"] = []
        claim["preview_only"] = True
        claim["source_doc_id"] = ctx.doc_id
        claim["grounding"] = load_json_blob(claim.get("grounding_json"))
    return claims
