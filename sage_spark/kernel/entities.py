"""Entity resolution against a canonical-entity dimension.

Reference parity: app/saia.py:119-156 (GroundingContext scope rules),
159-166 (Resolution), 873-951 (_resolve_reference), 954-976
(_resolve_commitment_recipient), 979-1012 (_resolved_sender,
_group_or_scope_subject), 1810-1868 (_lookup_person_records,
_select_preferred_person_record), 1871-1918 (_resolve_person_identity,
_lookup_entity_display_name).

The reference resolves each mention with per-row Neo4j lookups. Here the
lookup state is an :class:`EntityCatalog` — an immutable in-memory index
built once from the persons/groups dimension tables and shipped to executors
via a Spark broadcast, which is exactly a map-side broadcast hash join.
For dimensions too large to broadcast, ``operators/linking.py`` provides the
equivalent two-phase DataFrame join (salted, with MinHash-LSH blocking).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, NamedTuple, Optional, Sequence

from .text import collapse_ws, humanize_label, slug

FIRST_PERSON = {"i", "me", "my", "mine", "myself"}
SECOND_PERSON = {"you", "your", "yours", "yourself", "yourselves"}
FIRST_PERSON_PLURAL = {"we", "our", "ours", "us", "ourselves"}
# Unresolvable without a coreference pass; left unresolved by design (saia.py:878-881).
NEUTRAL_ANAPHORA = {"it", "its", "itself", "this", "that", "these", "those", "they", "them", "their", "theirs"}

_ARTICLE_RE = re.compile(r"^(?:the|a|an)\s+", re.IGNORECASE)
_EMP_ID_RE = re.compile(r"EMP\d{3}", re.IGNORECASE)


class Resolution(NamedTuple):
    raw: str
    key: Optional[str]
    entity_id: Optional[str]
    entity_type: Optional[str]
    status: str  # resolved | unresolved | ambiguous
    display_name: Optional[str] = None


def unresolved(raw: str) -> Resolution:
    return Resolution(raw=raw, key=None, entity_id=None, entity_type=None, status="unresolved")


@dataclass(frozen=True)
class MessageContext:
    """Grounding metadata for one message/document (saia.py:119-156)."""

    doc_id: str
    sender_id: str
    receiver_ids: tuple[str, ...] = ()
    message_id: Optional[str] = None
    linked_message_id: Optional[str] = None
    conversation_id: Optional[str] = None
    conversation_type: Optional[str] = None
    group_id: Optional[str] = None
    sent_at: str = "1970-01-01T00:00:00Z"
    source: str = "chat_message"
    source_kind: str = "chat_message"
    attachment_name: Optional[str] = None
    timezone: str = "UTC"
    is_ai_response: bool = False

    @property
    def scope_type(self) -> str:
        if self.conversation_type == "group" and self.group_id:
            return "group"
        if self.conversation_id:
            return "conversation"
        if self.message_id:
            return "message"
        return "document"

    @property
    def scope_id(self) -> str:
        if self.scope_type == "group" and self.group_id:
            return self.group_id
        if self.scope_type == "conversation" and self.conversation_id:
            return self.conversation_id
        if self.scope_type == "message" and self.message_id:
            return self.message_id
        return self.doc_id


class EntityCatalog:
    """Immutable 3-key (id / email / name, case-insensitive) person index plus
    a group-name map. Lookup semantics mirror the reference's Cypher
    (saia.py:1810-1827): match any of the three keys, cap at 5 candidates,
    candidates ordered by dimension insertion order.
    """

    __slots__ = ("_by_key", "_person_name_by_id", "_person_name_by_email", "_group_name_by_id", "_memo")

    def __init__(
        self,
        persons: Sequence[dict[str, Any]] = (),
        groups: Sequence[dict[str, Any]] = (),
    ) -> None:
        by_key: dict[str, list[dict[str, Any]]] = {}
        name_by_id: dict[str, str] = {}
        name_by_email: dict[str, str] = {}
        for row in persons:
            pid = str(row.get("id") or "")
            if not pid:
                continue
            name = str(row.get("name") or "")
            email = str(row.get("email") or "")
            labels = ["User", "Person"] if row.get("is_user") else list(row.get("labels") or ["Person"])
            record = {
                "id": pid,
                "labels": labels,
                "name": name or None,
                "email": email or None,
                # coalesce(name, email, id) — saia.py:1823
                "display_name": name or email or pid,
            }
            for key in {pid.lower(), email.lower(), name.lower()} - {""}:
                bucket = by_key.setdefault(key, [])
                if not any(r["id"] == pid for r in bucket):
                    bucket.append(record)
            if name:
                name_by_id.setdefault(pid, name)
                if email:
                    name_by_email.setdefault(email.lower(), name)
        group_names: dict[str, str] = {}
        for row in groups:
            gid = str(row.get("id") or "")
            if gid:
                group_names[gid] = str(row.get("name") or "") or gid
        self._by_key = by_key
        self._person_name_by_id = name_by_id
        self._person_name_by_email = name_by_email
        self._group_name_by_id = group_names
        # pure-function memo for the cached resolver wrappers below; lives
        # and dies with this catalog instance (per Spark task), so a reused
        # object address can never serve stale entries
        self._memo: dict = {}

    def lookup(self, value: Optional[str]) -> list[dict[str, Any]]:
        if not value:
            return []
        return self._by_key.get(value.lower(), [])[:5]

    def display_name(self, entity_id: Optional[str]) -> Optional[str]:
        """coalesce(user/group/person name by id, names by email, the id
        itself) — saia.py:1899-1918. Returns the id verbatim when unknown,
        matching the reference's behavior with a live (possibly empty) store."""
        if not entity_id:
            return None
        return (
            self._person_name_by_id.get(entity_id)
            or self._group_name_by_id.get(entity_id)
            or self._person_name_by_email.get(entity_id.lower())
            or entity_id
        )


def pick_preferred_record(rows: list[dict[str, Any]], value: Optional[str]) -> Optional[dict[str, Any]]:
    """Candidate tie-break (saia.py:1830-1868): score +6 exact id, +5 exact
    email, +4 exact name/display, +3 User label, +1 has email, +1 has name;
    require a strictly positive, unique maximum."""
    if not rows:
        return None
    if len(rows) == 1:
        return rows[0]
    needle = collapse_ws(value or "").lower()
    scored: list[tuple[int, dict[str, Any]]] = []
    for row in rows:
        labels = {str(x) for x in (row.get("labels") or [])}
        rid = str(row.get("id") or "")
        name = str(row.get("name") or "")
        email = str(row.get("email") or "")
        display = str(row.get("display_name") or "")
        points = 0
        if rid.lower() == needle:
            points += 6
        if email.lower() == needle:
            points += 5
        if name.lower() == needle or display.lower() == needle:
            points += 4
        if "User" in labels:
            points += 3
        if email:
            points += 1
        if name:
            points += 1
        scored.append((points, row))
    scored.sort(key=lambda pair: pair[0], reverse=True)
    top = scored[0][0]
    if top <= 0:
        return None
    winners = [row for pts, row in scored if pts == top]
    return winners[0] if len(winners) == 1 else None


def resolve_person_identity(value: Optional[str], catalog: Optional[EntityCatalog], raw: Optional[str] = None) -> Resolution:
    """Identity resolution for sender/receiver ids (saia.py:1871-1896)."""
    norm = collapse_ws(value or "")
    raw_value = raw or norm
    if catalog is not None:
        preferred = pick_preferred_record(catalog.lookup(norm), norm)
        if preferred is not None:
            labels = preferred.get("labels") or []
            etype = labels[0] if labels else "Person"
            eid = preferred.get("id") or norm
            return Resolution(
                raw=raw_value,
                key=eid,
                entity_id=eid,
                entity_type=etype,
                status="resolved",
                display_name=preferred.get("display_name") or eid,
            )
    return Resolution(
        raw=raw_value,
        key=norm or None,
        entity_id=norm or None,
        entity_type="Person" if norm else None,
        status="resolved" if norm else "unresolved",
        display_name=(catalog.display_name(norm) if catalog is not None and norm else None),
    )


def resolved_sender(ctx: MessageContext, catalog: Optional[EntityCatalog], raw: Optional[str] = None) -> Resolution:
    """saia.py:979-990."""
    resolved = resolve_person_identity(ctx.sender_id, catalog, raw=raw or ctx.sender_id)
    if resolved.entity_id or resolved.key != ctx.sender_id:
        return resolved
    return Resolution(
        raw=raw or ctx.sender_id,
        key=ctx.sender_id,
        entity_id=ctx.sender_id,
        entity_type="Person",
        status="resolved",
        display_name=catalog.display_name(ctx.sender_id) if catalog is not None else None,
    )


def group_or_scope_subject(ctx: MessageContext, catalog: Optional[EntityCatalog], raw: Optional[str] = None) -> Resolution:
    """Meeting-subject rule: the group in group chats, else the sender, else
    the scope id (saia.py:993-1012)."""
    if ctx.conversation_type == "group" and ctx.group_id:
        return Resolution(
            raw=raw or ctx.group_id,
            key=ctx.group_id,
            entity_id=ctx.group_id,
            entity_type="Group",
            status="resolved",
            display_name=catalog.display_name(ctx.group_id) if catalog is not None else None,
        )
    if ctx.sender_id:
        return resolved_sender(ctx, catalog, raw=raw)
    return Resolution(
        raw=raw or ctx.scope_id,
        key=ctx.scope_id,
        entity_id=None,
        entity_type=None,
        status="resolved",
        display_name=humanize_label(ctx.scope_id),
    )


def resolve_reference(
    raw: str,
    ctx: MessageContext,
    catalog: Optional[EntityCatalog],
    *,
    allow_pronouns: bool,
) -> Resolution:
    """Mention -> entity resolution cascade (saia.py:873-951):

    pronouns (when allowed) -> EMP### ids -> sender/receiver/group literal
    match -> 3-key catalog lookup with tie-break -> slug fallback.
    """
    token = collapse_ws(raw)
    canonical = _ARTICLE_RE.sub("", token).strip() or token
    lowered = canonical.lower()

    if allow_pronouns and ctx.source_kind in {"chat_message", "message_attachment"}:
        if lowered in NEUTRAL_ANAPHORA:
            return unresolved(raw)
        if lowered in FIRST_PERSON:
            return resolved_sender(ctx, catalog, raw=raw)
        if lowered in SECOND_PERSON:
            if ctx.conversation_type == "direct" and len(ctx.receiver_ids) == 1:
                return resolve_person_identity(ctx.receiver_ids[0], catalog, raw=raw)
            return unresolved(raw)
        if lowered in FIRST_PERSON_PLURAL:
            if ctx.conversation_type == "group" and ctx.group_id:
                return Resolution(
                    raw=raw,
                    key=ctx.group_id,
                    entity_id=ctx.group_id,
                    entity_type="Group",
                    status="resolved",
                    display_name=catalog.display_name(ctx.group_id) if catalog is not None else None,
                )
            return unresolved(raw)

    if _EMP_ID_RE.fullmatch(canonical):
        emp = canonical.upper()
        return Resolution(
            raw=raw,
            key=emp,
            entity_id=emp,
            entity_type="Person",
            status="resolved",
            display_name=catalog.display_name(emp) if catalog is not None else None,
        )

    if canonical == ctx.sender_id:
        return resolved_sender(ctx, catalog, raw=raw)
    if canonical in ctx.receiver_ids:
        return resolve_person_identity(canonical, catalog, raw=raw)
    if ctx.group_id and canonical == ctx.group_id:
        return Resolution(
            raw=raw,
            key=canonical,
            entity_id=canonical,
            entity_type="Group",
            status="resolved",
            display_name=catalog.display_name(canonical) if catalog is not None else None,
        )

    if catalog is not None:
        rows = catalog.lookup(canonical)
        preferred = pick_preferred_record(rows, canonical)
        if preferred is not None:
            labels = preferred.get("labels") or []
            eid = preferred.get("id")
            return Resolution(
                raw=raw,
                key=eid,
                entity_id=eid,
                entity_type=labels[0] if labels else "Person",
                status="resolved",
                display_name=preferred.get("display_name") or eid,
            )
        if len(rows) > 1:
            return Resolution(raw=raw, key=None, entity_id=None, entity_type=None, status="ambiguous")

    fallback = slug(canonical)
    return Resolution(
        raw=raw,
        key=fallback,
        entity_id=None,
        entity_type=None,
        status="resolved",
        display_name=humanize_label(fallback),
    )


_MEMO_MAX = 1 << 16


def resolve_reference_cached(
    raw: str,
    ctx: MessageContext,
    catalog: Optional[EntityCatalog],
    *,
    allow_pronouns: bool,
) -> Resolution:
    """Memoized ``resolve_reference``. The resolution is a pure function of
    (raw, allow_pronouns, the five ctx fields the cascade reads, catalog
    contents), and mention strings repeat heavily within a partition, so the
    extraction kernel's per-claim resolutions collapse to dict hits.
    ``Resolution`` is a NamedTuple — sharing one instance across claims is
    safe. The memo hangs off the catalog instance (per-task lifetime,
    bounded size); catalog-less calls just compute."""
    if catalog is None:
        return resolve_reference(raw, ctx, catalog, allow_pronouns=allow_pronouns)
    key = (
        raw, allow_pronouns, ctx.sender_id, ctx.conversation_type,
        ctx.receiver_ids, ctx.group_id, ctx.source_kind,
    )
    memo = catalog._memo
    res = memo.get(key)
    if res is None:
        if len(memo) >= _MEMO_MAX:
            memo.clear()
        res = memo[key] = resolve_reference(raw, ctx, catalog, allow_pronouns=allow_pronouns)
    return res


def resolved_sender_cached(
    ctx: MessageContext, catalog: Optional[EntityCatalog], raw: Optional[str] = None
) -> Resolution:
    """Memoized ``resolved_sender`` (reads only ctx.sender_id)."""
    if catalog is None:
        return resolved_sender(ctx, catalog, raw=raw)
    key = ("__sender__", raw, ctx.sender_id)
    memo = catalog._memo
    res = memo.get(key)
    if res is None:
        if len(memo) >= _MEMO_MAX:
            memo.clear()
        res = memo[key] = resolved_sender(ctx, catalog, raw=raw)
    return res


def resolution_label(res: Optional[Resolution], fallback: Optional[str] = None) -> str:
    """Human-readable label for normalized_text assembly (saia.py:1782-1791)."""
    if res is None:
        return fallback or "unknown"
    if res.display_name:
        return res.display_name
    if res.key:
        return humanize_label(res.key) or res.key
    if fallback:
        return humanize_label(fallback) or fallback
    return humanize_label(res.raw) or res.raw
