"""Read-side (retrieval) semantics: query classification, focus terms,
ranking boosts, merge/combine, answer-mode selection.

Reference parity: app/services.py:173-307 (patterns + stoplist), 412-503
(_classify_query, answer-mode selectors), 586-605 (recency boost), 720-722
(_result_rank_value), 724-755 (_extract_query_focus_terms), 795-821 (search
text + focus score), 876-982 (merge/combine + rank preparation).

These are pure functions over plain dict rows; operators/retrieval.py maps
the same scoring onto DataFrames for the distributed path. The LLM answer
generation is out of scope — the deterministic fallback contract stands in.
"""

from __future__ import annotations

import math
import re
from datetime import datetime, timezone
from typing import Any, Dict, List, Optional, Tuple

RECENCY_BOOST_MAX = 0.18
RECENCY_DECAY_DAYS = 21.0

FIRST_PERSON_RE = re.compile(r"\b(i|me|my|mine|myself)\b", re.IGNORECASE)
TASK_LOOKUP_RE = re.compile(
    r"\b("
    r"promise|promised|commit|committed|commitment|agreed|supposed to|meant to|"
    r"assigned|assignment|working on|responsible for|deadline|due|by when|"
    r"send|share|deliver|submit|upload|provide|finish|complete"
    r")\b",
    re.IGNORECASE,
)
COMPOUND_LOOKUP_RE = re.compile(r"\b(what|when|who|whom|which)\b", re.IGNORECASE)
DIRECT_LOOKUP_PREFIX_RE = re.compile(
    r"^\s*(who|whom|what|when|which|did|do|does|is|are|was|were|am|can)\b", re.IGNORECASE
)
NAME_RE = re.compile(r"\b[A-Z][a-z]+(?:\s+[A-Z][a-z]+){0,2}\b")
EMAIL_RE = re.compile(r"\b[A-Z0-9._%+\-]+@[A-Z0-9.\-]+\.[A-Z]{2,}\b", re.IGNORECASE)
TOKEN_RE = re.compile(r"\b[a-zA-Z][a-zA-Z0-9_\-]{2,}\b")

TASK_LIKE_FACT_TYPES = {"TASK_ASSIGNMENT", "ASSIGNMENT_STATE", "MEETING_EVENT"}
FACT_PRIORITY_QUERY_TYPES = {"task_commitment_lookup"}

SHORT_OVERRIDES = ("brief", "short", "quick answer", "one line", "tl;dr")
LONG_OVERRIDES = (
    "detailed", "explain", "walk me through", "summarize", "summary", "compare",
    "audit", "anything about", "everything", "provenance", "all mentions", "overview",
)
BROAD_SCOPE = (
    "anything about", "everything", "all mentions", "overview", "walk me through",
    "all dashboard-related conversations", "everything we know",
)

FOCUS_STOPWORDS = {
    "a", "an", "the", "to", "for", "with", "by", "on", "in", "of", "and", "or",
    "from", "into", "about", "me", "my", "mine", "you", "your", "yours", "was",
    "were", "be", "been", "being", "now", "that", "this", "these", "those",
    "who", "whom", "what", "when", "where", "why", "how", "does", "do", "did",
    "is", "are", "am", "can", "will", "would", "should", "could", "tell",
    "show", "give", "anything", "everything", "asked", "ask", "asking",
    "request", "requested", "requesting", "send", "sending", "share",
    "sharing", "provide", "providing", "deliver", "delivering", "review",
    "reviewing", "report", "reports", "reporting", "current", "currently",
}


def _norm(text: str) -> str:
    return " ".join((text or "").lower().split())


def _has_phrase(text: str, phrases: tuple[str, ...]) -> bool:
    n = _norm(text)
    return any(p in n for p in phrases)


def _is_task_lookup(text: str) -> bool:
    lowered = text.lower()
    if not TASK_LOOKUP_RE.search(text):
        return False
    if any(
        t in lowered
        for t in (
            "promise", "promised", "supposed to", "assigned", "assignment",
            "working on", "responsible for", "deadline", "due", "by when",
        )
    ):
        return True
    return bool(FIRST_PERSON_RE.search(text)) and any(
        t in lowered for t in ("what", "which", "when", "am i", "did i", "do i", "have i")
    )


def _is_compound_lookup(text: str) -> bool:
    n = _norm(text)
    if n.count("?") > 1:
        return True
    interrogatives = {m.group(1).lower() for m in COMPOUND_LOOKUP_RE.finditer(text or "")}
    if len(interrogatives) >= 2:
        return True
    return "who all" in n and any(t in interrogatives for t in {"what", "when", "which"})


def classify_query(text: str) -> str:
    """F10 (services.py:444-458)."""
    lowered = text.lower()
    if _is_task_lookup(text):
        return "task_commitment_lookup"
    if _is_compound_lookup(text):
        return "compound_lookup"
    if FIRST_PERSON_RE.search(text):
        return "personal_context"
    if any(t in lowered for t in ("weekend", "today", "tomorrow", "schedule", "meeting", "plan")):
        return "schedule_or_timeline"
    if any(t in lowered for t in ("why", "reason", "cause", "delayed")):
        return "explanation"
    if any(t in lowered for t in ("who", "whose", "person", "people")):
        return "person_lookup"
    return "general_search"


def focus_terms(query: str) -> List[str]:
    """F11 (services.py:724-755): emails, capitalized 1-3-grams, then plain
    tokens ≥3 chars, stoplist-filtered, order-preserving dedupe."""
    out: List[str] = []
    seen: set[str] = set()
    for m in EMAIL_RE.finditer(query or ""):
        term = m.group(0).strip().lower()
        if term and term not in seen:
            out.append(term)
            seen.add(term)
    for m in NAME_RE.finditer(query or ""):
        raw = m.group(0).strip()
        if not raw:
            continue
        term = raw.lower()
        if term in FOCUS_STOPWORDS:
            continue
        if len(raw.split()) == 1 and raw.lower() in FOCUS_STOPWORDS:
            continue
        if term not in seen:
            out.append(term)
            seen.add(term)
    for m in TOKEN_RE.finditer(query or ""):
        term = m.group(0).strip().lower()
        if len(term) < 3 or term in FOCUS_STOPWORDS:
            continue
        if term not in seen:
            out.append(term)
            seen.add(term)
    return out


def _is_broad(text: str, query_type: Optional[str]) -> bool:
    if query_type in ("compound_lookup", "explanation"):
        return True
    return _has_phrase(text, LONG_OVERRIDES) or _has_phrase(text, BROAD_SCOPE)


def _is_direct(text: str, query_type: Optional[str]) -> bool:
    if query_type == "compound_lookup":
        return False
    if query_type in FACT_PRIORITY_QUERY_TYPES:
        return True
    if query_type in {"schedule_or_timeline", "person_lookup"} and DIRECT_LOOKUP_PREFIX_RE.search(text):
        return True
    return bool(DIRECT_LOOKUP_PREFIX_RE.search(text)) and not _is_broad(text, query_type)


def select_answer_mode(query: str, trace: Optional[Dict[str, Any]] = None) -> Tuple[str, str]:
    """Answer-mode selector (services.py:484-503)."""
    query_type = (trace or {}).get("query_type")
    result_count = int((trace or {}).get("result_count") or 0)
    max_hop_count = int((trace or {}).get("max_hop_count") or 0)
    if _has_phrase(query, SHORT_OVERRIDES):
        return "short", "explicit_short"
    if _has_phrase(query, LONG_OVERRIDES):
        return "long", "explicit_long"
    if query_type == "compound_lookup":
        return "long", "evidence_complexity"
    if _is_broad(query, query_type):
        return "long", "broad_or_explanatory"
    if _is_direct(query, query_type):
        return "short", "direct_lookup"
    if result_count > 2 or max_hop_count > 1:
        return "long", "evidence_complexity"
    return "short", "direct_lookup"


_HASH_RE = re.compile(r"[0-9a-f]{32,64}")
_NUMERIC_RE = re.compile(r"[0-9]+")
_HAS_ALPHA_RE = re.compile(r"[a-zA-Z]")
ISO_OFFSET_TS_RE = re.compile(
    r"\b\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:\d{2})\b"
)


def is_displayable_trace_entity(value: Any) -> bool:
    """P8 (services.py:758-780): drop ids, hashes, machine keys from
    user-facing trace output."""
    text = str(value or "").strip()
    if not text:
        return False
    lowered = text.lower()
    if lowered in {"currentuser", "unknown", "node", "group", "sage"}:
        return False
    if lowered.startswith("chat message "):
        return False
    if lowered.startswith("chat-msg-") or "-chunk-" in lowered:
        return False
    if lowered.startswith(("assignment::", "meeting::", "reports_to::")):
        return False
    if lowered.startswith(("direct:", "group", "message-attachment-")):
        return False
    if _NUMERIC_RE.fullmatch(text):
        return False
    if _HASH_RE.fullmatch(lowered):
        return False
    return bool(_HAS_ALPHA_RE.search(text))


def format_timestamp_ist(value: str) -> str:
    """F6 (services.py:572-583): render an ISO timestamp as
    '%Y-%m-%d %I:%M %p IST' (Asia/Kolkata); non-parseable input passes
    through."""
    from zoneinfo import ZoneInfo

    parsed = parse_iso_any(value)
    if parsed is None:
        return value
    return parsed.astimezone(ZoneInfo("Asia/Kolkata")).strftime("%Y-%m-%d %I:%M %p IST")


def convert_iso_timestamps_to_ist(text: str) -> str:
    """F6 presentation rule over free text (services.py:578-583)."""
    if not text:
        return text
    return ISO_OFFSET_TS_RE.sub(lambda m: format_timestamp_ist(m.group(0)), text)


def parse_iso_any(value: Any) -> Optional[datetime]:
    text = str(value or "").strip()
    if not text:
        return None
    try:
        parsed = datetime.fromisoformat(text.replace("Z", "+00:00"))
    except ValueError:
        return None
    if parsed.tzinfo is None:
        parsed = parsed.replace(tzinfo=timezone.utc)
    return parsed.astimezone(timezone.utc)


def recency_boost(timestamp: Optional[datetime], now: datetime) -> float:
    """services.py:586-605."""
    if timestamp is None:
        return 0.0
    age_days = max((now - timestamp).total_seconds() / 86400.0, 0.0)
    return RECENCY_BOOST_MAX * math.exp(-age_days / RECENCY_DECAY_DAYS)


def rank_value(item: Dict[str, Any]) -> float:
    return float(item.get("rank_score", item.get("similarity", 0)) or 0)


def _search_text(row: Dict[str, Any]) -> str:
    doc = row.get("d") or {}
    fact = row.get("f") or {}
    fields: List[str] = []
    for value in (
        row.get("chunk_summary"),
        row.get("fact_summary"),
        doc.get("subject"),
        doc.get("sender"),
        doc.get("doc_id"),
        fact.get("canonical_key"),
        fact.get("subject_key"),
        fact.get("subject_entity_id"),
        fact.get("object_key"),
        fact.get("object_entity_id"),
        fact.get("claim_type"),
    ):
        if value:
            fields.append(str(value))
    return " ".join(fields).lower()


def focus_match_score(row: Dict[str, Any], terms: List[str]) -> int:
    if not terms:
        return 0
    haystack = _search_text(row)
    return sum(1 for term in terms if term in haystack)


def _row_recency_ts(row: Dict[str, Any]) -> Optional[datetime]:
    doc = row.get("d") or {}
    fact = row.get("f") or {}
    for candidate in (doc.get("timestamp"), fact.get("last_seen_at"), fact.get("first_seen_at")):
        parsed = parse_iso_any(candidate)
        if parsed is not None:
            return parsed
    return None


def rank_chunk_row(
    row: Dict[str, Any],
    *,
    now: datetime,
    terms: Optional[List[str]] = None,
    reports_to_lookup: bool = False,
) -> Dict[str, Any]:
    """R6 (services.py:898-916)."""
    ranked = dict(row)
    fscore = focus_match_score(row, list(terms or []))
    boost = recency_boost(_row_recency_ts(row), now)
    score = float(row.get("similarity", 0) or 0)
    if fscore:
        score += 0.35 * fscore
    if reports_to_lookup and "reports to" in str(row.get("chunk_summary") or "").lower():
        score += 0.3
    score += boost
    ranked.update(focus_match_score=fscore, recency_boost=boost, rank_score=score)
    return ranked


def rank_fact_row(
    row: Dict[str, Any],
    *,
    now: datetime,
    query_type: str,
    user_id: Optional[str],
    personalized_lookup: bool,
    exact_match: bool = False,
    terms: Optional[List[str]] = None,
    reports_to_lookup: bool = False,
) -> Dict[str, Any]:
    """R7 (services.py:919-958)."""
    ranked = dict(row)
    fact = row.get("f") or {}
    boost = recency_boost(_row_recency_ts(row), now)
    score = float(row.get("similarity", 0) or 0)
    fscore = focus_match_score(row, list(terms or []))
    if fact.get("status") == "current":
        score += 0.05
    if exact_match:
        score += 0.75
    if query_type in FACT_PRIORITY_QUERY_TYPES and fact.get("claim_type") in TASK_LIKE_FACT_TYPES:
        score += 0.35
    if personalized_lookup:
        subj = fact.get("subject_entity_id") or fact.get("subject_key")
        obj = fact.get("object_entity_id") or fact.get("object_key")
        if subj and user_id and str(subj).strip().lower() == str(user_id).strip().lower():
            score += 0.25
        elif obj and user_id and str(obj).strip().lower() == str(user_id).strip().lower():
            score += 0.1
    if fscore:
        score += 0.35 * fscore
    if reports_to_lookup and fact.get("claim_type") == "REPORTS_TO":
        score += 0.4
    score += boost
    ranked.update(focus_match_score=fscore, recency_boost=boost, rank_score=score)
    return ranked


def merge_ranked(primary: List[Dict[str, Any]], secondary: List[Dict[str, Any]], limit: int = 5) -> List[Dict[str, Any]]:
    """R8 (services.py:876-891): dedupe by identifier keeping arg-max rank."""
    by_id: Dict[str, Dict[str, Any]] = {}
    for row in primary + secondary:
        ident = str(
            row.get("fact_id") or row.get("chunk_id") or row.get("canonical_key") or row.get("fact_summary") or ""
        )
        cur = by_id.get(ident)
        if cur is None or rank_value(row) > rank_value(cur):
            by_id[ident] = row
    merged = list(by_id.values())
    merged.sort(key=rank_value, reverse=True)
    return merged[:limit]


def combine_ranked(
    vector_results: List[Dict[str, Any]],
    fact_results: List[Dict[str, Any]],
    *,
    query_type: str,
    terms: Optional[List[str]] = None,
    limit: int = 5,
) -> List[Dict[str, Any]]:
    """R9 (services.py:961-982)."""
    if query_type in FACT_PRIORITY_QUERY_TYPES and fact_results:
        combined = fact_results[:limit]
        remaining = max(limit - len(combined), 0)
        if remaining:
            combined.extend(vector_results[:remaining])
        return combined[:limit]
    combined = vector_results + fact_results
    if query_type == "person_lookup" and terms:
        focused = [i for i in combined if int(i.get("focus_match_score") or 0) > 0]
        if focused:
            combined = focused
    combined.sort(key=rank_value, reverse=True)
    return combined[:limit]
