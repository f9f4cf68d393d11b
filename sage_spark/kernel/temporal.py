"""Deterministic temporal-reference normalization.

Reference parity: app/saia.py:70-75 (patterns), 414-494
(normalize_temporal_reference), 2163-2175 (_parse_iso_datetime,
_next_weekday), 1697-1713 (_strip_temporal_tokens), 2134-2151
(_extract_temporal_expressions).

Not expressible as built-in Spark SQL (relative-day words, 12-hour clocks,
"next <weekday>" arithmetic), so it stays Python and runs vectorized inside
the Arrow-batched extraction kernel.
"""

from __future__ import annotations

import re
from datetime import date, datetime, time, timedelta, timezone
from functools import lru_cache

DEFAULT_TZ = "UTC"

WEEKDAY_INDEX = {
    "monday": 0,
    "tuesday": 1,
    "wednesday": 2,
    "thursday": 3,
    "friday": 4,
    "saturday": 5,
    "sunday": 6,
}

# saia.py:70-75 — the exact temporal surface the reference recognizes.
TIME_WORD_RE = re.compile(
    r"\b(today|tomorrow|yesterday|now|next\s+(?:monday|tuesday|wednesday|thursday|friday|saturday|sunday)"
    r"|in\s+\d+\s+(?:day|days|week|weeks)|\d{4}-\d{2}-\d{2})\b",
    re.IGNORECASE,
)
CLOCK_RE = re.compile(r"\b(?P<hour>\d{1,2})(?::(?P<minute>\d{2}))?\s*(?P<ampm>am|pm)\b", re.IGNORECASE)
AT_CLOCK_RE = re.compile(r"\bat\s+(?P<hour>\d{1,2})(?::(?P<minute>\d{2}))?\s*(?P<ampm>am|pm)?\b", re.IGNORECASE)

_ISO_DATE_RE = re.compile(r"\b(\d{4}-\d{2}-\d{2})\b")
_NEXT_WEEKDAY_RE = re.compile(r"\bnext\s+(monday|tuesday|wednesday|thursday|friday|saturday|sunday)\b")
_IN_N_UNITS_RE = re.compile(r"\bin\s+(\d+)\s+(day|days|week|weeks)\b")

# saia.py:1697-1709 — preposition prefixes dropped together with the time word.
_PREP_BEFORE_DATEWORD_RE = re.compile(
    r"\b(?:by|before|after|at|on|around)\s+"
    r"(?=(?:today|tomorrow|yesterday|now|next\s+(?:monday|tuesday|wednesday|thursday|friday|saturday|sunday)"
    r"|in\s+\d+\s+(?:day|days|week|weeks)|\d{4}-\d{2}-\d{2})\b)",
    re.IGNORECASE,
)
_PREP_BEFORE_CLOCK_RE = re.compile(
    r"\b(?:by|before|after|at|on|around)\s+(?=\d{1,2}(?::\d{2})?\s*(?:am|pm)\b)",
    re.IGNORECASE,
)


@lru_cache(maxsize=4096)
def parse_iso_utc(value: str) -> datetime:
    """ISO-8601 parse with Z suffix support; naive values assumed UTC
    (saia.py:2163-2169). Cached: every claim of a document resolves against
    the same sent_at anchor, and datetime is immutable so sharing is safe."""
    if value.endswith("Z"):
        value = value[:-1] + "+00:00"
    dt = datetime.fromisoformat(value)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt.astimezone(timezone.utc)


def next_weekday_after(start: date, weekday: int) -> date:
    """Next strictly-future occurrence of ``weekday`` (saia.py:2172-2175)."""
    delta = (weekday - start.weekday()) % 7
    return start + timedelta(days=7 if delta == 0 else delta)


_RESOLVE_MEMO: dict = {}
_EXPR_MEMO: dict = {}
_TEMPORAL_MEMO_MAX = 1 << 15


def resolve_temporal(text: str, anchor_iso: str, tz_name: str = DEFAULT_TZ) -> dict:
    """Memoizing wrapper around the pure resolution below: several claims of
    one span re-resolve the same (text, anchor) pair. Returns a fresh dict
    per call so callers can never alias each other's result."""
    key = (text, anchor_iso, tz_name)
    hit = _RESOLVE_MEMO.get(key)
    if hit is None:
        if len(_RESOLVE_MEMO) >= _TEMPORAL_MEMO_MAX:
            _RESOLVE_MEMO.clear()
        hit = _RESOLVE_MEMO[key] = _resolve_temporal(text, anchor_iso, tz_name)
    return dict(hit)


def _resolve_temporal(text: str, anchor_iso: str, tz_name: str = DEFAULT_TZ) -> dict:
    """Map a free-text temporal mention to {temporal_start, temporal_end,
    temporal_granularity, timezone} (saia.py:414-494).

    Rules, in precedence order: "now" -> anchor datetime; explicit
    YYYY-MM-DD; today/tomorrow/yesterday; "next <weekday>" (strictly
    future); "in N day(s)/week(s)". A clock mention (H[:MM] am/pm or
    "at H[:MM]") upgrades a resolved date to a UTC datetime; 12am -> 0,
    pm adds 12, hour > 23 falls back to date-only.
    """
    anchor = parse_iso_utc(anchor_iso)
    lowered = text.lower().strip()
    clock = CLOCK_RE.search(lowered) or AT_CLOCK_RE.search(lowered)

    if "now" in lowered:
        return {
            "temporal_start": anchor.isoformat(),
            "temporal_end": None,
            "temporal_granularity": "datetime",
            "timezone": tz_name,
        }

    day: date | None = None
    granularity = "unresolved"
    explicit = _ISO_DATE_RE.search(lowered)
    if explicit:
        # date.fromisoformat accepts exactly the strptime("%Y-%m-%d") surface
        # for \d{4}-\d{2}-\d{2} inputs (same values, same ValueError set) and
        # skips strptime's per-call format interpretation.
        day = date.fromisoformat(explicit.group(1))
        granularity = "date"
    elif "today" in lowered:
        day, granularity = anchor.date(), "date"
    elif "tomorrow" in lowered:
        day, granularity = anchor.date() + timedelta(days=1), "date"
    elif "yesterday" in lowered:
        day, granularity = anchor.date() - timedelta(days=1), "date"
    else:
        wk = _NEXT_WEEKDAY_RE.search(lowered)
        if wk:
            day, granularity = next_weekday_after(anchor.date(), WEEKDAY_INDEX[wk.group(1)]), "date"
        else:
            rel = _IN_N_UNITS_RE.search(lowered)
            if rel:
                n = int(rel.group(1))
                days = n * 7 if rel.group(2).startswith("week") else n
                day, granularity = anchor.date() + timedelta(days=days), "date"

    if day is None:
        return {
            "temporal_start": None,
            "temporal_end": None,
            "temporal_granularity": "unresolved",
            "timezone": tz_name,
        }

    if clock:
        hour = int(clock.group("hour"))
        minute = int(clock.group("minute") or 0)
        ampm = (clock.group("ampm") or "").lower()
        if hour > 23:
            return {
                "temporal_start": day.isoformat(),
                "temporal_end": None,
                "temporal_granularity": granularity,
                "timezone": tz_name,
            }
        if ampm == "pm" and hour < 12:
            hour += 12
        if ampm == "am" and hour == 12:
            hour = 0
        stamped = datetime.combine(day, time(hour=hour, minute=minute, tzinfo=timezone.utc))
        return {
            "temporal_start": stamped.isoformat(),
            "temporal_end": None,
            "temporal_granularity": "datetime",
            "timezone": tz_name,
        }

    return {
        "temporal_start": day.isoformat(),
        "temporal_end": None,
        "temporal_granularity": granularity,
        "timezone": tz_name,
    }


def temporal_expressions(text: str) -> list[str]:
    """Memoizing wrapper (fresh list per call) — see resolve_temporal."""
    hit = _EXPR_MEMO.get(text)
    if hit is None:
        if len(_EXPR_MEMO) >= _TEMPORAL_MEMO_MAX:
            _EXPR_MEMO.clear()
        hit = _EXPR_MEMO[text] = _temporal_expressions(text)
    return list(hit)


def _temporal_expressions(text: str) -> list[str]:
    """Non-overlapping temporal surface forms in source order, longest-first
    on ties, case-insensitively deduped (saia.py:2134-2151)."""
    hits: list[tuple[int, int, str]] = []
    for pattern in (TIME_WORD_RE, AT_CLOCK_RE, CLOCK_RE):
        for m in pattern.finditer(text or ""):
            hits.append((m.start(), m.end(), m.group(0)))
    hits.sort(key=lambda h: (h[0], -(h[1] - h[0])))
    out: list[str] = []
    seen: set[str] = set()
    last_end = -1
    for start, end, raw in hits:
        key = raw.strip().lower()
        if start < last_end or key in seen:
            continue
        out.append(raw.strip())
        seen.add(key)
        last_end = end
    return out


def strip_temporal_tokens(text: str) -> str:
    """Remove temporal words/clocks plus their leading prepositions
    (saia.py:1697-1713); used to isolate commitment item text."""
    out = _PREP_BEFORE_DATEWORD_RE.sub("", text)
    out = _PREP_BEFORE_CLOCK_RE.sub("", out)
    out = TIME_WORD_RE.sub("", out)
    out = CLOCK_RE.sub("", out)
    out = AT_CLOCK_RE.sub("", out)
    return " ".join(out.split())
