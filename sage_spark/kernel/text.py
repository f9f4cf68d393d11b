"""String primitives shared by the extraction kernel.

Reference parity: app/saia.py:2154-2160 (_normalize_whitespace, _slugify),
app/saia.py:1794-1807 (_humanize_entity_label), app/saia.py:497-501
(_prepare_text), app/services.py:1474-1476 (deterministic fallback summary).
"""

from __future__ import annotations

import re

_QUOTED_REPLY_RE = re.compile(r"(?m)^>.*$")
_WROTE_HEADER_RE = re.compile(r"(?im)^on .+ wrote:$")
_SLUG_RE = re.compile(r"[^a-z0-9]+")
_ALNUM_ID_RE = re.compile(r"[A-Za-z]*\d+[A-Za-z0-9_\-]*")
_SEP_SPLIT_RE = re.compile(r"[-_]+")


def collapse_ws(text: str | None) -> str:
    """Collapse any whitespace runs to single spaces (saia.py:2154-2155)."""
    return " ".join((text or "").split())


def slug(text: str | None) -> str:
    """Lowercase slug; empty input degrades to "unknown" (saia.py:2158-2160)."""
    value = _SLUG_RE.sub("-", (text or "").strip().lower())
    return value.strip("-") or "unknown"


def humanize_label(value: str | None) -> str | None:
    """Render an entity key for display (saia.py:1794-1807).

    Emails and alphanumeric ids pass through verbatim; dashed/underscored
    slugs are split and capitalized; all-lowercase words are title-cased.
    """
    if not value:
        return value
    text = str(value).strip()
    if not text:
        return text
    if "@" in text or _ALNUM_ID_RE.fullmatch(text):
        return text
    if "-" in text or "_" in text:
        parts = [p for p in _SEP_SPLIT_RE.split(text) if p]
        return " ".join(p.capitalize() if p.islower() else p for p in parts)
    if text.islower():
        return " ".join(tok.capitalize() for tok in text.split())
    return text


def clean_message_text(text: str) -> str:
    """Normalize curly quotes, drop quoted-reply lines, collapse whitespace.

    Byte-identical to the reference's pre-extraction cleanup
    (_prepare_text, saia.py:497-501).
    """
    out = text.replace("’", "'").replace("“", '"').replace("”", '"')
    out = _QUOTED_REPLY_RE.sub("", out)
    out = _WROTE_HEADER_RE.sub("", out)
    return " ".join(out.split())


def fallback_summary(text: str, max_chars: int = 600) -> str:
    """Deterministic no-LLM summary: collapse whitespace, first 600 chars
    (services.py:1474-1476). This is the summary semantics the engine
    standardizes on (the reference degrades to it without an API key)."""
    return collapse_ws(text)[:max_chars]
