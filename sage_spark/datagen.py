"""Deterministic synthetic webtext + persons-dimension generator.

Per BASELINE.json input_hint the engine's input is an Iceberg table of
Common-Crawl-style pages (url, warc_ts, html, text, lang) with grounding
sidecar columns; this module synthesizes that table at any scale, fully
deterministically (every value derives from sha256(seed, row-id), never from
Python's RNG state or partitioning), so tests, the DuckDB oracle, and the
two-parallelism bench all see identical bytes.

Skew knobs mirror real web corpora: a log-uniform (zipf-like) mention
distribution over persons produces hub entities, and a skewed domain choice
produces hot domains — the bench exercises the salting/AQE paths with them.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta, timezone
from html import escape
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from .schema import PERSONS_SCHEMA, WEBTEXT_SCHEMA

_FIRST = ["Alice", "Bob", "Carol", "David", "Eva", "Frank", "Grace", "Henry", "Irene", "Jack",
          "Kara", "Liam", "Mona", "Nate", "Olga", "Paul", "Quinn", "Rita", "Sam", "Tina"]
_LAST = ["Johnson", "Smith", "Williams", "Lee", "Brown", "Davis", "Miller", "Wilson", "Moore",
         "Taylor", "Anderson", "Thomas", "Jackson", "White", "Harris", "Martin", "Garcia",
         "Clark", "Lewis", "Walker"]
_ROLES = ["Project Manager", "Software Engineer", "Data Analyst", "Team Lead", "HR Manager",
          "Designer", "QA Engineer", "Architect", "Product Owner", "SRE"]
_PROJECTS = ["Project Phoenix", "Project Alpha", "Project Atlas", "the data warehouse migration",
             "the billing revamp", "the mobile app", "Project Borealis", "the search overhaul"]
_SYSTEMS = ["server", "API gateway", "deployment pipeline", "ingestion job", "billing service",
            "auth service", "search cluster", "message queue"]
_STATUSES = ["down", "on track", "delayed", "blocked", "pending", "degraded", "up", "complete"]
_ITEMS = ["report", "budget sheet", "design doc", "quarterly summary", "roadmap", "slide deck",
          "test plan", "security review", "handover notes"]
_VERBS = ["send", "share", "review", "prepare", "update", "deliver", "discuss", "confirm", "provide"]
_WHEN = ["tomorrow", "today", "by 5pm today", "by 9am tomorrow", "next Monday", "next Friday",
         "in 3 days", "in 2 weeks", "on 2026-05-04", ""]
_NOISE = [
    "Thanks for the quick turnaround on this.",
    "Let me know if anything else is needed.",
    "The weather has been great this week.",
    "Looping in the rest of the team for visibility.",
    "See the attached notes for additional context.",
    "This aligns with what we discussed earlier.",
]
_DOMAINS = ["corp.example", "mail.example", "intranet.example", "wiki.example",
            "chat.example", "hub.example", "docs.example", "portal.example"]
_EPOCH = datetime(2026, 3, 1, tzinfo=timezone.utc)


def _h(seed: int, *parts: object) -> int:
    basis = "|".join([str(seed), *[str(p) for p in parts]])
    return int.from_bytes(hashlib.sha256(basis.encode()).digest()[:8], "big")


def _u(seed: int, *parts: object) -> float:
    return _h(seed, *parts) / 2**64


def _pick(options: list[str], seed: int, *parts: object) -> str:
    return options[_h(seed, *parts) % len(options)]


def _zipf_index(n: int, seed: int, *parts: object) -> int:
    """Log-uniform index in [0, n): rank 0 is drawn orders of magnitude more
    often than rank n-1 — the hub-entity skew knob."""
    u = _u(seed, *parts)
    return min(n - 1, int(n**u) - 1) if n > 1 else 0


def build_persons(n_persons: int = 50, seed: int = 7) -> list[dict]:
    rows: list[dict] = []
    for i in range(n_persons):
        first = _FIRST[_h(seed, "pf", i) % len(_FIRST)]
        last = _LAST[_h(seed, "pl", i) % len(_LAST)]
        rows.append(
            {
                "id": f"EMP{i + 1:03d}",
                "name": f"{first} {last}",
                "role": _ROLES[_h(seed, "pr", i) % len(_ROLES)],
                "email": f"{first.lower()}.{last.lower()}{i}@example.com",
                "is_user": _u(seed, "pu", i) < 0.5,
            }
        )
    if n_persons >= 2:
        # duplicate-name pair (distinct ids, one is_user) exercising the
        # preferred-record tie-break (reference tests/test_saia.py:320-383)
        rows[-1]["name"] = rows[-2]["name"]
        rows[-1]["is_user"] = True
        rows[-2]["is_user"] = False
    return rows


def _sentence(kind: str, seed: int, i: int, j: int, persons: list[dict], group_id: str | None) -> str:
    name = persons[_zipf_index(len(persons), seed, "m", i, j)]["name"]
    name2 = persons[_zipf_index(len(persons), seed, "m2", i, j)]["name"]
    emp = persons[_zipf_index(len(persons), seed, "e", i, j)]["id"]
    when = _pick(_WHEN, seed, "w", i, j)
    if kind == "commit_fp":
        verb = _pick(_VERBS, seed, "v", i, j)
        item = _pick(_ITEMS, seed, "it", i, j)
        return f"I'll {verb} the {item} to you {when}.".replace("  ", " ").replace(" .", ".")
    if kind == "commit_named":
        verb = _pick(_VERBS, seed, "v", i, j)
        item = _pick(_ITEMS, seed, "it", i, j)
        return f"{name} will {verb} the {item} {when}.".replace("  ", " ").replace(" .", ".")
    if kind == "reports":
        return f"{name} now reports to {name2}." if _u(seed, "rv", i, j) < 0.5 else f"{emp} reports to {name2}."
    if kind == "status":
        return f"The {_pick(_SYSTEMS, seed, 's', i, j)} is {_pick(_STATUSES, seed, 'st', i, j)}."
    if kind == "approval":
        item = _pick(_ITEMS, seed, "it", i, j)
        if _u(seed, "av", i, j) < 0.5:
            return f"The {item} is approved."
        return f"{name} approved the {item}."
    if kind == "assign":
        project = _pick(_PROJECTS, seed, "p", i, j)
        if _u(seed, "an", i, j) < 0.25:
            return f"{name} is no longer working on {project}."
        return f"{name} is assigned to {project}."
    if kind == "meeting":
        if _u(seed, "mv", i, j) < 0.5:
            return f"We have a meeting {when or 'tomorrow'} at 10."
        return f"Let's meet {when or 'next Monday'}."
    if kind == "request":
        verb = _pick(_VERBS, seed, "v", i, j)
        item = _pick(_ITEMS, seed, "it", i, j)
        return f"Can you {verb} the {item}?"
    return _pick(_NOISE, seed, "n", i, j)


_KINDS = ["commit_fp", "commit_named", "reports", "status", "approval", "assign",
          "meeting", "request", "noise", "noise"]


def make_page(i: int, seed: int, persons: list[dict], n_groups: int) -> dict:
    is_group = _u(seed, "cg", i) < 0.3
    group_id = f"grp{(_h(seed, 'g', i) % max(n_groups, 1)) + 1:03d}" if is_group else None
    sender_idx = _zipf_index(len(persons), seed, "snd", i)
    sender = persons[sender_idx]["id"]
    if is_group:
        receivers = sorted(
            {persons[_zipf_index(len(persons), seed, "rcv", i, k)]["id"] for k in range(3)} - {sender}
        )
        conversation_id = f"group:{group_id}"
        conversation_type = "group"
    else:
        rcv = persons[(sender_idx + 1 + _h(seed, "rcv", i) % (len(persons) - 1)) % len(persons)]["id"]
        receivers = [rcv]
        a, b = sorted([sender, rcv])
        conversation_id = f"direct:{a}:{b}"
        conversation_type = "direct"

    n_sentences = 2 + _h(seed, "ns", i) % 4
    sentences = [
        _sentence(_KINDS[_h(seed, "k", i, j) % len(_KINDS)], seed, i, j, persons, group_id)
        for j in range(n_sentences)
    ]
    text = "\n".join(" ".join(sentences[k : k + 2]) for k in range(0, len(sentences), 2))
    title = f"Message {i}"
    html = (
        f"<html><head><title>{escape(title)}</title><script>var _t={i};</script></head><body>"
        + "".join(f"<p>{escape(line)}</p>" for line in text.split("\n"))
        + "</body></html>"
    ).encode("utf-8")

    sent_at = _EPOCH + timedelta(seconds=_h(seed, "ts", i) % (45 * 24 * 3600))
    domain = _DOMAINS[_zipf_index(len(_DOMAINS), seed, "dom", i)]  # hot-domain skew
    lang = "en" if _u(seed, "lang", i) < 0.9 else _pick(["de", "fr", "es"], seed, "l2", i)
    return {
        "url": f"https://{domain}/{conversation_id.replace(':', '/')}/{i}",
        "warc_ts": sent_at.replace(tzinfo=None),
        "html": html,
        "text": text,
        "lang": lang,
        "sender_id": sender,
        "receiver_ids": receivers,
        "conversation_id": conversation_id,
        "conversation_type": conversation_type,
        "group_id": group_id,
        "message_id": f"m{i}",
        "source": "chat_message" if _u(seed, "src", i) < 0.8 else "message_attachment",
    }


def synth_webtext(
    spark: SparkSession,
    n_docs: int,
    n_persons: int = 50,
    n_groups: int = 8,
    seed: int = 7,
    partitions: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Distributed deterministic generation: every executor derives its rows
    purely from the row id, so output is identical at any parallelism."""
    persons = build_persons(n_persons, seed)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = [make_page(int(i), seed, persons, n_groups) for i in batch["id"]]
            yield pd.DataFrame(rows)

    base = spark.range(0, n_docs, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    webtext = base.mapInPandas(gen, schema=WEBTEXT_SCHEMA)
    persons_df = spark.createDataFrame(
        [(p["id"], p["name"], p["role"], p["email"], p["is_user"]) for p in persons],
        schema=PERSONS_SCHEMA,
    )
    return webtext, persons_df


def build_groups(n_groups: int = 8) -> list[dict]:
    return [{"id": f"grp{i + 1:03d}", "name": f"Team {i + 1}"} for i in range(n_groups)]


def synth_png_bytes(width: int, height: int, seed: int = 0) -> bytes:
    """A structurally valid 8-bit RGB PNG (signature + IHDR + IDAT + IEND,
    correct CRCs, zlib-compressed scanlines), pure stdlib — deterministic
    test payloads for the real container-header decode path
    (operators/multimodal.parse_image_header)."""
    import struct
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    row = bytes([seed % 256]) * (3 * width)
    raw = b"".join(b"\x00" + row for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def synth_gif_bytes(width: int, height: int, seed: int = 0) -> bytes:
    """A structurally valid GIF89a (logical screen descriptor with a 2-entry
    global color table, one image block with minimal LZW data, trailer)."""
    import struct

    lsd = struct.pack("<HHBBB", width, height, 0xF0, seed % 2, 0)  # GCT, 2 colors
    gct = bytes([seed % 256] * 3) + bytes([(255 - seed) % 256] * 3)
    img_desc = b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    # minimal LZW: min code size 2, one sub-block: clear(100) + end(101)
    lzw = b"\x02\x02\x44\x01\x00"
    return b"GIF89a" + lsd + gct + img_desc + lzw + b"\x3b"


def synth_media_payload(doc_id: int) -> bytes:
    """Deterministic media payload for the multimodal contract row: even
    doc_ids get a real PNG, odd ones a real GIF, dimensions derived from the
    id — one rule shared by the Spark query and its serial-replay oracle."""
    width = 1 + (doc_id * 7) % 64
    height = 1 + (doc_id * 11) % 64
    if doc_id % 2 == 0:
        return synth_png_bytes(width, height, doc_id)
    return synth_gif_bytes(width, height, doc_id)


def synth_wav_bytes(
    sample_rate: int, n_channels: int, bits: int, n_frames: int, seed: int = 0
) -> bytes:
    """A structurally valid PCM WAV container (RIFF header, canonical
    16-byte fmt chunk, data chunk), pure stdlib — deterministic test
    payloads for the real audio-header decode path
    (operators/multimodal.parse_audio_header). Sample bytes come from a
    seed-keyed LCG so content (and therefore the content hash) varies with
    the seed while every header field stays formula-derived."""
    import struct

    block_align = n_channels * (bits // 8)
    byte_rate = sample_rate * block_align
    n_data = n_frames * block_align
    data = bytes(((seed * 1103515245 + i * 12345 + 12345) >> 7) & 0xFF for i in range(n_data))
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate, byte_rate, block_align, bits)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", n_data)
        + data
        + (b"\x00" if n_data & 1 else b"")  # RIFF chunks are word-aligned
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


# audio parameter formulas — one rule shared by synth_audio_payload, the
# Spark contract query, and its serial-replay oracle (_expected_docs_dir)
_WAV_RATES = (8000, 16000, 22050, 44100)


def synth_audio_params(doc_id: int) -> tuple[int, int, int, int]:
    """(sample_rate, n_channels, bit_depth, n_frames) for a given id."""
    return (
        _WAV_RATES[doc_id % 4],
        1 + doc_id % 2,
        8 if doc_id % 3 == 0 else 16,
        50 + (doc_id * 13) % 200,
    )


def synth_audio_payload(doc_id: int) -> bytes:
    """Deterministic WAV payload for the multimodal audio contract row."""
    rate, channels, bits, frames = synth_audio_params(doc_id)
    return synth_wav_bytes(rate, channels, bits, frames, seed=doc_id)
