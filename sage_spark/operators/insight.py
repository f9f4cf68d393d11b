"""Message-insight surface: evidence assembly + display decoration as
DataFrame operators.

The reference's insight endpoint (app/saia.py:1278-1460) walks, per message:
evidence documents (``d.doc_id = 'chat-msg-'+m OR d.origin_message_id = m
OR d.linked_message_id = m``, ordered ``d.timestamp ASC``), their claims
(ordered ``c.created_at ASC``), the SUPPORTS/CONTRADICTS links to canonical
facts, and supersedence replacements (``(previous)-[:SUPERSEDED_BY]->
(replacement)``) — then rewrites entity ids to display names
(saia.py:1998-2084). Here the walk is a join pipeline over the node/edge
tables and the display rewrite is pure column arithmetic, so the whole
surface runs for EVERY message in one distributed pass instead of one
Cypher round-trip per message:

* ``evidence_links``      — map-side derivation of (message_id, doc_id)
  from the three link forms; no shuffle.
* ``message_insight``     — links ⋈ claims (doc_id) ⟕ fact edges
  (claim_id) ⟕ facts (fact_id) ⟕ previous-facts (superseded_by): all
  key-partitioned shuffles, no collect, no per-message loop.
* ``with_display_labels`` / ``with_display_text`` — the saia.py:1964-2084
  decoration as Spark columns: the display-name dim broadcasts (it is the
  collected-entity slice, not the full entity table; use
  operators/linking.py's salted join if a deployment really needs the full
  dim), labels fall back through humanized keys, and the per-claim-type
  sentence templates are one CASE expression. The serial kernel twin
  (kernel/insight.py) is the differential oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_CHAT_PREFIX = "chat-msg-"
_MAXLEN = 2147483647


def evidence_links(
    documents: DataFrame,
    *,
    id_col: str = "doc_id",
    ts_col: str = "timestamp",
) -> DataFrame:
    """(message_id, doc_id, doc_timestamp): one row per evidence relation,
    derived from the reference's three link forms (saia.py:1296-1302).
    Pure projection + explode — runs map-side at scan speed."""
    cols = set(documents.columns)
    forms = [
        F.when(
            F.col(id_col).startswith(_CHAT_PREFIX),
            F.substring(F.col(id_col), len(_CHAT_PREFIX) + 1, _MAXLEN),
        )
    ]
    for link_col in ("origin_message_id", "linked_message_id"):
        if link_col in cols:
            forms.append(F.col(link_col))
    return (
        documents.select(
            F.col(id_col).alias("doc_id"),
            (F.col(ts_col) if ts_col in cols else F.lit(None).cast("string")).alias(
                "doc_timestamp"
            ),
            F.explode(F.array_distinct(F.array(*forms))).alias("message_id"),
        )
        .filter(F.col("message_id").isNotNull() & (F.col("message_id") != ""))
    )


def message_insight(
    documents: DataFrame,
    claims: DataFrame,
    claim_fact_edges: DataFrame,
    facts: DataFrame,
    messages: DataFrame | None = None,
) -> DataFrame:
    """Per-claim insight rows for every message (saia.py:1296-1410): one row
    per (message, evidence doc, claim, fact link[, superseded predecessor]);
    claims with no promoted fact keep a row with null fact fields. Pass
    ``messages`` (message_id) to scope the walk — it semi-joins (broadcast
    for a UI-sized list) before any wide join."""
    links = evidence_links(documents)
    if messages is not None:
        links = links.join(
            F.broadcast(messages.select("message_id").distinct()), "message_id", "left_semi"
        )
    # decorated display columns ride along when present: claim_id is NOT
    # unique across near-duplicate extractions (the reference's identity
    # excludes temporal spans), so joining decoration back by claim_id
    # would cross-product those rows — decorate claims BEFORE this walk
    extra = [
        c
        for c in ("subject_display", "object_display", "display_text")
        if c in claims.columns
    ]
    claim_cols = claims.select(
        F.col("doc_id"),
        F.col("claim_id"),
        F.col("claim_type"),
        F.col("normalized_text"),
        F.col("created_at").alias("claim_created_at"),
        *extra,
    )
    edges = claim_fact_edges.select("claim_id", "fact_id", "relation_type")
    fact_cols = facts.select(
        F.col("fact_id"),
        F.col("canonical_key"),
        F.col("summary").alias("fact_summary"),
        F.col("status").alias("fact_status"),
        F.col("support_count"),
        F.col("superseded_by_fact_id"),
    )
    # replacements: previous facts pointing at a fact this claim SUPPORTS
    prev = facts.select(
        F.col("superseded_by_fact_id").alias("__replacement_id"),
        F.col("fact_id").alias("previous_fact_id"),
        F.col("summary").alias("previous_summary"),
        F.col("status").alias("previous_status"),
        F.col("superseded_at").alias("previous_superseded_at"),
    ).filter(F.col("__replacement_id").isNotNull())
    out = (
        links.withColumnRenamed("doc_id", "source_doc_id")
        .join(claim_cols.withColumnRenamed("doc_id", "source_doc_id"), "source_doc_id")
        .join(edges, "claim_id", "left")
        .join(fact_cols, "fact_id", "left")
        .join(
            prev,
            (F.col("relation_type") == "SUPPORTS")
            & (F.col("__replacement_id") == F.col("fact_id")),
            "left",
        )
        .drop("__replacement_id")
    )
    return out.select(
        "message_id",
        "source_doc_id",
        "doc_timestamp",
        "claim_id",
        "claim_created_at",
        "claim_type",
        "normalized_text",
        *extra,
        "relation_type",
        "fact_id",
        "canonical_key",
        "fact_summary",
        "fact_status",
        "support_count",
        "superseded_by_fact_id",
        "previous_fact_id",
        "previous_summary",
        "previous_superseded_at",
    )


def _nonempty(c: Column) -> Column:
    return F.when(c.isNotNull() & (c != ""), c)


def humanize_label_col(c: Column) -> Column:
    """Column form of kernel humanize_label (reference saia.py:1794-1807):
    emails/alnum-ids verbatim; dashed/underscored slugs split + capitalized;
    all-lowercase text title-cased. ASCII-faithful to the kernel
    (parity-tested); exotic non-ASCII title-case mappings (Python's
    str.capitalize uses titlecase, JVM upper does not) may differ — entity
    keys/slugs in this pipeline are ASCII."""
    t = F.trim(c.cast("string"))

    def cap_if_lower(p: Column) -> Column:
        is_lower = (p == F.lower(p)) & (F.lower(p) != F.upper(p))
        capped = F.concat(F.upper(F.substring(p, 1, 1)), F.substring(p, 2, _MAXLEN))
        return F.when(is_lower, capped).otherwise(p)

    dashed = F.concat_ws(
        " ",
        F.transform(
            F.filter(F.split(t, "[-_]+"), lambda p: p != ""),
            cap_if_lower,
        ),
    )
    lowered = F.concat_ws(" ", F.transform(F.split(t, r"\s+"), cap_if_lower))
    return (
        F.when(c.isNull(), c)
        .when(t == "", t)
        .when(t.contains("@") | t.rlike(r"^[A-Za-z]*\d+[A-Za-z0-9_\-]*$"), t)
        .when(t.rlike("[-_]"), dashed)
        .when((t == F.lower(t)) & (F.lower(t) != F.upper(t)), lowered)
        .otherwise(t)
    )


def with_display_labels(
    records: DataFrame,
    names: DataFrame,
    *,
    roles: tuple[str, ...] = ("subject", "object"),
) -> DataFrame:
    """Adds ``{role}_display`` per role (saia.py:1964-1980): resolved name
    by entity id, then by key, then humanized key, then humanized raw.
    ``names`` is (entity_id, display_name) — the collected-entity slice,
    broadcast to both lookups."""
    out = records
    dim = F.broadcast(
        names.select(
            F.col("entity_id").alias("__nm_id"), F.col("display_name").alias("__nm_val")
        ).dropDuplicates(["__nm_id"])
    )
    for role in roles:
        eid, key = F.col(f"{role}_entity_id"), F.col(f"{role}_key")
        raw_col = f"{role}_raw"
        raw = F.col(raw_col) if raw_col in records.columns else F.lit(None).cast("string")
        out = (
            out.join(dim, _nonempty(eid) == F.col("__nm_id"), "left")
            .withColumnRenamed("__nm_val", "__by_id")
            .drop("__nm_id")
            .join(dim, _nonempty(key) == F.col("__nm_id"), "left")
            .withColumnRenamed("__nm_val", "__by_key")
            .drop("__nm_id")
            .withColumn(
                f"{role}_display",
                F.coalesce(
                    _nonempty(F.col("__by_id")),
                    _nonempty(F.col("__by_key")),
                    F.when(_nonempty(key).isNotNull(), humanize_label_col(key)),
                    F.when(_nonempty(raw).isNotNull(), humanize_label_col(raw)),
                ),
            )
            .drop("__by_id", "__by_key")
        )
    return out


def _collapse_ws(c: Column) -> Column:
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def with_display_text(records: DataFrame, out_col: str = "display_text") -> DataFrame:
    """The per-claim-type display sentence (saia.py:2032-2084) as one CASE
    column. Requires ``subject_display``/``object_display`` (see
    with_display_labels); payload fields come from ``payload_json`` via
    get_json_object — all JVM-side, no Python in the row path."""
    subject = F.coalesce(_nonempty(F.col("subject_display")), F.lit("Unknown"))
    obj = _nonempty(F.col("object_display"))
    value_text = _nonempty(F.col("value_text"))
    temporal = _nonempty(F.col("temporal_start"))
    payload = F.col("payload_json")
    verb = _nonempty(F.get_json_object(payload, "$.verb"))
    implicit = F.when(verb.isin("send", "share", "provide", "deliver"), F.lit("to")).when(
        verb.isin("review", "discuss", "confirm"), F.lit("with")
    )
    relation = F.coalesce(_nonempty(F.get_json_object(payload, "$.recipient_relation")), implicit)

    task = F.concat(
        subject,
        F.lit(" will "),
        F.coalesce(value_text, verb, F.lit("do")),
        F.when(
            obj.isNotNull(),
            F.when(relation.isNotNull(), F.concat(F.lit(" "), relation, F.lit(" "), obj))
            .otherwise(F.concat(F.lit(" "), obj)),
        ).otherwise(F.lit("")),
        F.when(temporal.isNotNull(), F.concat(F.lit(" on "), temporal)).otherwise(F.lit("")),
    )
    reports = F.concat(subject, F.lit(" reports to "), F.coalesce(obj, F.lit("Unknown")))
    approval = F.concat(
        subject,
        F.lit(" is approved"),
        F.when(obj.isNotNull(), F.concat(F.lit(" by "), obj)).otherwise(F.lit("")),
    )
    status = F.concat(subject, F.lit(" is "), F.coalesce(value_text, F.lit("updated")))
    assignment = F.concat(
        subject,
        F.when(F.col("value_text") == "inactive", F.lit(" is no longer assigned to ")).otherwise(
            F.lit(" is assigned to ")
        ),
        F.coalesce(
            obj,
            _nonempty(humanize_label_col(F.get_json_object(payload, "$.assignment_target"))),
            F.lit("Unknown"),
        ),
    )
    meeting = F.concat(
        F.coalesce(value_text, F.lit("meeting")),
        F.when(temporal.isNotNull(), F.concat(F.lit(" scheduled for "), temporal)).otherwise(
            F.lit("")
        ),
    )
    request = F.concat(
        subject,
        F.lit(" requested"),
        F.when(obj.isNotNull(), F.concat(F.lit(" "), obj)).otherwise(F.lit("")),
        F.when(value_text.isNotNull(), F.concat(F.lit(" to "), value_text)).otherwise(F.lit("")),
    )
    fallback_cols = [
        _nonempty(F.col(c))
        for c in ("normalized_text", "summary")
        if c in records.columns
    ]
    fallback = F.coalesce(*fallback_cols, value_text, F.lit("Unknown"))
    ct = F.col("claim_type")
    return records.withColumn(
        out_col,
        F.when(ct == "TASK_ASSIGNMENT", _collapse_ws(task))
        .when(ct == "REPORTS_TO", _collapse_ws(reports))
        .when(ct == "APPROVAL_STATE", approval)
        .when(ct == "STATUS_UPDATE", _collapse_ws(status))
        .when(ct == "ASSIGNMENT_STATE", _collapse_ws(assignment))
        .when(ct == "MEETING_EVENT", meeting)
        .when(ct == "REQUEST", _collapse_ws(request))
        .otherwise(fallback),
    )
