"""Distributed read-side retrieval (R1-R9 of SURVEY.md §2.6) over the
materialized KG tables.

The whole query path is a declarative DataFrame program: cosine scoring via
zip_with dot products, top-k via orderBy().limit() (Catalyst's
TakeOrderedAndProject — partitions forward only their local top-k), rank
boosts as column arithmetic, merge/dedupe as a window. Classification and
focus terms run driver-side on the (single) query string via the kernel —
they are O(query length), not data-sized.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..kernel.embed import hash_embedding
from ..kernel.retrieval import (
    FACT_PRIORITY_QUERY_TYPES,
    FIRST_PERSON_RE,
    RECENCY_BOOST_MAX,
    RECENCY_DECAY_DAYS,
    TASK_LIKE_FACT_TYPES,
    classify_query,
    focus_terms,
)
from .similarity import cosine_to_query


def _recency_boost_col(ts_col, now: datetime):
    age_days = (F.lit(now.timestamp()) - F.unix_timestamp(F.to_timestamp(ts_col))) / F.lit(86400.0)
    clamped = F.greatest(age_days, F.lit(0.0))
    return F.when(
        ts_col.isNotNull(), F.lit(RECENCY_BOOST_MAX) * F.exp(-clamped / F.lit(RECENCY_DECAY_DAYS))
    ).otherwise(F.lit(0.0))


def _focus_score_col(haystack, terms: list[str]):
    if not terms:
        return F.lit(0)
    lowered = F.lower(haystack)
    score = F.lit(0)
    for term in terms:
        score = score + F.when(lowered.contains(term.lower()), 1).otherwise(0)
    return score


def retrieve(
    chunks: DataFrame,
    documents: DataFrame,
    facts: DataFrame,
    query_text: str,
    *,
    user_id: str | None = None,
    now: datetime,
    edges: DataFrame | None = None,
    k: int = 5,
    topk_per_source: int = 3,
) -> DataFrame:
    """End-to-end retrieval: classify -> embed -> R1/R3 cosine top-k ->
    R6/R7 boosts -> R8 merge -> R9 combine -> top ``k``.

    Returns (identifier, kind, rank_score, similarity, summary, doc_id).
    """
    qtype = classify_query(query_text)
    terms = focus_terms(query_text)
    qvec = hash_embedding(query_text)
    reports_to_lookup = "reports to" in query_text.lower()
    # Reference gate: a person-scoped pass runs only for first-person queries
    # with an authenticated user (services.py:1066 personalized_lookup).
    personalized = user_id is not None and bool(FIRST_PERSON_RE.search(query_text))

    # R1: global chunk cosine top-k (services.py GRAPH_VECTOR_QUERY)
    chunk_base = chunks.filter(F.col("embedding").isNotNull()).withColumn(
        "similarity", cosine_to_query(F.col("embedding").cast("array<double>"), qvec)
    )
    chunk_scored = chunk_base.orderBy(F.col("similarity").desc(), F.col("chunk_id")).limit(
        topk_per_source
    )
    if personalized and edges is not None:
        # R2/J2: a SEPARATE top-k over only the documents the user touches
        # (services.py PERSON_GRAPH_VECTOR_QUERY) — this can surface chunks
        # outside the global top-k, so the semi-join must happen BEFORE the
        # limit, then union with the global results.
        user_docs = (
            edges.filter(
                ((F.col("type") == "SENT") & (F.col("src") == user_id))
                | ((F.col("type") == "RECEIVED_BY") & (F.col("dst") == user_id))
            )
            .select(
                F.when(F.col("type") == "SENT", F.col("dst")).otherwise(F.col("src")).alias("doc_id")
            )
            .distinct()
        )
        chunk_person = (
            chunk_base.join(F.broadcast(user_docs), "doc_id", "left_semi")
            .orderBy(F.col("similarity").desc(), F.col("chunk_id"))
            .limit(topk_per_source)
        )
        chunk_scored = chunk_scored.unionByName(chunk_person).dropDuplicates(["chunk_id"])
    chunk_scored = chunk_scored.join(
        documents.select("doc_id", "subject", "sender", "timestamp"),
        "doc_id",
        "left",
    )

    chunk_haystack = F.concat_ws(
        " ",
        F.coalesce(F.col("summary"), F.lit("")),
        F.coalesce(F.col("subject"), F.lit("")),
        F.coalesce(F.col("sender"), F.lit("")),
        F.coalesce(F.col("doc_id"), F.lit("")),
    )
    chunk_fscore = _focus_score_col(chunk_haystack, terms)
    chunk_rank = (
        F.col("similarity")
        + F.lit(0.35) * chunk_fscore
        + (
            F.when(F.lower(F.coalesce(F.col("summary"), F.lit(""))).contains("reports to"), 0.3).otherwise(0.0)
            if reports_to_lookup
            else F.lit(0.0)
        )
        + _recency_boost_col(F.col("timestamp"), now)
    )
    chunk_results = chunk_scored.select(
        F.col("chunk_id").alias("identifier"),
        F.lit("chunk").alias("kind"),
        chunk_rank.alias("rank_score"),
        F.col("similarity"),
        F.col("summary"),
        F.col("doc_id"),
    )

    # R3: fact cosine top-k over current facts
    fact_base = facts.filter(F.col("status") == "current")
    if "embedding" in facts.columns:
        fact_embedded = fact_base.filter(F.col("embedding").isNotNull()).withColumn(
            "similarity", cosine_to_query(F.col("embedding").cast("array<double>"), qvec)
        )
        fact_scored = fact_embedded.orderBy(F.col("similarity").desc(), F.col("fact_id")).limit(
            topk_per_source
        )
        if personalized:
            # person-fact top-k (services.py PERSON_FACT_VECTOR_QUERY):
            # HAS_FACT edges go person -> fact via subject_entity_id
            # (saia.py:1196-1204), so scope by subject before the limit.
            fact_person = (
                fact_embedded.filter(F.col("subject_entity_id") == user_id)
                .orderBy(F.col("similarity").desc(), F.col("fact_id"))
                .limit(topk_per_source)
            )
            fact_scored = fact_scored.unionByName(fact_person).dropDuplicates(["fact_id"])
    else:
        fact_scored = fact_base.withColumn("similarity", F.lit(0.0)).limit(0)

    # R4: exact personal task-facts (no embedding needed); reference gates on
    # personalized_lookup AND a fact-priority query type (services.py:1131)
    if personalized and qtype in FACT_PRIORITY_QUERY_TYPES:
        exact = (
            fact_base.filter(F.col("claim_type").isin(sorted(TASK_LIKE_FACT_TYPES)))
            .filter(
                (F.col("subject_entity_id") == user_id)
                | (F.col("subject_key") == user_id)
                | (F.col("object_entity_id") == user_id)
                | (F.col("object_key") == user_id)
            )
            .orderBy(F.coalesce("last_seen_at", "first_seen_at", F.lit("")).desc())
            .limit(5)
            .withColumn("similarity", F.lit(1.0))
            .withColumn("__exact", F.lit(True))
        )
        fact_scored = fact_scored.withColumn("__exact", F.lit(False)).unionByName(
            exact, allowMissingColumns=True
        ).dropDuplicates(["fact_id"])
    else:
        fact_scored = fact_scored.withColumn("__exact", F.lit(False))

    fact_haystack = F.concat_ws(
        " ",
        *[
            F.coalesce(F.col(c), F.lit(""))
            for c in ("summary", "canonical_key", "subject_key", "subject_entity_id", "object_key", "object_entity_id", "claim_type")
        ],
    )
    fact_fscore = _focus_score_col(fact_haystack, terms)
    fact_rank = (
        F.col("similarity")
        + F.lit(0.05)  # status == current by construction
        + F.when(F.col("__exact"), 0.75).otherwise(0.0)
        + (
            F.when(F.col("claim_type").isin(sorted(TASK_LIKE_FACT_TYPES)), 0.35).otherwise(0.0)
            if qtype in FACT_PRIORITY_QUERY_TYPES
            else F.lit(0.0)
        )
        + (
            F.when(F.lower(F.coalesce(F.col("subject_entity_id"), F.col("subject_key"))) == (user_id or "").lower(), 0.25)
            .when(F.lower(F.coalesce(F.col("object_entity_id"), F.col("object_key"))) == (user_id or "").lower(), 0.1)
            .otherwise(0.0)
            if personalized
            else F.lit(0.0)
        )
        + F.lit(0.35) * fact_fscore
        + (
            F.when(F.col("claim_type") == "REPORTS_TO", 0.4).otherwise(0.0)
            if reports_to_lookup
            else F.lit(0.0)
        )
        + _recency_boost_col(F.coalesce("last_seen_at", "first_seen_at"), now)
    )
    fact_results = fact_scored.select(
        F.col("fact_id").alias("identifier"),
        F.lit("fact").alias("kind"),
        fact_rank.alias("rank_score"),
        F.col("similarity"),
        F.col("summary"),
        F.lit(None).cast("string").alias("doc_id"),
    )

    # R8: dedupe by identifier keeping max rank; R9: combine + global top-k
    combined = chunk_results.unionByName(fact_results)
    w = Window.partitionBy("identifier").orderBy(F.col("rank_score").desc())
    return (
        combined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .orderBy(F.col("rank_score").desc(), F.col("identifier").asc())
        .limit(k)
    )


def displayable_entity_col(c) -> Column:
    """Column form of kernel.retrieval.is_displayable_trace_entity (P8,
    reference services.py:758-780): drop ids, hashes, and machine keys from
    user-facing trace output. Pure codegen regexp/string predicates."""
    text = F.trim(F.coalesce(c.cast("string"), F.lit("")))
    lowered = F.lower(text)
    return (
        (text != "")
        & ~lowered.isin("currentuser", "unknown", "node", "group", "sage")
        & ~lowered.startswith("chat message ")
        & ~lowered.startswith("chat-msg-")
        & ~lowered.contains("-chunk-")
        & ~lowered.startswith("assignment::")
        & ~lowered.startswith("meeting::")
        & ~lowered.startswith("reports_to::")
        & ~lowered.startswith("direct:")
        & ~lowered.startswith("group")
        & ~lowered.startswith("message-attachment-")
        & ~text.rlike(r"^[0-9]+$")
        & ~lowered.rlike(r"^[0-9a-f]{32,64}$")
        & text.rlike(r"[a-zA-Z]")
    )


def trace_evidence(
    chunks: DataFrame,
    documents: DataFrame,
    facts: DataFrame,
    query_text: str,
    *,
    user_id: str | None = None,
    now: datetime,
    edges: DataFrame | None = None,
    k: int = 5,
    topk_per_source: int = 3,
) -> DataFrame:
    """The user-facing retrieval trace (reference services.py:1159-1329):
    each ranked result becomes one evidence row with its relationship label,
    retrieval path string, hop count, supporting-document fields, and the
    displayable matched entities — all assembled as column expressions over
    the ranked-retrieval core (``retrieve``).

    Returns (rank, identifier, kind, relationship, similarity, rank_score,
    retrieval_path, hop_count, doc_id, subject, sender, matched_entities).
    """
    user_scoped = user_id is not None and bool(FIRST_PERSON_RE.search(query_text))
    res = retrieve(
        chunks, documents, facts, query_text,
        user_id=user_id, now=now, edges=edges, k=k, topk_per_source=topk_per_source,
    )
    doc_dim = documents.select("doc_id", "subject", "sender")
    fact_dim = facts.select(
        F.col("fact_id").alias("identifier"),
        F.col("subject_key").alias("f_subject_key"),
        F.col("subject_entity_id").alias("f_subject_entity_id"),
        F.col("object_key").alias("f_object_key"),
        F.col("object_entity_id").alias("f_object_entity_id"),
    )
    ev = res.join(F.broadcast(doc_dim), "doc_id", "left").join(
        F.broadcast(fact_dim), "identifier", "left"
    )
    is_fact = F.col("kind") == "fact"
    # reference _build_fact_path_summary / _build_evidence_path (no related
    # node surfaced here, so related_label is None on the chunk branch)
    fact_path = F.lit("Person -> CanonicalFact -> Document" if user_scoped else "CanonicalFact -> Document")
    chunk_doc = F.concat(F.lit("Document("), F.coalesce(F.col("doc_id"), F.lit("unknown")), F.lit(")"))
    chunk_chunk = F.concat(F.lit("Chunk("), F.coalesce(F.col("identifier"), F.lit("unknown")), F.lit(")"))
    if user_scoped:
        chunk_path = F.concat_ws(" ", F.lit("Person"), F.lit("-(SENT|RECEIVED_BY)-"), chunk_doc, F.lit("<-PART_OF-"), chunk_chunk)
    else:
        chunk_path = F.concat_ws(" ", chunk_doc, F.lit("<-PART_OF-"), chunk_chunk)
    hops = F.lit(2 if user_scoped else 1)
    # matched-entity candidates in the reference's append order, filtered by
    # the displayable rule and de-duplicated preserving first occurrence
    cands = F.when(
        is_fact,
        F.array("f_subject_key", "f_subject_entity_id", "f_object_key", "f_object_entity_id"),
    ).otherwise(F.array("sender", "subject"))
    matched = F.array_distinct(F.filter(cands, lambda x: displayable_entity_col(x)))
    out = ev.select(
        F.col("identifier"),
        F.col("kind"),
        F.when(is_fact, F.lit("CANONICAL_FACT")).otherwise(F.lit("RELATED_TO")).alias("relationship"),
        F.round(F.col("similarity"), 4).alias("similarity"),
        F.round(F.col("rank_score"), 4).alias("rank_score"),
        F.when(is_fact, fact_path).otherwise(chunk_path).alias("retrieval_path"),
        hops.alias("hop_count"),
        F.col("doc_id"),
        F.col("subject"),
        F.col("sender"),
        matched.alias("matched_entities"),
    )
    w = Window.orderBy(F.col("rank_score").desc(), F.col("identifier").asc())
    return out.withColumn("rank", F.row_number().over(w)).orderBy("rank")


def trace_summary(evidence: DataFrame, *, user_scoped: bool) -> DataFrame:
    """Trace header (services.py:1319-1329): result_count, max_hop_count,
    and the top result's retrieval path (fallback: the scope's default path
    summary when no evidence survives)."""
    default_path = "Person -> Document -> Chunk" if user_scoped else "Document -> Chunk"
    return evidence.agg(
        F.count("*").cast("long").alias("result_count"),
        F.coalesce(F.max("hop_count"), F.lit(0)).cast("long").alias("max_hop_count"),
        F.coalesce(F.min_by("retrieval_path", "rank"), F.lit(default_path)).alias("retrieval_path"),
        F.lit(user_scoped).alias("user_scoped"),
    )
