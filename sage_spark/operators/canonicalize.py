"""Stage 4: batch fact canonicalization (K1-K6).

The reference mutates facts serially per message (saia.py:274-342); mutations
only interact through ``canonical_key``, so the batch equivalent is a
cogrouped replay: claims and the existing facts table are both grouped by
canonical_key, each group is ordered by the deterministic arrival order
(sent_at, doc_id, claim_seq) — a documented equivalence of the reference's
serial ordering — and the pure state machine in kernel/facts.py replays the
group. Group state is a handful of facts, so skewed keys cost memory O(few).

One shuffle (the cogroup) produces facts, claim status updates, and
claim<->fact edges in a single pass as a discriminated union, split afterward
by cheap filters. At scale the union is materialized once (the pipeline
writes it to the run's staging dir) so the three splits don't recompute.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

from ..kernel.facts import replay_key_mutations
from ..schema import CLAIM_FACT_EDGES_SCHEMA, CLAIM_UPDATES_SCHEMA, FACTS_SCHEMA

_FACT_COLS = [f.name for f in FACTS_SCHEMA.fields]

MUTATION_UNION_SCHEMA = T.StructType(
    [T.StructField("record_type", T.StringType(), False)]
    + [T.StructField(f.name, f.dataType, True) for f in FACTS_SCHEMA.fields]
    + [
        T.StructField("claim_id", T.StringType(), True),
        T.StructField("promotion_status", T.StringType(), True),
        T.StructField("mutation_action", T.StringType(), True),
        T.StructField("relation_type", T.StringType(), True),
    ]
)
_UNION_COLS = [f.name for f in MUTATION_UNION_SCHEMA.fields]


def _claims_sort_key(frame: pd.DataFrame) -> pd.DataFrame:
    return frame.sort_values(["sent_at", "doc_id", "claim_seq"], kind="mergesort")


def canonicalize_claims(
    claims: DataFrame,
    existing_facts: DataFrame | None,
    *,
    seen_at: str,
) -> DataFrame:
    """Replay mutations per canonical_key; returns the discriminated union
    (record_type in {fact, claim_update, edge}). Split with the helpers
    below after materializing once."""
    spark = claims.sparkSession
    if existing_facts is None:
        existing_facts = spark.createDataFrame([], FACTS_SCHEMA)

    def replay(key: tuple, claims_pdf: pd.DataFrame, facts_pdf: pd.DataFrame) -> pd.DataFrame:
        ordered = _claims_sort_key(claims_pdf).to_dict("records")
        # store order: first_seen then id — the deterministic stand-in for
        # Neo4j's match order (only consulted on multi-current conflicts)
        store = facts_pdf.sort_values(["first_seen_at", "fact_id"], kind="mergesort").to_dict("records")
        out = replay_key_mutations(store, ordered, seen_at)
        rows: list[dict] = []
        for fact in out.facts:
            row = {c: fact.get(c) for c in _FACT_COLS}
            row["record_type"] = "fact"
            rows.append(row)
        for upd in out.claim_updates:
            rows.append({"record_type": "claim_update", **upd})
        for edge in out.edges:
            rows.append({"record_type": "edge", **edge})
        frame = pd.DataFrame(rows)
        return frame.reindex(columns=_UNION_COLS)

    grouped_claims = claims.groupBy("canonical_key")
    grouped_facts = existing_facts.groupBy("canonical_key")
    return grouped_claims.cogroup(grouped_facts).applyInPandas(replay, schema=MUTATION_UNION_SCHEMA)


def split_facts(union: DataFrame) -> DataFrame:
    return union.filter(F.col("record_type") == "fact").select(*_FACT_COLS)


def split_claim_updates(union: DataFrame) -> DataFrame:
    return union.filter(F.col("record_type") == "claim_update").select(
        *[f.name for f in CLAIM_UPDATES_SCHEMA.fields]
    )


def split_edges(union: DataFrame) -> DataFrame:
    return union.filter(F.col("record_type") == "edge").select(
        *[f.name for f in CLAIM_FACT_EDGES_SCHEMA.fields]
    )


def support_counts_from_edges(edges: DataFrame) -> DataFrame:
    """A6: support_count re-derived as the count of SUPPORTS edges — the
    aggregation form of the reference's coalesce(count,0)+1 increments
    (saia.py:1158-1161, 1225-1230); makes support idempotent under re-runs."""
    return (
        edges.filter(F.col("relation_type") == "SUPPORTS")
        .groupBy("fact_id")
        .agg(F.count("*").alias("support_count"))
    )


def graph_edges_from_outputs(claims: DataFrame, facts: DataFrame, documents: DataFrame) -> DataFrame:
    """Materialize the remaining typed edges (SURVEY.md §1.1) as one
    (src, dst, type) table: SENT, RECEIVED_BY, HAS_CLAIM, HAS_FACT,
    OBJECT_ENTITY, SUPERSEDED_BY. Set semantics via dropDuplicates."""
    sent = documents.select(F.col("sender").alias("src"), F.col("doc_id").alias("dst")).where(
        F.col("src").isNotNull()
    ).withColumn("type", F.lit("SENT"))
    received = (
        documents.select(F.col("doc_id").alias("src"), F.explode("receivers").alias("dst"))
        .withColumn("type", F.lit("RECEIVED_BY"))
    )
    has_claim = claims.select(
        F.col("doc_id").alias("src"), F.col("claim_id").alias("dst"), F.lit("HAS_CLAIM").alias("type")
    )
    has_fact = facts.where(F.col("subject_entity_id").isNotNull()).select(
        F.col("subject_entity_id").alias("src"), F.col("fact_id").alias("dst"), F.lit("HAS_FACT").alias("type")
    )
    object_entity = facts.where(
        F.col("object_entity_id").isNotNull() & (F.coalesce(F.col("object_entity_type"), F.lit("")) != "Group")
    ).select(F.col("fact_id").alias("src"), F.col("object_entity_id").alias("dst"), F.lit("OBJECT_ENTITY").alias("type"))
    superseded = facts.where(F.col("superseded_by_fact_id").isNotNull()).select(
        F.col("fact_id").alias("src"), F.col("superseded_by_fact_id").alias("dst"), F.lit("SUPERSEDED_BY").alias("type")
    )
    return sent.unionByName(received).unionByName(has_claim).unionByName(has_fact).unionByName(
        object_entity
    ).unionByName(superseded).dropDuplicates(["src", "dst", "type"])
