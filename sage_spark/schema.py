"""Table schemas (SURVEY.md §1.3, FIXTURES.md §1/§6).

The property graph decomposes into node + edge DataFrames; every dynamic
Neo4j property map becomes a fixed StructType with nullable columns.
ISO-8601 timestamps stay strings for byte-fidelity with the reference
(saia.py:2191-2192); derived TimestampType columns are added where
partitioning needs them.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Input: Common-Crawl-style web pages (BASELINE.json input_hint) plus the
# grounding sidecar columns the extraction kernel needs (FIXTURES.md §1).
WEBTEXT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("sender_id", T.StringType(), True),
        T.StructField("receiver_ids", T.ArrayType(T.StringType()), True),
        T.StructField("conversation_id", T.StringType(), True),
        T.StructField("conversation_type", T.StringType(), True),
        T.StructField("group_id", T.StringType(), True),
        T.StructField("message_id", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

PERSONS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("role", T.StringType(), True),
        T.StructField("email", T.StringType(), True),
        T.StructField("is_user", T.BooleanType(), True),
    ]
)

GROUPS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("url", T.StringType(), True),
        T.StructField("sender", T.StringType(), True),
        T.StructField("receivers", T.ArrayType(T.StringType()), True),
        T.StructField("subject", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
        T.StructField("summary", T.StringType(), True),
        T.StructField("timestamp", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("conversation_type", T.StringType(), True),
        T.StructField("conversation_id", T.StringType(), True),
        T.StructField("group_id", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

CHUNKS_SCHEMA = T.StructType(
    [
        T.StructField("chunk_id", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("seq", T.IntegerType(), False),
        T.StructField("content", T.StringType(), True),
        T.StructField("summary", T.StringType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
    ]
)

CLAIMS_SCHEMA = T.StructType(
    [
        T.StructField("claim_id", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("claim_seq", T.IntegerType(), False),
        T.StructField("claim_type", T.StringType(), True),
        T.StructField("predicate", T.StringType(), True),
        T.StructField("subject_raw", T.StringType(), True),
        T.StructField("subject_key", T.StringType(), True),
        T.StructField("subject_entity_id", T.StringType(), True),
        T.StructField("subject_entity_type", T.StringType(), True),
        T.StructField("object_raw", T.StringType(), True),
        T.StructField("object_key", T.StringType(), True),
        T.StructField("object_entity_id", T.StringType(), True),
        T.StructField("object_entity_type", T.StringType(), True),
        T.StructField("value_text", T.StringType(), True),
        T.StructField("grounding_json", T.StringType(), True),
        T.StructField("payload_json", T.StringType(), True),
        T.StructField("scope_type", T.StringType(), True),
        T.StructField("scope_id", T.StringType(), True),
        T.StructField("temporal_start", T.StringType(), True),
        T.StructField("temporal_end", T.StringType(), True),
        T.StructField("temporal_granularity", T.StringType(), True),
        T.StructField("timezone", T.StringType(), True),
        T.StructField("normalized_text", T.StringType(), True),
        T.StructField("source_span_text", T.StringType(), True),
        T.StructField("graph_worthy", T.BooleanType(), True),
        T.StructField("resolution_status", T.StringType(), True),
        T.StructField("promotion_status", T.StringType(), True),
        T.StructField("mutation_action", T.StringType(), True),
        T.StructField("extraction_confidence", T.DoubleType(), True),
        T.StructField("canonical_confidence", T.DoubleType(), True),
        T.StructField("canonical_key", T.StringType(), True),
        T.StructField("created_at", T.StringType(), True),
        T.StructField("sent_at", T.StringType(), True),
        T.StructField("partition_id", T.IntegerType(), True),
    ]
)

FACTS_SCHEMA = T.StructType(
    [
        T.StructField("fact_id", T.StringType(), False),
        T.StructField("canonical_key", T.StringType(), False),
        T.StructField("claim_type", T.StringType(), True),
        T.StructField("predicate", T.StringType(), True),
        T.StructField("subject_key", T.StringType(), True),
        T.StructField("subject_entity_id", T.StringType(), True),
        T.StructField("subject_entity_type", T.StringType(), True),
        T.StructField("object_key", T.StringType(), True),
        T.StructField("object_entity_id", T.StringType(), True),
        T.StructField("object_entity_type", T.StringType(), True),
        T.StructField("value_text", T.StringType(), True),
        T.StructField("payload_json", T.StringType(), True),
        T.StructField("summary", T.StringType(), True),
        T.StructField("scope_type", T.StringType(), True),
        T.StructField("scope_id", T.StringType(), True),
        T.StructField("temporal_start", T.StringType(), True),
        T.StructField("temporal_end", T.StringType(), True),
        T.StructField("temporal_granularity", T.StringType(), True),
        T.StructField("timezone", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("confidence", T.DoubleType(), True),
        T.StructField("first_seen_at", T.StringType(), True),
        T.StructField("last_seen_at", T.StringType(), True),
        T.StructField("support_count", T.LongType(), True),
        T.StructField("superseded_by_fact_id", T.StringType(), True),
        T.StructField("superseded_at", T.StringType(), True),
    ]
)

CLAIM_UPDATES_SCHEMA = T.StructType(
    [
        T.StructField("claim_id", T.StringType(), False),
        T.StructField("promotion_status", T.StringType(), True),
        T.StructField("mutation_action", T.StringType(), True),
    ]
)

CLAIM_FACT_EDGES_SCHEMA = T.StructType(
    [
        T.StructField("claim_id", T.StringType(), False),
        T.StructField("fact_id", T.StringType(), False),
        T.StructField("relation_type", T.StringType(), False),
    ]
)

EDGES_SCHEMA = T.StructType(
    [
        T.StructField("src", T.StringType(), False),
        T.StructField("dst", T.StringType(), False),
        T.StructField("type", T.StringType(), False),
    ]
)

RUNS_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("stage", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("processed_at", T.StringType(), True),
        T.StructField("docs_processed", T.LongType(), True),
        T.StructField("claims_extracted", T.LongType(), True),
        T.StructField("claims_canonicalized", T.LongType(), True),
        T.StructField("conflicts_found", T.LongType(), True),
        T.StructField("errors_json", T.StringType(), True),
    ]
)
