"""Structured Streaming layer.

The reference has no streaming path (SURVEY.md §2.10 — ingestion is
request-driven); this engine adds the incremental equivalents a production
deployment needs: a file/Iceberg-source stream through the same extraction
kernels via foreachBatch (each micro-batch is one idempotent pipeline run),
and watermarked windowed aggregations for the events stream.
"""
