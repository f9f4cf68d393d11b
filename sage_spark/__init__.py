"""sage_spark — a PySpark-native knowledge-graph construction engine.

From-scratch reimplementation of the document -> entity-graph pipeline of
gamidirohan/SAGE-Enterprise-Graph-RAG (reference at /root/reference), re-expressed
as Spark DataFrame stages over columnar tables instead of per-row Neo4j writes.

Layout
------
kernel/     pure-Python, Spark-free semantic core (regex extraction cascade,
            temporal normalization, entity resolution, chunking). Runs inside
            Arrow-batched pandas UDFs on executors; unit-testable without a JVM.
operators/  Spark DataFrame operators: the vectorized extraction stage, the
            batch fact-canonicalization state machine, join-based entity
            linking (salted broadcast + MinHash-LSH blocking), connected
            components, dedup / similarity / text-stats operators.
pipeline.py the five-stage end-to-end job (extract -> chunk -> triples ->
            link+canonicalize -> materialize) with per-partition lineage.
"""

__version__ = "0.1.0"
