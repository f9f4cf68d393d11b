"""Graph-navigation operators over the materialized node/edge tables.

J3 one-hop expansion (services.py:44-45,72), J8 fact -> supporting-document
join (services.py:98-99,110-111), A5 ingestion summary (document_
ingestion.py:258-272), A8 entity-id collection (saia.py:1945-1960), plus
the Spark column form of F6 IST rendering (services.py:572-583).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def expand_one_hop(seed_ids: DataFrame, edges: DataFrame, id_col: str = "id") -> DataFrame:
    """J3: undirected one-hop expansion of a (small) seed set: returns
    (seed, neighbor, type, direction). The seed side is broadcast — exactly
    the reference's per-chunk MATCH (c)-[r]-(n) pattern, batched."""
    seeds = F.broadcast(seed_ids.select(F.col(id_col).alias("seed")).distinct())
    out = seeds.join(edges, F.col("seed") == F.col("src")).select(
        "seed", F.col("dst").alias("neighbor"), "type", F.lit("out").alias("direction")
    )
    inbound = seeds.join(edges, F.col("seed") == F.col("dst")).select(
        "seed", F.col("src").alias("neighbor"), "type", F.lit("in").alias("direction")
    )
    return out.unionByName(inbound).dropDuplicates(["seed", "neighbor", "type", "direction"])


def facts_with_evidence(
    facts: DataFrame,
    claim_fact_edges: DataFrame,
    claims: DataFrame,
    documents: DataFrame,
) -> DataFrame:
    """J8: each fact joined to one supporting document (first distinct by
    doc_id order — the batch form of Cypher's collect(DISTINCT d)[0])."""
    supports = claim_fact_edges.filter(F.col("relation_type") == "SUPPORTS")
    chain = (
        facts.join(supports, "fact_id", "left")
        .join(claims.select("claim_id", "doc_id"), "claim_id", "left")
        .join(documents.select("doc_id", "url", "timestamp"), "doc_id", "left")
    )
    w = Window.partitionBy("fact_id").orderBy(F.col("doc_id").asc_nulls_last())
    return (
        chain.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "claim_id")
        .withColumnRenamed("doc_id", "evidence_doc_id")
        .withColumnRenamed("url", "evidence_url")
        .withColumnRenamed("timestamp", "evidence_timestamp")
    )


def ingestion_summary(runs: DataFrame) -> DataFrame:
    """A5: per-status tallies of the lineage table."""
    return runs.groupBy("status").agg(
        F.count("*").alias("n_partitions"),
        F.sum("docs_processed").alias("docs_processed"),
        F.sum("claims_extracted").alias("claims_extracted"),
        F.sum("conflicts_found").alias("conflicts_found"),
    )


def distinct_entity_ids(claims: DataFrame, facts: DataFrame) -> DataFrame:
    """A8: distinct subject/object entity ids across claims + facts."""
    cols = ["subject_entity_id", "object_entity_id"]
    stacked = claims.select(F.explode(F.array(*cols)).alias("entity_id")).unionByName(
        facts.select(F.explode(F.array(*cols)).alias("entity_id"))
    )
    return stacked.filter(F.col("entity_id").isNotNull()).distinct().orderBy("entity_id")


def ist_display(col) -> F.Column:
    """F6 as a column expression: UTC ISO string -> '%Y-%m-%d %I:%M %p IST'."""
    ist = F.from_utc_timestamp(F.to_timestamp(col), "Asia/Kolkata")
    return F.concat(F.date_format(ist, "yyyy-MM-dd hh:mm a"), F.lit(" IST"))
