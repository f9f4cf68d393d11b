"""Retrieval-side and analytics DataFrame operators (SURVEY.md §2.4-2.6).

Each function is a declarative DataFrame program — Catalyst handles pushdown,
pruning, and join strategy; broadcast hints mark the dimension sides. These
are the operators the driver's DuckDB oracle verifies 1:1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


# --- graph statistics (A1-A4, backend.py:707-758) -------------------------------

def node_counts_by_label(nodes: DataFrame, label_col: str = "label") -> DataFrame:
    return nodes.groupBy(label_col).agg(F.count("*").alias("node_count")).orderBy(
        F.col("node_count").desc(), F.col(label_col).asc()
    )


def edge_counts_by_type(edges: DataFrame) -> DataFrame:
    return edges.groupBy("type").agg(F.count("*").alias("edge_count")).orderBy(
        F.col("edge_count").desc(), F.col("type").asc()
    )


def isolated_nodes(nodes: DataFrame, edges: DataFrame, id_col: str = "id") -> DataFrame:
    touched = edges.select(F.col("src").alias(id_col)).unionByName(edges.select(F.col("dst").alias(id_col))).distinct()
    return nodes.join(touched, id_col, "left_anti")


def top_connected(nodes: DataFrame, edges: DataFrame, id_col: str = "id", k: int = 10) -> DataFrame:
    degree = (
        edges.select(F.col("src").alias(id_col))
        .unionByName(edges.select(F.col("dst").alias(id_col)))
        .groupBy(id_col)
        .agg(F.count("*").alias("degree"))
    )
    return (
        nodes.join(degree, id_col)
        .orderBy(F.col("degree").desc(), F.col(id_col).asc())
        .limit(k)
    )


# --- ranking / top-k (R5-R9, services.py:586-982) --------------------------------

def recency_boost(ts_col, now_col, *, weight: float = 0.18, half_life_days: float = 21.0):
    """services.py:32-33,586-605: weight * exp(-age_days / half_life)."""
    age_days = F.datediff(now_col, ts_col)
    return F.lit(weight) * F.exp(-age_days.cast("double") / F.lit(half_life_days))


def merge_ranked(results: DataFrame, key_col: str, rank_col: str, k: int = 5) -> DataFrame:
    """R8 (services.py:876-891): dedupe by identifier keeping the max-score
    row, then global sort + limit."""
    w = Window.partitionBy(key_col).orderBy(F.col(rank_col).desc())
    return (
        results.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .orderBy(F.col(rank_col).desc(), F.col(key_col).asc())
        .limit(k)
    )


def top_k_per_group(df: DataFrame, group_cols: list[str], order_col: str, k: int = 1, *, tiebreak: str | None = None) -> DataFrame:
    order = [F.col(order_col).desc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return df.withColumn("row_rank", F.row_number().over(w)).filter(F.col("row_rank") <= k)


# --- skew-safe join helpers ------------------------------------------------------

def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    *,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Explicit salting for a skewed equi-join: replicate the small side
    ``buckets`` times, scatter the big side uniformly. Use when one key
    dominates (hub entity) and the small side is too big to broadcast but
    small enough to replicate xN."""
    salted_small = small.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))))
    # deterministic near-uniform salt from the full row content
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(buckets)).cast("int")
    )
    out = salted_big.join(salted_small, [key, "__salt"], how)
    return out.drop("__salt")
