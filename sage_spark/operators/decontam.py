"""Benchmark decontamination: flag training documents that share any
n-token gram with an eval/benchmark set.

The standard pre-training hygiene pass (the n-gram-overlap rule used for
public-benchmark decontamination): any training document containing a
13-gram (configurable) from the eval set is excluded or flagged before
training. Shape at 100 TB:

* the benchmark side is tiny relative to the corpus (eval suites are
  thousands of documents) — its distinct n-gram set broadcasts;
* the corpus side explodes each document into its n-grams ONCE and joins
  map-side against the broadcast set, then a partial-agg groupBy(doc)
  counts distinct overlapping grams — one shuffle keyed on doc_id, no
  benchmark-side shuffle at all.

All pure ``pyspark.sql.functions`` column arithmetic (tokenize via
regexp_extract_all, grams via slice+array_join) — no Python in the hot
path, and the same computation is expressible in ANSI SQL for the DuckDB
oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TOKEN_RE = "[a-z0-9]+"


def token_ngrams(text: Column, n: int) -> Column:
    """Space-joined lowercase token n-grams of a text column; empty array
    when the text has fewer than ``n`` tokens."""
    toks = F.regexp_extract_all(F.lower(text), F.lit(TOKEN_RE), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>"))


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """Returns (id_col, n_contaminated_ngrams, contaminated) for every
    document: how many distinct benchmark n-grams it contains, and whether
    that count is non-zero."""
    bench_grams = (
        benchmark.select(F.explode(token_ngrams(F.col(bench_text_col), n)).alias("g"))
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col), F.explode(token_ngrams(F.col(text_col), n)).alias("g")
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "g")
        .groupBy(id_col)
        .agg(F.count_distinct("g").alias("n_contaminated_ngrams"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .fillna({"n_contaminated_ngrams": 0})
        .withColumn("contaminated", F.col("n_contaminated_ngrams") > 0)
    )
