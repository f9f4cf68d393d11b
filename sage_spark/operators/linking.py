"""Join-based entity linking at dimension scales beyond broadcast.

The extraction kernel resolves mentions against a broadcast EntityCatalog
(a map-side hash join) — correct while the persons dimension fits in
executor memory. When it doesn't (north rule: 10^12 documents, large dims),
linking becomes a two-phase DataFrame job:

1. extract claims with *unresolved* mention tokens (catalog=None — slug
   fallback keys),
2. link mentions to the dimension with the joins here,
3. finalize keys/confidences.

This module implements phase 2 three ways:

* ``link_mentions_exact`` — the reference's 3-key case-insensitive match
  (saia.py:1810-1827) as a union of equi-joins + the J5 tie-break window
  (saia.py:1830-1868) reproduced as a score + row_number + tie-count check.
* ``salted`` — explicit hub-key salting: explode the dimension N ways, salt
  the fact side with pmod(hash, N); kills the single-reducer hot key that a
  zipfian mention distribution creates.
* ``link_mentions_lsh`` — MinHash-LSH blocking for fuzzy (typo'd) mentions:
  candidate pairs from shared shingle buckets, verified by Jaccard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import minhash_lsh_candidates, ngram_jaccard_pairs


def _dim_lookup_keys(persons: DataFrame) -> DataFrame:
    """One row per (lookup_key, person) — the 3-key union (id/email/name,
    lowered). Done once per job; tiny relative to the fact side."""
    base = persons.select(
        F.col("id"),
        F.col("name"),
        F.col("email"),
        F.coalesce(F.col("is_user"), F.lit(False)).alias("is_user"),
        F.coalesce(F.col("name"), F.col("email"), F.col("id")).alias("display_name"),
    )
    keys = base.select(
        "*", F.explode(F.array(F.lower("id"), F.lower("email"), F.lower("name"))).alias("lookup_key")
    ).filter(F.col("lookup_key").isNotNull() & (F.col("lookup_key") != ""))
    return keys.dropDuplicates(["lookup_key", "id"])


def link_mentions_exact(
    mentions: DataFrame,
    persons: DataFrame,
    *,
    mention_col: str = "mention",
    broadcast_dim: bool = True,
    salt_buckets: int | None = None,
) -> DataFrame:
    """Resolve mention tokens against the dimension.

    Input: any DataFrame with a ``mention`` column (plus passthrough cols).
    Output: input + (entity_id, entity_type, display_name, match_status)
    where match_status in {resolved, ambiguous, unmatched}.

    J5 tie-break as a window: score candidates (+6 id, +5 email, +4 name,
    +3 User label, +1 email present, +1 name present); a unique positive
    maximum resolves, a tied maximum is ambiguous.
    """
    dim = _dim_lookup_keys(persons)
    joined_key = F.lower(F.trim(F.col(mention_col)))
    left = mentions.withColumn("__key", joined_key)

    if salt_buckets:
        # Hub mentions (zipfian skew) all hash to one reducer in a plain
        # repartition join; salting spreads each dimension key over
        # salt_buckets shuffle partitions.
        salted_dim = dim.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))))
        # salt from row CONTENT, never monotonically_increasing_id: content
        # hashes are stable across task retries and re-runs, so the row->salt
        # assignment (and thus every downstream partition file) is reproducible
        left = left.withColumn(
            "__salt",
            F.pmod(F.xxhash64(F.concat_ws("", *[F.col(c).cast("string") for c in mentions.columns])), F.lit(salt_buckets)),
        )
        join_cond = (F.col("__key") == F.col("lookup_key")) & (left["__salt"] == salted_dim["__salt"])
        cand = left.join(salted_dim, join_cond, "left").drop("__salt")
    else:
        dim_side = F.broadcast(dim) if broadcast_dim else dim
        cand = left.join(dim_side, F.col("__key") == F.col("lookup_key"), "left")

    score = (
        F.when(F.lower(F.col("id")) == F.col("__key"), 6).otherwise(0)
        + F.when(F.lower(F.coalesce(F.col("email"), F.lit(""))) == F.col("__key"), 5).otherwise(0)
        + F.when(
            (F.lower(F.coalesce(F.col("name"), F.lit(""))) == F.col("__key"))
            | (F.lower(F.coalesce(F.col("display_name"), F.lit(""))) == F.col("__key")),
            4,
        ).otherwise(0)
        + F.when(F.col("is_user"), 3).otherwise(0)
        + F.when(F.col("email").isNotNull() & (F.col("email") != ""), 1).otherwise(0)
        + F.when(F.col("name").isNotNull() & (F.col("name") != ""), 1).otherwise(0)
    )
    scored = cand.withColumn("__score", F.when(F.col("id").isNotNull(), score))

    w = Window.partitionBy("__key", *[c for c in mentions.columns]).orderBy(
        F.col("__score").desc_nulls_last(), F.col("id").asc_nulls_last()
    )
    wmax = Window.partitionBy("__key", *[c for c in mentions.columns])
    ranked = (
        scored.withColumn("__rn", F.row_number().over(w))
        .withColumn("__nmax", F.sum(F.when(F.col("__score") == F.max("__score").over(wmax), 1).otherwise(0)).over(wmax))
        .withColumn("__ncand", F.count(F.col("id")).over(wmax))
    )
    resolved = ranked.filter(F.col("__rn") == 1).select(
        *mentions.columns,
        F.when((F.col("__score") > 0) & ((F.col("__nmax") == 1) | (F.col("__ncand") == 1)), F.col("id")).alias(
            "entity_id"
        ),
        F.when(
            (F.col("__score") > 0) & ((F.col("__nmax") == 1) | (F.col("__ncand") == 1)),
            F.when(F.col("is_user"), F.lit("User")).otherwise(F.lit("Person")),
        ).alias("entity_type"),
        F.when((F.col("__score") > 0) & ((F.col("__nmax") == 1) | (F.col("__ncand") == 1)), F.col("display_name")).alias(
            "display_name"
        ),
        F.when(F.col("__ncand") == 0, F.lit("unmatched"))
        .when((F.col("__nmax") == 1) | (F.col("__ncand") == 1), F.lit("resolved"))
        .otherwise(F.lit("ambiguous"))
        .alias("match_status"),
    )
    return resolved


def link_mentions_lsh(
    mentions: DataFrame,
    persons: DataFrame,
    *,
    mention_col: str = "mention",
    id_col: str = "mention_id",
    shingle_len: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Fuzzy blocking: mention strings and person names share MinHash-LSH
    buckets; candidates are verified with shingle Jaccard and the best match
    above threshold wins. Use when exact 3-key matching misses (typos,
    partial names). Both sides shuffle only on short bucket hashes."""
    left = mentions.select(F.col(id_col).alias("doc_id"), F.col(mention_col).alias("text"))
    right = persons.select(F.concat(F.lit("person::"), F.col("id")).alias("doc_id"), F.col("name").alias("text"))
    both = left.unionByName(right)
    cands = minhash_lsh_candidates(both, "text", "doc_id", shingle_len=shingle_len, num_hashes=32, bands=16)
    cross = cands.filter(
        (F.col("id_a").startswith("person::") != F.col("id_b").startswith("person::"))
    )
    verified = ngram_jaccard_pairs(both, "text", "doc_id", shingle_len=shingle_len, threshold=threshold, candidates=cross)
    normalized = verified.select(
        F.when(F.col("id_a").startswith("person::"), F.col("id_b")).otherwise(F.col("id_a")).alias(id_col),
        F.regexp_replace(
            F.when(F.col("id_a").startswith("person::"), F.col("id_a")).otherwise(F.col("id_b")),
            "^person::",
            "",
        ).alias("entity_id"),
        F.col("jaccard"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("jaccard").desc(), F.col("entity_id").asc())
    return normalized.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
