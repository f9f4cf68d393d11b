"""Connected-components canonicalization over the mention graph (K7).

BASELINE.json's north rule upgrades the reference's implicit same-key
grouping (saia.py:1015-1037) to explicit connected components: mention keys
that co-refer (same person record matched by id and by email, fuzzy LSH
matches, etc.) form edges; each component becomes one canonical entity.

Implementation: large-star/small-star-style iterative min-label propagation
using only DataFrame joins + groupBy — no GraphFrames dependency. Converges
in O(log n) rounds for typical web graphs; each round is two shuffles keyed
on vertex ids. ``localCheckpoint`` truncates the growing lineage every round
so plans stay bounded at any iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iterations: int = 50,
) -> DataFrame:
    """Returns (vertex, component) with component = min vertex id (string
    order) reachable in the undirected graph."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .dropDuplicates(["a", "b"])
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iterations):
        # propagate: every vertex adopts the min label in its closed
        # neighborhood (its own label ∪ neighbors' labels)
        neighbor_labels = (
            sym.join(labels.withColumnRenamed("vertex", "b"), "b")
            .select(F.col("a").alias("vertex"), "component")
        )
        proposals = (
            labels.unionByName(neighbor_labels)
            .groupBy("vertex")
            .agg(F.min("component").alias("new_component"))
        )
        updated = labels.join(proposals, "vertex").select(
            "vertex",
            F.least(F.col("component"), F.col("new_component")).alias("component"),
            (F.col("new_component") < F.col("component")).alias("changed"),
        )
        changed = updated.filter(F.col("changed")).limit(1).count()
        labels = updated.drop("changed").localCheckpoint(eager=True)
        if changed == 0:
            break
    return labels


def canonical_entity_components(
    persons: DataFrame,
    fuzzy_pairs: DataFrame | None = None,
) -> DataFrame:
    """Entity-canonicalization graph: a person's id, email, and name keys all
    co-refer (edges id<->email, id<->lower(name)); optional fuzzy match pairs
    (from linking.link_mentions_lsh) join components across records. Output:
    (vertex=mention key, component=canonical entity id)."""
    id_email = persons.filter(F.col("email").isNotNull() & (F.col("email") != "")).select(
        F.col("id").alias("src"), F.lower(F.col("email")).alias("dst")
    )
    id_name = persons.filter(F.col("name").isNotNull() & (F.col("name") != "")).select(
        F.col("id").alias("src"), F.lower(F.col("name")).alias("dst")
    )
    edges = id_email.unionByName(id_name)
    if fuzzy_pairs is not None:
        edges = edges.unionByName(fuzzy_pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")))
    return connected_components(edges)
