"""PageRank over the entity graph — the iterative-algorithm pattern.

Classic damped PageRank with uniform dangling-mass redistribution, as pure
DataFrame joins/aggregations: each iteration is one join (ranks x edges),
one groupBy(dst) sum, and one scalar aggregate for the dangling mass.
``localCheckpoint`` truncates lineage per iteration so the plan stays flat
at any iteration count (the same discipline as connected components,
operators/components.py).

Scale notes: ranks and degrees are (vertex, double) tables — the shuffles
key on vertex ids only. For the per-iteration ranks⋈edges join the edge
side can be made exchange-free: feed a src-bucketed table through
``pagerank_on_bucketed_edges`` (survives AQE; the 10^12-edge deployment
shape) or pre-pin with ``partition_edges_by_src`` (AQE off). The dangling
term is a single scalar per iteration (an aggregate, not a collect of data
rows).

Reference anchor: the entity graph this ranks is the subject/object mention
graph the reference materializes in Neo4j (app/saia.py:1184-1215);
centrality over it identifies hub entities for skew planning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def partition_edges_by_src(e: DataFrame) -> DataFrame:
    """Pin the edge table to HashPartitioning(src, shuffle-partitions) and
    checkpoint it: localCheckpoint preserves the physical partitioning in
    the LogicalRDD, so every subsequent equi-join/agg keyed on ``src``
    satisfies its distribution requirement from the checkpoint — no
    edge-side Exchange. CAVEAT (plan-measured): AQE's re-planning does not
    honor LogicalRDD partitioning, so this only helps with
    spark.sql.adaptive.enabled=false; under AQE use the bucketed-TABLE path
    (pagerank_on_bucketed_edges), whose scan partitioning AQE does respect."""
    n = int(e.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return e.repartition(n, "src").localCheckpoint(eager=True)


def pagerank_on_bucketed_edges(spark, table: str, **kwargs) -> DataFrame:
    """PageRank over an edge table persisted bucketed+sorted by ``src``
    (operators/bucketing.write_bucketed): the bucketed scan carries
    HashPartitioning(src) that survives AQE, so the out-degree aggregate
    and every iteration's contribution join read the edges with ZERO
    edge-side Exchange — only the iteration-varying rank table moves. This
    is the deployment shape for a 10^12-edge graph: edges live bucketed
    (Iceberg ``bucket(N, src)``), ranks re-shuffle per iteration."""
    from .bucketing import read_bucketed

    return pagerank(read_bucketed(spark, table), prepartitioned=True, **kwargs)


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 20,
    tol: float | None = None,
    checkpoint_every: int = 2,
    prepartitioned: bool = False,
) -> DataFrame:
    """Returns (v, rank); ranks sum to 1. Edges are de-duplicated (set
    semantics, matching the MERGE-built reference graph).

    Lineage is truncated every ``checkpoint_every`` iterations. The cadence
    is a measured trade: `ranks` appears twice in each iteration's plan
    (dangling-mass aggregate + contribution join), so k un-checkpointed
    iterations grow the logical plan exponentially — cadence 2 benched fastest
    (6.3 s vs 9.1 s at 1 and 7.2 s at 4 for the 20-iteration contract
    graph); per-iteration eager actions were the round-3 bottleneck, plan
    blowup punishes long cadences. Re-swept in round 5 under the 4-shuffle-
    partition contract config: cadences 1-4 read 9.7-14.4 s within window
    noise (no change warranted), cadence 10 ran past a 15-minute budget —
    the exponential-plan cliff is real. With ``tol`` set, stops
    early once the L1 delta between consecutive checkpointed states drops
    below it — the fixed-point contraction bound |r_k - r_inf|_1 <=
    delta * d/(1-d) makes that a certified convergence test. ``tol=None``
    runs exactly ``iterations`` rounds (bit-stable vs the serial oracle)."""
    if prepartitioned:
        # caller provides a src-co-located edge set (e.g. a bucketed table
        # via pagerank_on_bucketed_edges): do NOT checkpoint or re-shuffle
        # it — that would erase the scan partitioning that makes the
        # iteration joins exchange-free. The set-semantics dedup still
        # applies (raw mention edges repeat; multiplicity would skew
        # out-degree and ranks) and stays exchange-free: HashPartitioning
        # on src satisfies the (src, dst) clustering the dedup needs, so
        # Catalyst plans it partition-local (asserted in test_plans).
        e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).dropDuplicates(
            ["src", "dst"]
        )
    else:
        e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).dropDuplicates(
            ["src", "dst"]
        )
        e = e.localCheckpoint(eager=True)
    verts = e.select(F.col("src").alias("v")).unionByName(e.select(F.col("dst").alias("v"))).distinct()
    verts = verts.localCheckpoint(eager=True)
    n = verts.count()
    if n == 0:
        return verts.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    ranks = verts.withColumn("rank", F.lit(1.0 / n))
    prev_checkpointed = ranks
    for it in range(iterations):
        # one left join carries both the contribution input and the dangling
        # mass: null-degree rank aggregates into a broadcast 1-row frame, so
        # the whole iteration is a single distributed plan with no driver
        # round-trip for the scalar
        rd = ranks.join(out_deg.withColumnRenamed("src", "v"), "v", "left")
        dangling = F.broadcast(
            rd.agg(
                F.coalesce(
                    F.sum(F.when(F.col("deg").isNull(), F.col("rank"))), F.lit(0.0)
                ).alias("__dang")
            )
        )
        contribs = e.join(
            rd.filter(F.col("deg").isNotNull()).withColumnRenamed("v", "src"), "src"
        ).select(F.col("dst").alias("v"), (F.col("rank") / F.col("deg")).alias("c"))
        summed = contribs.groupBy("v").agg(F.sum("c").alias("s"))
        ranks = (
            verts.join(summed, "v", "left")
            .join(dangling)
            .select(
                "v",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("s"), F.lit(0.0)) + F.col("__dang") / n)
                ).alias("rank"),
            )
        )
        at_boundary = (it + 1) % max(checkpoint_every, 1) == 0 or it == iterations - 1
        if at_boundary:
            ranks = ranks.localCheckpoint(eager=True)
            if tol is not None and it < iterations - 1:
                delta = (
                    ranks.join(
                        prev_checkpointed.withColumnRenamed("rank", "__prev"), "v"
                    )
                    .agg(F.sum(F.abs(F.col("rank") - F.col("__prev"))).alias("d"))
                    .collect()[0]["d"]
                )
                if delta is not None and delta <= tol:
                    return ranks
            prev_checkpointed = ranks
    return ranks


def personalized_pagerank(
    edges: DataFrame,
    seeds: list[str],
    *,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 20,
    checkpoint_every: int = 2,
) -> DataFrame:
    """Personalized PageRank: random walks restart at the SEED set instead
    of uniformly — rank(v) measures proximity to the seeds, which is the
    GraphRAG retrieval-relevance score ("rank entities by closeness to the
    query's focus entities") over the mention graph the retrieval path
    already expands one hop at a time (operators/graph.expand_one_hop).

    Teleport vector p = uniform over ``seeds`` (dangling mass restarts at
    the seeds too, keeping the distribution normalized):
    rank_{t+1}(v) = (1-d)·p(v) + d·(Σ in-contribs + dangling·p(v)).

    Scale shape: identical to :func:`pagerank` — the only addition is the
    teleport column, joined once from a BROADCAST seed set (a query's
    focus entities are a handful of ids by construction, never data-sized).
    Seeds absent from the graph still receive teleport mass (they rank
    even when unconnected), matching the serial replay.
    """
    if not seeds:
        raise ValueError("personalized_pagerank needs a non-empty seed list")
    spark = edges.sparkSession
    p0 = 1.0 / len(set(seeds))
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).dropDuplicates(
        ["src", "dst"]
    ).localCheckpoint(eager=True)
    seed_df = spark.createDataFrame(
        [(s,) for s in sorted(set(seeds))], "v string"
    )
    verts = (
        e.select(F.col("src").alias("v"))
        .unionByName(e.select(F.col("dst").alias("v")))
        .unionByName(seed_df)
        .distinct()
    )
    # teleport column: p0 on seeds, 0 elsewhere — one broadcast join, reused
    # by every iteration from the checkpoint
    verts = (
        verts.join(F.broadcast(seed_df.withColumn("__seed", F.lit(True))), "v", "left")
        .select("v", F.when(F.col("__seed"), F.lit(p0)).otherwise(F.lit(0.0)).alias("p"))
        .localCheckpoint(eager=True)
    )
    out_deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    ranks = verts.select("v", F.col("p").alias("rank"))
    for it in range(iterations):
        rd = ranks.join(out_deg.withColumnRenamed("src", "v"), "v", "left")
        dangling = F.broadcast(
            rd.agg(
                F.coalesce(
                    F.sum(F.when(F.col("deg").isNull(), F.col("rank"))), F.lit(0.0)
                ).alias("__dang")
            )
        )
        contribs = e.join(
            rd.filter(F.col("deg").isNotNull()).withColumnRenamed("v", "src"), "src"
        ).select(F.col("dst").alias("v"), (F.col("rank") / F.col("deg")).alias("c"))
        summed = contribs.groupBy("v").agg(F.sum("c").alias("s"))
        ranks = (
            verts.join(summed, "v", "left")
            .join(dangling)
            .select(
                "v",
                (
                    F.lit(1.0 - damping) * F.col("p")
                    + F.lit(damping)
                    * (F.coalesce(F.col("s"), F.lit(0.0)) + F.col("__dang") * F.col("p"))
                ).alias("rank"),
            )
        )
        if (it + 1) % max(checkpoint_every, 1) == 0 or it == iterations - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
