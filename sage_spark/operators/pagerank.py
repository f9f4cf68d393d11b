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
    # out-degree is loop-invariant: join it into the vertex STATE once, so
    # no iteration re-joins the degree table (r6 rework — one join and one
    # groupBy per iteration instead of three joins)
    out_deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    state = (
        verts.join(out_deg.withColumnRenamed("src", "v"), "v", "left")
        .select("v", "deg")
        .localCheckpoint(eager=True)
    )
    counts = state.agg(
        F.count("*").alias("n"),
        F.count(F.when(F.col("deg").isNull(), True)).alias("n_dangling"),
    ).collect()[0]
    n, has_dangling = counts["n"], counts["n_dangling"] > 0
    if n == 0:
        return state.select("v").withColumn("rank", F.lit(0.0))
    ranks = state.select("v", F.lit(1.0 / n).alias("rank"), "deg")
    prev_checkpointed = ranks
    for it in range(iterations):
        # the dangling mass aggregates into a broadcast 1-row frame, so the
        # whole iteration is a single distributed plan with no driver
        # round-trip for the scalar; when the graph has no dangling vertex
        # the term is identically 0.0 and the aggregate (and its broadcast
        # build job per iteration) is skipped outright
        if has_dangling:
            dangling = F.broadcast(
                ranks.agg(
                    F.coalesce(
                        F.sum(F.when(F.col("deg").isNull(), F.col("rank"))), F.lit(0.0)
                    ).alias("__dang")
                )
            )
        contribs = e.join(
            ranks.filter(F.col("deg").isNotNull()).withColumnRenamed("v", "src"), "src"
        ).select(
            F.col("dst").alias("v"),
            (F.col("rank") / F.col("deg")).alias("c"),
            F.lit(None).cast("long").alias("deg"),
        )
        # vertices with no inbound contribution re-enter through a zero row
        # unioned into the SAME aggregation (one shuffle) instead of a
        # per-iteration left join back to the vertex table; max(deg) picks
        # the single non-null degree each vertex carries
        summed = (
            contribs.unionByName(ranks.select("v", F.lit(0.0).alias("c"), "deg"))
            .groupBy("v")
            .agg(F.sum("c").alias("s"), F.max("deg").alias("deg"))
        )
        if has_dangling:
            ranks = summed.join(dangling).select(
                "v",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("s"), F.lit(0.0)) + F.col("__dang") / n)
                ).alias("rank"),
                "deg",
            )
        else:
            ranks = summed.select(
                "v",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("rank"),
                "deg",
            )
        at_boundary = (it + 1) % max(checkpoint_every, 1) == 0 or it == iterations - 1
        if at_boundary:
            # lazy checkpoints truncate the plan immediately but fold the
            # materialization jobs into the caller's one action (measured
            # ~15% off the 20-iteration wall vs one eager job per boundary);
            # the tol path needs the ranks NOW for the delta, so it stays
            # eager there
            ranks = ranks.localCheckpoint(eager=tol is not None)
            if tol is not None and it < iterations - 1:
                delta = (
                    ranks.join(
                        prev_checkpointed.select("v", F.col("rank").alias("__prev")), "v"
                    )
                    .agg(F.sum(F.abs(F.col("rank") - F.col("__prev"))).alias("d"))
                    .collect()[0]["d"]
                )
                if delta is not None and delta <= tol:
                    return ranks.select("v", "rank")
            prev_checkpointed = ranks
    return ranks.select("v", "rank")


def personalized_pagerank(
    edges: DataFrame,
    seeds: list[str] | DataFrame,
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

    ``seeds`` may be a Python list (the query-time form) or a one-column
    DataFrame (the maintenance form — jobs/run_maintain.py hands the
    changed-entity frame over without collecting it to the driver; a bulk
    re-ingest's seed set is corpus-shaped). Both forms produce identical
    teleport vectors; the DataFrame path costs one scalar count for the
    1/|seeds| literal.
    """
    spark = edges.sparkSession
    if isinstance(seeds, DataFrame):
        seed_df = seeds.select(F.col(seeds.columns[0]).alias("v")).dropDuplicates()
        n_seeds = seed_df.count()
        if n_seeds == 0:
            raise ValueError("personalized_pagerank needs a non-empty seed set")
    else:
        if not seeds:
            raise ValueError("personalized_pagerank needs a non-empty seed list")
        n_seeds = len(set(seeds))
        seed_df = spark.createDataFrame([(s,) for s in sorted(set(seeds))], "v string")
    p0 = 1.0 / n_seeds
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).dropDuplicates(
        ["src", "dst"]
    ).localCheckpoint(eager=True)
    verts = (
        e.select(F.col("src").alias("v"))
        .unionByName(e.select(F.col("dst").alias("v")))
        .unionByName(seed_df)
        .distinct()
    )
    # vertex STATE (teleport p on seeds, loop-invariant out-degree) built
    # once: no iteration re-joins the teleport or degree tables (the same
    # fused-state shape as pagerank, r6)
    out_deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    state = (
        verts.join(F.broadcast(seed_df.withColumn("__seed", F.lit(True))), "v", "left")
        .select("v", F.when(F.col("__seed"), F.lit(p0)).otherwise(F.lit(0.0)).alias("p"))
        .join(out_deg.withColumnRenamed("src", "v"), "v", "left")
        .localCheckpoint(eager=True)
    )
    ranks = state.select("v", F.col("p").alias("rank"), "p", "deg")
    for it in range(iterations):
        dangling = F.broadcast(
            ranks.agg(
                F.coalesce(
                    F.sum(F.when(F.col("deg").isNull(), F.col("rank"))), F.lit(0.0)
                ).alias("__dang")
            )
        )
        contribs = e.join(
            ranks.filter(F.col("deg").isNotNull()).withColumnRenamed("v", "src"), "src"
        ).select(
            F.col("dst").alias("v"),
            (F.col("rank") / F.col("deg")).alias("c"),
            F.lit(None).cast("double").alias("p"),
            F.lit(None).cast("long").alias("deg"),
        )
        summed = (
            contribs.unionByName(ranks.select("v", F.lit(0.0).alias("c"), "p", "deg"))
            .groupBy("v")
            .agg(F.sum("c").alias("s"), F.max("p").alias("p"), F.max("deg").alias("deg"))
        )
        ranks = summed.join(dangling).select(
            "v",
            (
                F.lit(1.0 - damping) * F.col("p")
                + F.lit(damping)
                * (F.coalesce(F.col("s"), F.lit(0.0)) + F.col("__dang") * F.col("p"))
            ).alias("rank"),
            "p",
            "deg",
        )
        if (it + 1) % max(checkpoint_every, 1) == 0 or it == iterations - 1:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("v", "rank")
