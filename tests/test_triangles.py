"""Triangle counting / clustering coefficient (operators/triangles.py)."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from sage_spark.operators.triangles import co_mention_edges, triangle_counts

from .spark_fixtures import spark  # noqa: F401


def _rows(df):
    return {r["entity"]: (r["degree"], r["triangles"], r["clustering"]) for r in df.collect()}


def test_k4_plus_pendant(spark):
    # K4 on 1..4, pendant 5-1: known degrees/triangles/coefficients
    k4 = [(a, b) for a, b in itertools.combinations([1, 2, 3, 4], 2)]
    edges = spark.createDataFrame(k4 + [(5, 1)], "u int, v int")
    got = _rows(triangle_counts(edges))
    assert got[1] == (4, 3, 0.5)
    for v in (2, 3, 4):
        assert got[v] == (3, 3, 1.0)
    assert got[5] == (1, 0, 0.0)


def test_dirty_input_tolerated(spark):
    # dupes, reversed dupes, and self-loops must not change the counts
    tri = [(1, 2), (2, 3), (1, 3)]
    dirty = tri + [(2, 1), (3, 2), (1, 1), (2, 3), (3, 3)]
    clean = _rows(triangle_counts(spark.createDataFrame(tri, "u int, v int")))
    got = _rows(triangle_counts(spark.createDataFrame(dirty, "u int, v int")))
    assert got == clean
    assert got[1] == (2, 1, 1.0)


def _naive_triangles(pairs):
    """Brute-force per-vertex triangle counts over canonical (u < v) pairs."""
    es = {(min(u, v), max(u, v)) for u, v in pairs if u != v}
    verts = sorted({x for e in es for x in e})
    tri = {v: 0 for v in verts}
    for a, b, c in itertools.combinations(verts, 3):
        if (a, b) in es and (b, c) in es and (a, c) in es:
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    deg = {v: sum(1 for e in es if v in e) for v in verts}
    return {v: (deg[v], tri[v]) for v in verts}


def test_random_graphs_match_naive(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 14 + trial * 5
        pairs = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(n * 3)
        ]
        pairs = [p for p in pairs if p[0] != p[1]]
        want = _naive_triangles(pairs)
        got = _rows(triangle_counts(spark.createDataFrame(pairs, "u int, v int")))
        assert {v: (d, t) for v, (d, t, _) in got.items()} == want


def test_co_mention_edges_and_cap(spark):
    mentions = spark.createDataFrame(
        [("d1", e) for e in ["a", "b", "c", "d"]]
        + [("d2", e) for e in ["a", "b"]]
        + [("d2", "a")],  # duplicate mention collapses
        "doc_id string, entity_id string",
    )
    full = {(r["u"], r["v"]) for r in co_mention_edges(mentions).collect()}
    assert full == {(u, v) for u, v in itertools.combinations(["a", "b", "c", "d"], 2)}
    # cap=2 keeps only the 2 smallest entity ids per doc before pairing
    capped = {(r["u"], r["v"]) for r in co_mention_edges(mentions, max_per_doc=2).collect()}
    assert capped == {("a", "b")}


def test_no_cartesian_in_plan(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "u int, v int")
    plan = triangle_counts(edges)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
