"""Label propagation + k-core numbers (operators/communities.py).

Parity model: the Spark operators are checked against the serial replays in
kernel/expected.py — for LPA a step-identical replay (same synchronous vote
and smallest-label tie-break), for coreness a DIFFERENT algorithm (the
classic min-degree peel) whose output provably equals the H-index
iteration's fixed point (Lü et al. 2016), making the match a genuine
differential check.
"""

from __future__ import annotations

import random

from sage_spark.kernel.expected import expected_core_numbers, expected_label_propagation
from sage_spark.operators.communities import core_numbers, label_propagation

from .spark_fixtures import spark  # noqa: F401


def _random_edges(seed: int, n_vertices: int, n_edges: int) -> list[tuple[str, str]]:
    rng = random.Random(seed)
    out = set()
    while len(out) < n_edges:
        a, b = rng.sample(range(n_vertices), 2)
        out.add((f"v{a:03d}", f"v{b:03d}"))
    return sorted(out)


def _df(spark, edges):
    return spark.createDataFrame(edges, "u string, v string")


def test_core_numbers_known_graph(spark):
    # K4 (core 3) bridged to a triangle (core 2) with a pendant (core 1)
    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    tri = [("e", "f"), ("f", "g"), ("e", "g")]
    edges = k4 + tri + [("d", "e"), ("g", "h")]
    got = {r["entity"]: r["core"] for r in core_numbers(_df(spark, edges)).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3, "e": 2, "f": 2, "g": 2, "h": 1}


def test_core_numbers_matches_serial_peel(spark):
    for seed, n, m in [(1, 30, 60), (2, 40, 120), (3, 25, 40)]:
        edges = _random_edges(seed, n, m)
        got = sorted(
            (r["entity"], r["core"]) for r in core_numbers(_df(spark, edges)).collect()
        )
        want = [(r["entity"], r["core"]) for r in expected_core_numbers(edges)]
        assert got == want, f"seed={seed}"


def test_lpa_matches_serial_replay(spark):
    for seed, n, m in [(4, 30, 60), (5, 50, 90)]:
        edges = _random_edges(seed, n, m)
        got = sorted(
            (r["entity"], r["community"])
            for r in label_propagation(_df(spark, edges), iterations=5).collect()
        )
        want = [
            (r["entity"], r["community"])
            for r in expected_label_propagation(edges, iterations=5)
        ]
        assert got == want, f"seed={seed}"


def test_lpa_partitioning_invariant(spark):
    # synchronous rounds + lexicographic tie-break => a pure function of the
    # edge SET: any repartitioning and any input orientation give the result
    edges = _random_edges(6, 40, 80)
    base = sorted(
        (r["entity"], r["community"])
        for r in label_propagation(_df(spark, edges), iterations=4).collect()
    )
    flipped = [(b, a) for a, b in reversed(edges)]
    re = _df(spark, flipped).repartition(7)
    got = sorted(
        (r["entity"], r["community"])
        for r in label_propagation(re, iterations=4).collect()
    )
    assert got == base


def test_lpa_two_cliques_bridge(spark):
    # two 4-cliques joined by one bridge edge: each clique converges to its
    # own smallest-id label
    import itertools

    c1 = list(itertools.combinations(["a1", "a2", "a3", "a4"], 2))
    c2 = list(itertools.combinations(["b1", "b2", "b3", "b4"], 2))
    edges = c1 + c2 + [("a4", "b1")]
    got = {
        r["entity"]: r["community"]
        for r in label_propagation(_df(spark, edges), iterations=5).collect()
    }
    assert {got[v] for v in ("a1", "a2", "a3")} == {"a1"}
    assert {got[v] for v in ("b2", "b3", "b4")} == {"b1"}


def test_dirty_input_tolerated(spark):
    # self-loops, dupes, reversed dupes change neither operator's output
    tri = [("x", "y"), ("y", "z"), ("x", "z")]
    dirty = tri + [("y", "x"), ("x", "x"), ("z", "y")]
    clean_core = sorted(core_numbers(_df(spark, tri)).collect())
    assert sorted(core_numbers(_df(spark, dirty)).collect()) == clean_core
    clean_lpa = sorted(label_propagation(_df(spark, tri), iterations=3).collect())
    assert sorted(label_propagation(_df(spark, dirty), iterations=3).collect()) == clean_lpa
