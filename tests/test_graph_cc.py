"""Property tests for the d13 connected-components core: Spark
label-propagation vs a plain union-find on seeded random graphs —
covering shapes the span-sharing fixture never produces (long chains
that stress pointer jumping, stars, multi-component forests)."""

from __future__ import annotations

import random

import pytest


def _union_find_components(n_vertices: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = list(range(n_vertices))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min vertex id per component, only for vertices touching an edge
    touched = {v for e in edges for v in e}
    comp: dict[int, int] = {}
    roots: dict[int, int] = {}
    for v in sorted(touched):
        r = find(v)
        roots.setdefault(r, v)  # sorted order ⇒ first seen is the min
        comp[v] = roots[r]
    return comp


def _spark_components(spark, edges: list[tuple[int, int]]) -> dict[int, int]:
    from sketchmlflink_spark.operators.dedup import label_propagate

    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["v"]: r["lbl"] for r in label_propagate(df).collect()}


SEEDED_GRAPHS = [
    ("chain-40", [(i, i + 1) for i in range(40)]),  # stresses pointer jumping
    ("star", [(0, i) for i in range(1, 30)]),
    ("two-cliques-bridge", [(a, b) for a in range(5) for b in range(a + 1, 5)]
     + [(a, b) for a in range(10, 15) for b in range(a + 1, 15)] + [(4, 10)]),
]


@pytest.mark.parametrize("name,edges", SEEDED_GRAPHS, ids=[g[0] for g in SEEDED_GRAPHS])
def test_cc_known_shapes(spark, name, edges):
    n = max(v for e in edges for v in e) + 1
    assert _spark_components(spark, edges) == _union_find_components(n, edges)


@pytest.mark.parametrize("seed", [1, 7])
def test_cc_random_forest(spark, seed):
    rng = random.Random(seed)
    n = 120
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for _ in range(80)
            for a, b in [(rng.randrange(n), rng.randrange(n))]
            if a != b
        }
    )
    assert _spark_components(spark, edges) == _union_find_components(n, edges)
