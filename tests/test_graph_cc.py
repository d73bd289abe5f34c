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


# ---------------------------------------------------------------------------
# d15 PageRank: numpy power-iteration oracle on seeded random graphs +
# the rank-mass invariant (symmetric graph, no dangling ⇒ Σr == 1).
# ---------------------------------------------------------------------------
def _numpy_pagerank(edges: list[tuple[int, int]], iters: int, d: float) -> dict[int, float]:
    import numpy as np

    und = edges + [(b, a) for a, b in edges]
    verts = sorted({v for e in und for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    deg = np.zeros(n)
    for a, _ in und:
        deg[idx[a]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1.0 - d) / n)
        for a, b in und:
            nxt[idx[b]] += d * r[idx[a]] / deg[idx[a]]
        r = nxt
    return {v: r[idx[v]] for v in verts}


@pytest.mark.parametrize("seed", [7, 19])
def test_d15_pagerank_matches_numpy_and_conserves_mass(spark, seed):
    from pyspark.sql import functions as F

    from sketchmlflink_spark.operators.dedup import D15_DAMPING, D15_ITERS

    rng = random.Random(seed)
    n = 40
    edges = list({(a, b) for _ in range(60)
                  for a, b in [sorted(rng.sample(range(n), 2))]})
    edges = [(int(a), int(b)) for a, b in edges]
    df = spark.createDataFrame(edges, "src long, dst long")

    # drive the same loop d15 runs, but from an arbitrary edge frame
    und = df.union(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = (und.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
              .select(F.col("src").alias("v"), "deg").localCheckpoint())
    und_deg = und.join(deg.select(F.col("v").alias("src"), "deg"), "src").localCheckpoint()
    n_v = deg.count()
    ranks = deg.select("v", F.lit(1.0 / n_v).alias("r"))
    for _ in range(D15_ITERS):
        contribs = (und_deg.join(ranks, und_deg["src"] == ranks["v"])
                    .groupBy("dst").agg(F.sum(F.col("r") / F.col("deg")).alias("s")))
        ranks = contribs.select(
            F.col("dst").alias("v"),
            (F.lit((1.0 - D15_DAMPING) / n_v) + D15_DAMPING * F.col("s")).alias("r"),
        ).localCheckpoint()
    got = {row["v"]: row["r"] for row in ranks.collect()}

    want = _numpy_pagerank(edges, D15_ITERS, D15_DAMPING)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12, (v, got[v], want[v])
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conserved
