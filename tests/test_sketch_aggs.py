"""Tolerance bands for the sketch-typed aggregations (sk01/sk02/st07):
estimator error vs exact answers, including cardinalities past the HLL
sparse threshold where the estimate is genuinely approximate."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_MID


@pytest.fixture(scope="module")
def queries():
    from sketchmlflink_spark.registry import all_queries

    return all_queries()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_MID}/events.parquet')"
    )
    return con


def test_sk01_hll_rollup_exact_at_sparse_cardinality(spark, queries, duck):
    got = {
        r["event_type"]: r["est_users"]
        for r in queries["sk01_hll_user_rollup"].build(spark, SF_MID).collect()
    }
    exact = dict(
        duck.execute(
            "SELECT event_type, count(DISTINCT user_id) FROM events GROUP BY 1"
        ).fetchall()
    )
    assert got == exact


def test_hll_union_band_past_sparse_threshold(spark, queries, duck):
    """Merged-HLL estimate at ~1600 distinct keys (past sparse mode):
    within the Datasketches lgK=12 error band (±3σ ≈ 2.5%)."""
    from sketchmlflink_spark.sources.tables import load_table

    ev = load_table(spark, SF_MID, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.expr(
            "hll_sketch_agg(concat(cast(user_id as string), '#', date_format(ts, 'yyyy-MM-dd')))"
        ).alias("sk")
    )
    est = daily.agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("e")).first()["e"]
    exact = duck.execute(
        "SELECT count(DISTINCT user_id || '#' || strftime(ts, '%Y-%m-%d')) FROM events"
    ).fetchone()[0]
    assert abs(est - exact) / exact < 0.025, f"hll union est {est} vs exact {exact}"


def test_sk02_cms_within_eps_band(spark, queries, duck):
    """CMS point estimates: est ∈ [exact, exact + eps·n] (one-sided CMS
    guarantee), and exact at this key cardinality."""
    from sketchmlflink_spark.operators.sketch_aggs import CMS_EPS

    got = {
        r["event_type"]: r["est_count"]
        for r in queries["sk02_cms_event_type_freq"].build(spark, SF_MID).collect()
    }
    exact = dict(
        duck.execute("SELECT event_type, count(*) FROM events GROUP BY 1").fetchall()
    )
    n = sum(exact.values())
    for k, e in exact.items():
        assert e <= got[k] <= e + CMS_EPS * n, f"{k}: cms {got[k]} vs exact {e}"
    assert got == exact  # no collisions at this width/cardinality


def test_st07_sketch_profile_bands(spark, queries, duck):
    """Windowed HLL++ distinct users within rsd-derived band; approx p50
    agrees with DuckDB's discrete quantile on (almost) every window —
    both estimators see few-enough values per window to be exact-ish."""
    st = queries["st07_stream_sketch_profile"].build(spark, SF_MID).toPandas()
    ex = duck.execute(
        """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
               CAST(count(*) AS BIGINT) AS n_exact,
               CAST(count(DISTINCT user_id) AS BIGINT) AS users_exact,
               quantile_disc(value, 0.5) AS p50_exact
        FROM events GROUP BY 1
        """
    ).fetchdf()
    m = st.merge(ex, on="hour_start")
    assert len(m) == len(st) == len(ex)
    assert (m.n_events == m.n_exact).all()  # count stays exact
    rel = (m.approx_users - m.users_exact).abs() / m.users_exact.clip(lower=1)
    assert rel.max() <= 0.25, f"worst HLL++ window rel err {rel.max()}"
    assert rel.mean() <= 0.05, f"mean HLL++ rel err {rel.mean()}"
    assert (m.p50_value == m.p50_exact).mean() >= 0.99


def test_hll_sketch_table_parquet_roundtrip(spark, duck, tmp_path):
    """The 100 TB rollup pattern end-to-end: per-(day, type) HLL
    sketches PERSISTED as binary columns in parquet (the stored sketch
    table), read back in a separate scan, and union-merged to answer a
    coarser-grain question — the estimate must equal building the
    sketch directly from the facts. This is what lets any later rollup
    skip the fact table entirely."""
    import os

    from sketchmlflink_spark.sources.tables import load_table

    ev = load_table(spark, SF_MID, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        F.expr("hll_sketch_agg(user_id)").alias("user_sk")
    )
    path = os.path.join(str(tmp_path), "sketch_table")
    daily.write.mode("overwrite").parquet(path)

    stored = spark.read.parquet(path)
    assert dict(stored.dtypes)["user_sk"] == "binary"
    merged = {
        r["event_type"]: r["est"]
        for r in stored.groupBy("event_type")
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(user_sk))").alias("est"))
        .collect()
    }
    direct = {
        r["event_type"]: r["est"]
        for r in ev.groupBy("event_type")
        .agg(F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))").alias("est"))
        .collect()
    }
    assert merged == direct


# --------------------------------------------------------------------------
# sk05 — Misra-Gries heavy hitters
# --------------------------------------------------------------------------
def _zipfish_rows():
    """Deterministic skewed multiset: key i contributes ~600/i rows."""
    rows = []
    for i in range(1, 201):
        rows.extend([(f"k{i:03d}",)] * (600 // i))
    return rows


def test_sk05_exact_regime_matches_groupby(spark, queries, duck):
    got = queries["sk05_heavy_hitters"].build(spark, SF_MID).collect()
    exact = duck.execute(
        """SELECT user_id, CAST(count(*) AS BIGINT) FROM events
           GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 20"""
    ).fetchall()
    assert [(r["user_id"], r["est_count"]) for r in got] == exact
    assert all(r["err_bound"] == 0 for r in got)


def test_sk05_mg_bound_in_approximate_regime(spark):
    """k=16 over 200 distinct keys per batch: every merged estimate
    undercounts by at most the summary-derived bound, and every item
    whose true count exceeds the bound survives the trim (the MG
    guarantee)."""
    from pyspark.sql import functions as F

    from sketchmlflink_spark.operators.sketch_aggs import mg_summaries

    rows = _zipfish_rows()
    df = spark.createDataFrame(rows, "user_id string").repartition(4)
    k = 16
    merged = (
        mg_summaries(df, "user_id", k)
        .groupBy("user_id")
        .agg(F.sum("cnt").alias("est"), F.sum("cut").alias("cut"))
        .collect()
    )
    bound = sum(r["cut"] for r in merged if r["user_id"] is None)
    est = {r["user_id"]: r["est"] for r in merged if r["user_id"] is not None}
    true = {}
    for (u,) in rows:
        true[u] = true.get(u, 0) + 1
    n = len(rows)
    assert 0 < bound <= n // (k + 1)  # trims actually happened, bound additive
    for u, e in est.items():
        assert e <= true[u], f"{u}: overcount {e} > {true[u]}"
        assert true[u] - e <= bound, f"{u}: undercount beyond bound"
    # completeness: anything heavier than the bound must be present
    for u, c in true.items():
        if c > bound:
            assert u in est, f"heavy item {u} (count {c}) lost"


# --------------------------------------------------------------------------
# sk06 — KMV / theta set operations
# --------------------------------------------------------------------------
def _two_type_events(spark, n_a, n_b, n_common):
    rows = [("a", f"u{i}") for i in range(n_a)]
    rows += [("b", f"u{i}") for i in range(n_a - n_common, n_a - n_common + n_b)]
    return spark.createDataFrame(rows, "event_type string, user_id string")


def test_sk06_exact_arm_matches_set_algebra(spark):
    from sketchmlflink_spark.operators.sketch_aggs import kmv_setops

    ev = _two_type_events(spark, 300, 200, 120)
    r = kmv_setops(ev, 65536).collect()
    assert len(r) == 1
    row = r[0]
    assert (row["est_a"], row["est_b"]) == (300, 200)
    assert row["est_intersect"] == 120
    assert row["est_union"] == 380
    assert row["est_jaccard"] == round(120 / 380, 4)


def test_sk06_theta_estimator_band_past_k(spark):
    """k=256 over cardinalities ≫ k: every estimate within 5/√(k-2)
    (≈ 5σ of the KMV RSE) of the exact set sizes."""
    from sketchmlflink_spark.operators.sketch_aggs import kmv_setops

    n_a, n_b, n_common = 6000, 4000, 2000
    k = 256
    ev = _two_type_events(spark, n_a, n_b, n_common)
    row = kmv_setops(ev, k).collect()[0]
    tol = 5.0 / (k - 2) ** 0.5
    for got, exact in [
        (row["est_a"], n_a),
        (row["est_b"], n_b),
        (row["est_union"], n_a + n_b - n_common),
        (row["est_intersect"], n_common),
    ]:
        assert abs(got - exact) / exact <= tol, f"est {got} vs {exact} (tol {tol:.3f})"


def test_sk06_sketch_state_is_bounded(spark):
    """The per-type sketch never holds more than k hashes, whatever the
    input cardinality — the property that makes the state shippable."""
    from sketchmlflink_spark.operators.sketch_aggs import kmv_sketches

    ev = _two_type_events(spark, 5000, 3000, 0)
    sizes = {r["event_type"]: r["sk_n"] for r in kmv_sketches(ev, 128).collect()}
    assert sizes == {"a": 128, "b": 128}


# --------------------------------------------------------------------------
# sk05 core math: hypothesis property tests (pure pandas, no Spark jobs)
# --------------------------------------------------------------------------
from collections import Counter

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st_


@st_.composite
def _multisets(draw):
    keys = draw(st_.integers(min_value=1, max_value=300))
    counts = draw(
        st_.lists(st_.integers(min_value=1, max_value=1000), min_size=keys, max_size=keys)
    )
    return {f"k{i}": c for i, c in enumerate(counts)}


@given(data=_multisets(), k=st_.integers(min_value=1, max_value=64))
@settings(max_examples=200, deadline=None)
def test_mg_trim_invariants(data, k):
    from sketchmlflink_spark.operators.sketch_aggs import mg_trim

    vc = pd.Series(data).sort_values(ascending=False)
    n = int(vc.sum())
    trimmed, cut = mg_trim(vc, k)
    assert len(trimmed) <= k
    assert 0 <= cut <= n // (k + 1)  # ≥ k+1 items each ≥ cut ⇒ (k+1)·cut ≤ n
    for item, c in data.items():
        est = int(trimmed.get(item, 0))
        assert est == max(c - cut, 0)  # undercount is exactly min(c, cut)


@given(
    data=_multisets(),
    k=st_.integers(min_value=1, max_value=64),
    n_batches=st_.integers(min_value=1, max_value=8),
    seed=st_.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=100, deadline=None)
def test_mg_merge_bound_any_partitioning(data, k, n_batches, seed):
    """Summing per-batch MG summaries over ANY partitioning of the
    multiset keeps the additive guarantee: est ≤ true and
    true − est ≤ Σ batch cuts ≤ n/(k+1). This is the distributed-merge
    soundness sk05 relies on, independent of how Spark batches rows."""
    import numpy as np

    from sketchmlflink_spark.operators.sketch_aggs import mg_trim

    rng = np.random.default_rng(seed)
    items = np.repeat(
        np.array(list(data.keys())), np.array(list(data.values()), dtype=int)
    )
    rng.shuffle(items)
    bounds = np.sort(rng.integers(0, len(items) + 1, size=n_batches - 1))
    merged: Counter = Counter()
    total_cut = 0
    for chunk in np.split(items, bounds):
        if not len(chunk):
            continue
        trimmed, cut = mg_trim(pd.Series(chunk).value_counts(), k)
        merged.update(trimmed.to_dict())
        total_cut += cut
    n = len(items)
    assert total_cut <= n // (k + 1)
    for item, c in data.items():
        est = merged.get(item, 0)
        assert est <= c
        assert c - est <= total_cut
