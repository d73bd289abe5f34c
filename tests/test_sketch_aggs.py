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
