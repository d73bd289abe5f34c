"""Sketch-typed relational aggregations (SURVEY.md §7.1 M5's "sketch
half" applied to the query surface): re-aggregatable HyperLogLog
distinct sketches and CountMin frequency sketches over `events`.

These are the relational cousins of the gradient codec (ml/sketch.py):
at 100 TB you don't count distinct users exactly per cell — you build a
fixed-size sketch per partition-cell, merge sketches up the tree
(exactly the re-sketch-per-combine shape of the SGD reduce,
SketchGradientDescent.scala:256-281), and estimate once at the end.
Both entries below keep the build/merge distributed (JVM-side Datasketches
/ CountMinSketch aggregates, one shuffle on the group key) and only move
estimates to the driver.

Correctness: at the driver's check scale the estimators are empirically
exact (HLL sparse mode below its promotion threshold; CMS with ~5
distinct keys and width 2.7e4 has collision probability ~1e-14), so both
carry real hash-checked oracles; the *tolerance* behavior at other
scales is pinned by tests/test_sketch_aggs.py bands.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sketchmlflink_spark.operators.relational import t
from sketchmlflink_spark.registry import register


# --------------------------------------------------------------------------
# sk01 — HLL sketch build + MERGE re-aggregation (day sketches → type
# totals). The merge step is the point: day-level sketches are the
# stored rollup; any coarser grain is a cheap hll_union_agg over them,
# never a re-scan of the fact table.
# --------------------------------------------------------------------------
@register(
    "sk01_hll_user_rollup",
    oracle="""
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS est_users
FROM events
GROUP BY event_type
""",
    tags=("sketch", "hll", "rollup"),
    # CONTRACT (VERDICT r4 item 8): the estimate is exact while the
    # Datasketches HLL stays in its sparse (coupon-list) regime and
    # carries its documented RSE (~0.2% at lgK 18) beyond it. lgK=18
    # keeps sf0.01-sf3 evidence scales (≤ ~45k users/type) inside the
    # exact regime — lgK 16 promoted to dense at sf1's 15k users/type
    # and drifted +0.52% — while the 2% band remains the formal
    # production contract: at real 100-TB cardinalities NO lgK is
    # exact, and the approximate answer at bounded memory IS the
    # operator's value proposition. Sketch count is bounded by
    # days x types, so the 4x lgK memory bump is immaterial.
    band=0.02,
)
def sk01_hll_user_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(day, type) HLL sketches of user_id, merged per type with
    hll_union_agg — the estimate equals the exact distinct count at this
    cardinality (Datasketches HLL is exact in sparse mode; the band at
    cardinalities past the sparse threshold is pytest-pinned), which is
    what makes the oracle hash-checkable; the scale win is that the
    rollup never re-reads events."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        # lgConfigK 18: measured sparse-exact through sf1 (15k
        # users/type, where lgK 16 went dense and drifted +0.52%);
        # at sf3 (45k users/type) the estimator leaves the exact
        # regime and sits inside its documented band (sweep r5:
        # band0.02 match). Default lgK 12 drifts ~1% already at
        # sf0.1's 1500 distinct. Past the sparse regime the band
        # contract applies (see the registration comment).
        F.expr("hll_sketch_agg(user_id, 18)").alias("user_sk"),
    )
    return daily.groupBy("event_type").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(user_sk))").alias("est_users"),
    )


# --------------------------------------------------------------------------
# sk02 — CountMin frequency sketch: one fixed-size (depth×width) sketch
# aggregated over the fact table, point-queried for item frequencies.
# --------------------------------------------------------------------------
CMS_EPS = 1e-4  # width = ceil(e/eps) ≈ 27183 counters per row
CMS_CONF = 0.99  # depth = ceil(ln(1/(1-conf))) = 5 rows
CMS_SEED = 42


def sk02_build_agg(ev: DataFrame) -> DataFrame:
    """The single-pass CMS build: one aggregation producing BOTH the
    merged sketch and the point-query domain (collect_set — bounded by
    the categorical domain size). Exposed so tests/test_plans.py can
    pin exactly one events scan in the optimized plan."""
    return ev.agg(
        F.expr(
            f"count_min_sketch(event_type, {CMS_EPS}d, {CMS_CONF}d, {CMS_SEED})"
        ).alias("cms"),
        F.collect_set("event_type").alias("domain"),
    )


@register(
    "sk02_cms_event_type_freq",
    oracle="""
SELECT event_type, CAST(count(*) AS BIGINT) AS est_count
FROM events
GROUP BY event_type
""",
    tags=("sketch", "countmin", "frequency"),
)
def sk02_cms_event_type_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed count_min_sketch aggregate over event_type, then
    driver-side point queries against the (tiny, fixed-size) merged
    sketch. The point-query domain rides the SAME single pass as the
    sketch (collect_set in the same agg — sound because event_type is a
    bounded categorical domain; an unbounded item domain would take the
    probe list as a parameter/dim table instead of collecting it), so
    the query scans events exactly once (VERDICT r3 "what's wrong" #1).
    At these parameters the CMS overestimate probability is ~1e-14, so
    the estimates hash-match the exact oracle; the eps·n error band is
    pinned in tests/test_sketch_aggs.py."""
    ev = t(spark, sf_dir, "events")
    row = sk02_build_agg(ev).first()
    jvm = spark._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytes(row["cms"]))
    )
    est = [(tp, int(cms.estimateCount(tp))) for tp in sorted(row["domain"])]
    return spark.createDataFrame(est, "event_type string, est_count long")


# --------------------------------------------------------------------------
# sk03 — quantile-summary approximate percentiles. percentile_approx
# keeps a bounded Greenwald-Khanna-style summary per group (vs sorting
# the full value set), and at accuracy 10000 over 2-decimal-grain values
# it returns exactly DuckDB's discrete quantile — so the approximate
# operator carries a full hash-checked oracle.
# --------------------------------------------------------------------------
@register(
    "sk03_approx_percentiles",
    oracle="""
SELECT event_type,
       quantile_disc(value, 0.25) AS p25,
       quantile_disc(value, 0.5)  AS p50,
       quantile_disc(value, 0.75) AS p75
FROM events
GROUP BY event_type
""",
    tags=("sketch", "quantile", "percentile"),
)
def sk03_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type p25/p50/p75 via percentile_approx (bounded-memory
    quantile summary — the scale replacement for q18's exact sort-based
    percentiles)."""
    ev = t(spark, sf_dir, "events")
    # accuracy 10^6: Greenwald-Khanna rank error <= n/accuracy, so any
    # group under a million rows gets the EXACT discrete quantile (sf0.1
    # groups are ~17k rows; the default 10000 drifted by one rank there).
    # Past that the approximate band is pinned in test_sketch_aggs.py —
    # accuracy is the memory/rank-error knob, ~a few MB of summary per
    # group at this setting.
    return ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.25, 1000000).alias("p25"),
        F.percentile_approx("value", 0.5, 1000000).alias("p50"),
        F.percentile_approx("value", 0.75, 1000000).alias("p75"),
    )


# --------------------------------------------------------------------------
# sk04 — mergeable fixed-bin histogram → percentile rollup (deterministic
# re-aggregatable quantiles, the t-digest/KLL pattern with an exact oracle).
# --------------------------------------------------------------------------
SK04_BIN_W = 4.0
SK04_BINS = 128  # covers [0, 512) — events.value sits in [0, ~490]
SK04_PCTS = (0.5, 0.9, 0.99)


@register(
    "sk04_histogram_percentile_rollup",
    oracle=f"""
WITH daily AS (
    SELECT date_trunc('day', ts) AS day,
           CAST(least(floor(value / {SK04_BIN_W}), {SK04_BINS - 1}) AS INT) AS bin,
           count(*) AS cnt
    FROM events GROUP BY 1, 2
),
merged AS (SELECT bin, sum(cnt) AS cnt FROM daily GROUP BY bin),
cum AS (
    SELECT bin, cnt,
           sum(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS running,
           sum(cnt) OVER () AS total
    FROM merged
),
p(pct) AS (VALUES {", ".join(f"(CAST({p} AS DOUBLE))" for p in SK04_PCTS)})
SELECT p.pct,
       CAST(min(c.bin) AS INT)                 AS bin,
       -- CAST AS DOUBLE: DuckDB parses the {SK04_BIN_W} literal as
       -- DECIMAL(2,1), so bin*literal would come back Decimal where
       -- Spark emits double — numerically equal (the driver's
       -- comparator tolerates it, sk04 was driver-green r5) but
       -- repr-different under a canonical hash; match types exactly
       round(CAST(min(c.bin) * {SK04_BIN_W} AS DOUBLE), 2)       AS est_lo,
       round(CAST((min(c.bin) + 1) * {SK04_BIN_W} AS DOUBLE), 2) AS est_hi
FROM p JOIN cum c ON c.running >= CAST(ceiling(p.pct * c.total) AS BIGINT)
GROUP BY p.pct
""",
    tags=("sketch", "histogram", "percentile", "mergeable"),
)
def sk04_histogram_percentile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable percentiles with DETERMINISTIC semantics: per-day
    fixed-bin value histograms (the mergeable daily sketch a metrics
    store materializes) merged into a global histogram, percentile = the
    first bin whose running count reaches ceil(p·total). Unlike
    percentile_approx (whose quantile-summary estimates drift with
    accuracy/partitioning and need tolerance bands — sk03), the
    histogram answer is exactly reproducible by any engine, which is
    what lets it stay in the hash-checked oracle set.

    Scale shape: the day×bin frame is ≤ 128 rows/day regardless of
    event volume — the shuffle after the scan-side partial agg carries
    sketch rows, never events; merging a month is a 128-row-per-day
    aggregation with no re-scan of the fact table. Bin width trades
    error (≤ SK04_BIN_W) for state, exactly the histogram-sketch
    contract."""
    ev = t(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.date_trunc("day", "ts").alias("day"),
            F.least(
                F.floor(F.col("value") / SK04_BIN_W), F.lit(SK04_BINS - 1)
            ).cast("int").alias("bin"),
        )
        .groupBy("day", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    merged = daily.groupBy("bin").agg(F.sum("cnt").alias("cnt"))
    w_cum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = merged.select(
        "bin",
        F.sum("cnt").over(w_cum).alias("running"),
        F.sum("cnt").over(Window.partitionBy()).alias("total"),
    )
    pcts = spark.createDataFrame([(p,) for p in SK04_PCTS], "pct double")
    return (
        F.broadcast(pcts)
        .join(cum, cum["running"] >= F.ceil(pcts["pct"] * cum["total"]).cast("long"))
        .groupBy("pct")
        .agg(F.min("bin").cast("int").alias("bin"))
        .select(
            "pct",
            "bin",
            F.round(F.col("bin") * SK04_BIN_W, 2).alias("est_lo"),
            F.round((F.col("bin") + 1) * SK04_BIN_W, 2).alias("est_hi"),
        )
    )


# --------------------------------------------------------------------------
# sk05 — Misra-Gries / space-saving heavy hitters: bounded per-batch
# frequency summaries merged by a plain hash-agg. The mergeable-summary
# counterpart of sk02's CMS (point query) — this one ENUMERATES the
# heavy items instead of answering point lookups.
# --------------------------------------------------------------------------
SK05_K = 65536  # counters per batch summary (≥ sf1's user cardinality → exact)
SK05_TOPN = 20


def mg_trim(vc, k: int):
    """Pure Misra-Gries trim of an exact count series (descending
    value_counts): subtract the (k+1)-th largest count from everything,
    keep positives. Returns (trimmed_counts, cut). Invariants (hypothesis
    property-tested in tests/test_sketch_aggs.py): ≤ k survivors,
    cut ≤ n/(k+1), and every item undercounts by exactly
    min(count, cut)."""
    cut = 0
    if len(vc) > k:
        cut = int(vc.iloc[k])  # (k+1)-th largest count
        vc = (vc - cut)[lambda s: s > 0]
    return vc, cut


def mg_summaries(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-Arrow-batch Misra-Gries summaries of ``col``: exact batch
    counts trimmed to ≤ k counters by subtracting the (k+1)-th largest
    count (the MG decrement run to completion). Each batch's summary
    undercounts any item by at most that cut value c_(k+1) ≤ n_batch/(k+1),
    and summing summaries keeps the bound additive: total undercount
    ≤ Σ_b cut_b ≤ n/(k+1). A trimmed batch also emits one NULL-keyed
    sentinel row carrying its cut, so the merged frame can compute the
    exact error bound without a second pass.

    Scale shape: the shuffle after mapInPandas carries ≤ min(k, batch
    distinct) rows per batch instead of raw events — state per task is
    one value_counts over an Arrow batch, independent of total n."""

    def summarize(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            vc, cut = mg_trim(pdf[col].value_counts(), k)
            out = pd.DataFrame(
                {col: vc.index.to_numpy(object), "cnt": vc.to_numpy("int64")}
            )
            out["cut"] = 0
            if cut > 0:
                out = pd.concat(
                    [out, pd.DataFrame({col: [None], "cnt": [0], "cut": [cut]})],
                    ignore_index=True,
                )
            yield out

    # summaries keep the key's native Spark type (the sentinel row is NULL)
    key_type = dict(df.dtypes)[col]
    return df.select(col).mapInPandas(
        summarize, schema=f"{col} {key_type}, cnt long, cut long"
    )


@register(
    "sk05_heavy_hitters",
    oracle=f"""
SELECT user_id,
       CAST(count(*) AS BIGINT) AS est_count,
       CAST(0 AS BIGINT) AS err_bound
FROM events
GROUP BY user_id
ORDER BY est_count DESC, user_id
LIMIT {SK05_TOPN}
""",
    tags=("sketch", "heavyhitter", "misra-gries", "mergeable"),
    # k=65536 ≥ the distinct-user domain through sf1 (15k) AND ≥ the
    # Arrow batch size (10k rows), so no batch ever trims → estimates
    # exact, err_bound 0, oracle hash-checkable. The approximate regime
    # (k < batch cardinality) is pinned by tests/test_sketch_aggs.py on
    # zipf data: est ∈ [true - n/(k+1), true].
)
def sk05_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N users by estimated event count via merged Misra-Gries
    summaries, with the summary-derived deterministic error bound as a
    column. The 100-TB shape: raw events never shuffle — each input
    split contributes a ≤ k-row summary, the merge is one hash-agg over
    summaries, and the top-N is TakeOrdered. Unlike exact groupBy-count,
    worst-case shuffle volume is k·n_splits regardless of key
    cardinality (the classic heavy-hitter contract)."""
    ev = t(spark, sf_dir, "events")
    return mg_merge_topn(mg_summaries(ev, "user_id", SK05_K), "user_id", SK05_TOPN)


def mg_merge_topn(summaries: DataFrame, col: str, topn: int) -> DataFrame:
    """Merge MG summary rows (col, cnt, cut) → top-N estimates with the
    additive error bound. All sentinel rows share the NULL key, so the
    merge agg collapses them into ONE row holding the global bound.
    Take (that row ∪ the top N) in a single distributed
    TakeOrderedAndProject — no global window ever sees the full
    distinct-key frame — then attach the bound with a window over the
    ≤ N+1 surviving rows. Shared by sk05 (batch) and st16 (streaming
    state merge)."""
    merged = summaries.groupBy(col).agg(
        F.sum("cnt").alias("est_count"), F.sum("cut").alias("cut")
    )
    cand = merged.orderBy(
        F.col(col).isNull().desc(),
        F.col("est_count").desc(),
        F.col(col),
    ).limit(topn + 1)
    w_all = Window.partitionBy()
    return (
        cand.withColumn(
            "err_bound",
            F.coalesce(
                F.sum(F.when(F.col(col).isNull(), F.col("cut"))).over(w_all),
                F.lit(0),
            ),
        )
        .where(F.col(col).isNotNull())
        .select(col, "est_count", "err_bound")
        .orderBy(F.col("est_count").desc(), col)
        .limit(topn)
    )


# --------------------------------------------------------------------------
# sk06 — KMV (k-minimum-values / theta) distinct sketches with SET
# OPERATIONS: the capability HLL (sk01) lacks. Per-type sketches of the
# k smallest user-id hashes support union, intersection and Jaccard
# between any pair of types without re-scanning events.
# --------------------------------------------------------------------------
SK06_K = 65536
_SK06_HASH_BITS = 60  # conv() of 15 hex chars → uniform in [0, 2^60)


def kmv_sketches(ev: DataFrame, k: int) -> DataFrame:
    """Per-event_type KMV sketch: the k smallest 60-bit md5 hashes of
    user_id, as a sorted array plus its size. Build = hash-agg dedup of
    (type, h) (map-side combine collapses repeats before the shuffle)
    then a per-type rank filter — the shuffle carries distinct hashes,
    never raw events, and the final state is ≤ k longs per type."""
    h = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("h")
    )
    distinct_h = ev.select("event_type", h).groupBy("event_type", "h").agg(
        F.count(F.lit(1)).alias("_c")
    )
    wk = Window.partitionBy("event_type").orderBy("h")
    return (
        distinct_h.withColumn("rn", F.row_number().over(wk))
        .where(F.col("rn") <= k)
        .groupBy("event_type")
        .agg(
            F.sort_array(F.collect_list("h")).alias("sk"),
            F.count(F.lit(1)).alias("sk_n"),
        )
    )


def kmv_setops(ev: DataFrame, k: int) -> DataFrame:
    """All type-pair set-operation estimates from KMV sketches.

    Exact arm: a sketch with sk_n < k retained EVERY distinct hash, so
    sizes/intersections are exact (modulo 60-bit collisions, p ≈ 1e-10
    at sf1) — this is the regime the oracle hash-checks.

    Estimator arm (either sketch full): standard theta combination —
    θ = the k-th smallest hash of the pair's union scaled to (0,1],
    est_union = (k-1)/θ, est_intersect = |{h ∈ A∩B : h < θ_raw}|/θ.
    Accuracy (RSE ≈ 1/√(k-2)) is pinned by tests/test_sketch_aggs.py
    with a small k over synthetic cardinalities ≫ k."""
    # Materialize the sketch table once (tiny: one ≤ k-long array per
    # type) before the pairwise self-join — without this, each join
    # alias re-derives its input and events is scanned twice.
    kmv = kmv_sketches(ev, k).localCheckpoint()
    a, b = kmv.alias("a"), kmv.alias("b")
    # The heavy array subtrees are PROJECTED ONCE per pair row before
    # any estimator math references them. The first cut inlined
    # `theta_raw` — an array_sort(array_union(...)) over two k-long
    # arrays — inside the est_inter FILTER LAMBDA; interpreted
    # higher-order functions re-evaluate the captured subtree PER
    # ELEMENT, turning one O(k log k) union into O(k² log k) per pair.
    # Invisible below sf10 because the exact arm's WHEN short-circuits
    # the estimator branch; on sf10's full sketches the first sweep sat
    # in ArrayUnion.evalUnion for 45+ minutes (jstack) with no exit.
    pair = (
        a.join(b, F.col("a.event_type") < F.col("b.event_type"))
        .withColumn("inter_sk", F.array_intersect("a.sk", "b.sk"))
        .withColumn(
            # try_element_at: the projection is EAGER (unlike the old
            # in-branch element_at, which the exact arm's WHEN never
            # evaluated), and exact-arm unions have < k elements — NULL
            # there is fine because theta is only consumed in the
            # estimator arm, where both sketches are full
            "theta_long",
            F.try_element_at(F.array_sort(F.array_union("a.sk", "b.sk")), F.lit(k)),
        )
    )
    exact = (F.col("a.sk_n") < k) & (F.col("b.sk_n") < k)
    inter_sk = F.col("inter_sk")
    theta_raw = F.col("theta_long").cast("double")
    theta = theta_raw / F.lit(float(2 ** _SK06_HASH_BITS))
    est_a = F.when(exact, F.col("a.sk_n")).otherwise(
        F.round((k - 1) / (F.element_at("a.sk", k) / F.lit(float(2 ** _SK06_HASH_BITS))))
    ).cast("long")
    est_b = F.when(exact, F.col("b.sk_n")).otherwise(
        F.round((k - 1) / (F.element_at("b.sk", k) / F.lit(float(2 ** _SK06_HASH_BITS))))
    ).cast("long")
    est_union = F.when(
        exact, F.col("a.sk_n") + F.col("b.sk_n") - F.size(inter_sk)
    ).otherwise(F.round((k - 1) / theta)).cast("long")
    est_inter = F.when(exact, F.size(inter_sk)).otherwise(
        F.round(
            F.size(F.filter(inter_sk, lambda x: x < F.col("theta_long"))) / theta
        )
    ).cast("long")
    return pair.select(
        F.col("a.event_type").alias("type_a"),
        F.col("b.event_type").alias("type_b"),
        est_a.alias("est_a"),
        est_b.alias("est_b"),
        est_union.alias("est_union"),
        est_inter.alias("est_intersect"),
        F.round(est_inter / est_union, 4).alias("est_jaccard"),
    )


@register(
    "sk06_kmv_distinct_setops",
    oracle="""
WITH s AS (SELECT DISTINCT event_type, user_id FROM events),
c AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM s GROUP BY 1),
i AS (SELECT a.event_type AS ta, b.event_type AS tb,
             CAST(count(*) AS BIGINT) AS n
      FROM s a JOIN s b USING (user_id)
      WHERE a.event_type < b.event_type GROUP BY 1, 2)
SELECT ca.event_type AS type_a, cb.event_type AS type_b,
       ca.n AS est_a, cb.n AS est_b,
       ca.n + cb.n - coalesce(i.n, 0) AS est_union,
       coalesce(i.n, 0) AS est_intersect,
       round(coalesce(i.n, 0) / (ca.n + cb.n - coalesce(i.n, 0)), 4)
           AS est_jaccard
FROM c ca
JOIN c cb ON ca.event_type < cb.event_type
LEFT JOIN i ON i.ta = ca.event_type AND i.tb = cb.event_type
""",
    tags=("sketch", "kmv", "theta", "setops"),
    # k=65536 ≥ per-type user cardinality through sf1 → sketches are
    # complete sets, the exact arm fires, oracle hash-checkable. Past
    # that the theta estimator takes its 1/√(k-2) RSE (pytest band).
    band=0.02,
)
def sk06_kmv_distinct_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user set algebra between every pair of event types from
    per-type KMV sketches: |A|, |B|, |A∪B|, |A∩B| and Jaccard — the
    set-operation queries an HLL rollup (sk01) cannot answer. One scan
    of events builds all sketches; every pairwise estimate is array
    math over ≤ k-element arrays on a 5-row frame."""
    return kmv_setops(t(spark, sf_dir, "events"), SK06_K)
