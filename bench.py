#!/usr/bin/env python
"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The query set spans the subsystems the judge grades: scan+agg, star
join, window, dedup (LSH), similarity (brute + LSH), text analysis,
and both SGD arms. Each query is fully materialized (count) so the
timing includes the whole plan, not just planning.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_of(sf_dir: str) -> float:
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        return float(sf)
    except ValueError:
        return 0.0


# The 21-query round-1 core (regression anchor in BASELINE.md) + the
# round-2 additions (sparse SGD arm, HLL/CMS sketch aggs, streaming
# sketch profile). Keep the core list stable — per-query times are
# compared round-over-round.
BENCH_QUERIES = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_revenue_by_nation",
    "q06_customer_distribution",
    "q07_top_order_per_customer",
    "q12_events_hourly",
    "q18_price_percentiles",
    "t01_token_stats_by_lang",
    "t04_fingerprints",
    "q21_event_type_stats_salted",
    "q22_asof_click_to_view",
    "d01_dedup_exact",
    "d04_minhash_lsh_neardup",
    "d06_embed_cosine_neardup",
    "s01_knn_cosine_brute",
    "s03_ann_lsh_cosine",
    "s05_ivf_ann_cosine",
    "mm02_media_features",
    "st01_stream_hourly_counts",
    "m03_sgd_exact_metrics",
    "m04_sgd_sketch_metrics",
    # round-2 additions
    "d07_embed_lsh_candidate_verify",
    "m05_sgd_sparse_metrics",
    "sk01_hll_user_rollup",
    "sk02_cms_event_type_freq",
    "sk03_approx_percentiles",
    "st07_stream_sketch_profile",
    "s06_ivfpq_ann_cosine",
    "t06_quality_filter",
    "p01_corpus_pipeline",
    "d08_incremental_dedup",
    "d10_span_exact_dedup",
    "d11_semantic_cluster_dedup",
    "s08_range_search_cosine",
    "mm04_frame_exact_dedup",
    "d12_decontaminate_eval_overlap",
    "p02_embedding_pipeline",
    "p03_language_mix_sample",
    "s09_knn_blocked_exact",
    # round-3 additions
    "s10_retrieval_topk_docs",
    "p04_curated_sink_roundtrip",
    "p05_stratified_exact_k",
    "p06_mixture_manifest",
    "t07_bm25_keyword_search",
    "d13_dup_graph_components",
    "t08_repetition_stats",
    "q31_bucketed_segment_revenue",
    "sk04_histogram_percentile_rollup",
    "mm05_frame_perceptual_dedup",
    "d14_minhash_estimate_accuracy",
    "q32_asof_event_order",
    "p07_sequence_packing",
]

# Brute-force correctness anchors are O(n·q)/O(n²) by definition; past
# sf1 they would dominate the suite while saying nothing new — the LSH
# (s03) and IVF (s05) scale paths stay in. (VERDICT r1 item 7.)
# s15 shares s01's physics (broadcast query set × full corpus) and its
# production path is the documented reduction + ANN index, so it joins
# the guard.
QUADRATIC_ANCHORS = {
    "s01_knn_cosine_brute",
    "s02_top_similar_pairs",
    "s15_mips_topk",
}

# The d19 audit twin re-verifies every candidate pair with exact-rational
# arithmetic so its whole pipeline hash-checks — Σ bucket² work by design,
# sweep-guarded at sf3 for the same reason (dedup.py:1257). The first sf3
# bench (BENCH_r11_sf3_builder.json) read it at 148.8 s = 18% of the whole
# suite while saying nothing new about the production path (d18, the scale
# shape, reads 25.6 s there); from r12 on the sf≥3 regression signal
# excludes it, same policy as QUADRATIC_ANCHORS at sf≥1.
AUDIT_ANCHORS_SF3 = {"d19_embed_lsh_tiled_audit"}


def bench_names(queries: dict) -> list[str]:
    """The stable anchor list (order preserved — per-query times are
    compared round-over-round) followed by EVERY other registered query
    (VERDICT r3 item 8: the whole catalog gets a timed anchor), minus
    the quadratic anchors at SF >= 1."""
    names = BENCH_QUERIES + [n for n in queries if n not in BENCH_QUERIES]
    if _sf_of(SF_DIR) >= 1.0:
        names = [n for n in names if n not in QUADRATIC_ANCHORS]
    if _sf_of(SF_DIR) >= 3.0:
        names = [n for n in names if n not in AUDIT_ANCHORS_SF3]
    return names


# Full-catalog benching (104 queries) takes minutes; if the harness
# enforces a tighter wall clock, dying mid-loop must still leave a
# parseable artifact (round 2's empty-stdout BENCH is the failure mode
# this guards). Two layers: a soft budget that stops timing new queries
# and reports the rest as skipped, and a SIGTERM/SIGINT handler that
# prints the JSON-so-far before exiting.
BENCH_BUDGET_S = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_S", "900"))

# Pinned-query machine calibration (VERDICT r4 item 3): the numpy-matmul
# and JVM-range probes under-corrected round 4's noisy container (probes
# said 1.1-1.2x, the 52-query common pack moved 1.85x) because neither
# exercises what the suite actually spends time on — shuffle, codegen
# over parquet scans, Python<->JVM crossings. The fix: three plan-locked
# ENGINE queries at a FIXED scale (sf0.01, independent of SF_DIR so the
# probe work is constant across rounds), each best-of-3, run BEFORE and
# AFTER the suite (drift between the two = in-run noise). Round-over-
# round comparisons normalize per-query against the pinned medians —
# BASELINE.md records the reference values and the protocol.
CALIB_QUERIES = ("q01_pricing_summary", "t01_token_stats_by_lang", "d01_dedup_exact")
CALIB_SF_DIR = "/root/testdata/sf0.01"

# IMMUTABLE v2 reference values (BASELINE.md "Calibration protocol v2",
# VERDICT r5 item 7): best-of-3 at sf0.01 on the round-5 builder
# container. Every round normalizes against THESE; never re-record
# silently — a structurally different container gets a dated BASELINE.md
# paragraph and the old values stay the cross-round denominator.
CALIB_REFERENCE = {
    "q01_pricing_summary": 0.185,
    "t01_token_stats_by_lang": 0.139,
    "d01_dedup_exact": 0.139,
}


def machine_factor(pre: dict | None, post: dict | None) -> tuple[float | None, bool]:
    """(factor, noise_suspect) per the BASELINE.md v2 rule: median over
    the pinned queries of min(pre, post)/reference; pre-vs-post drift
    > 1.5x on any pinned query marks the run noise-suspect. Error-string
    slots (fault-isolated calib) are ignored; with no usable slot the
    factor is None and the artifact stays raw-only."""
    import statistics

    ratios, suspect = [], False
    for name, ref in CALIB_REFERENCE.items():
        vals = [d[name] for d in (pre, post)
                if d is not None and isinstance(d.get(name), (int, float))]
        if not vals:
            continue
        ratios.append(min(vals) / ref)
        if len(vals) == 2 and max(vals) / min(vals) > 1.5:
            suspect = True
    return (round(statistics.median(ratios), 4) if ratios else None), suspect


def pinned_calib(spark, queries: dict) -> dict:
    """Best-of-3 wall seconds for each pinned calib query at sf0.01.

    Fault-isolated like the suite loop (ADVICE r5): a broken calib
    query or a missing fixture dir degrades to an error string in its
    slot instead of aborting the bench before any timing is emitted
    (the JSON-so-far emit only fires on signals, not raises)."""
    out = {}
    for name in CALIB_QUERIES:
        q = queries.get(name)
        if q is None:
            continue
        try:
            best = None
            for _ in range(3):
                t0 = time.monotonic()
                q.build(spark, CALIB_SF_DIR).count()
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            out[name] = round(best, 3)
        except Exception as e:  # noqa: BLE001 — calib must not kill the bench
            out[name] = f"{type(e).__name__}: {e}"[:200]
    return out


def main() -> None:
    import signal

    from sketchmlflink_spark.registry import all_queries
    from sketchmlflink_spark.session import get_spark

    spark = get_spark("sketchmlflink-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    names = bench_names(queries)

    start = time.monotonic()
    emitted = {"done": False}

    def emit(payload: dict) -> None:
        if emitted["done"]:
            return
        emitted["done"] = True
        # VERDICT r11 item 2: the driver keeps only a bounded tail of
        # this process's output and parses the LAST line as the summary
        # JSON — r10's round-over-round comparison was lost because the
        # line outgrew that capture. Emit minified (no separator spaces,
        # 2-decimal per-query seconds — cold-run jitter is ±10-30%, so
        # the third decimal carried no information) and make the summary
        # the absolute last stdout line (stdout is flushed and nothing
        # prints after).
        print(json.dumps(payload, separators=(",", ":")), flush=True)

    state: dict = {"timings": {}, "errors": {}, "total": 0.0,
                   "calib_mm": None, "calib_rng": None,
                   "calib_pre": None, "calib_post": None}

    def payload_now() -> dict:
        sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
        skipped = [n for n in names
                   if n not in state["timings"] and n not in state["errors"]]
        out = {
            "metric": "headline_suite_wall",
            "value": round(state["total"], 3),
            "unit": "sec",
            "queries": {n: round(t, 2) for n, t in state["timings"].items()},
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            "errors": state["errors"],
        }
        if state["calib_mm"] is not None:
            out["calib_matmul_sec"] = state["calib_mm"]
            out["calib_jvm_range_sec"] = state["calib_rng"]
        if state["calib_pre"] is not None:
            out["calib_pinned_pre"] = state["calib_pre"]
        if state["calib_post"] is not None:
            out["calib_pinned_post"] = state["calib_post"]
        # self-normalization (VERDICT r8 item 1): the artifact carries
        # its own machine factor and calib-normalized per-query column,
        # so round-over-round readers never reverse-engineer the
        # container speed from BASELINE.md by hand
        factor, suspect = machine_factor(state["calib_pre"], state["calib_post"])
        if factor is not None:
            out["calib_reference"] = CALIB_REFERENCE
            out["machine_factor"] = factor
            out["calib_noise_suspect"] = suspect
            out["value_per_calib"] = round(state["total"] / factor, 3)
            out["queries_per_calib"] = {
                n: round(t / factor, 2) for n, t in state["timings"].items()
            }
        if skipped:
            out["skipped_budget"] = skipped
        return out

    def on_term(_sig, _frm):
        emit(payload_now())
        os._exit(0)

    signal.signal(signal.SIGTERM, on_term)
    signal.signal(signal.SIGINT, on_term)

    # Fault isolation: one broken query must degrade the artifact, not
    # zero it (round 2's BENCH was rc=1 with no timings because the
    # warm-up loop died on a single AnalysisException). Queries that
    # error in warm-up are excluded from the timed loop and recorded in
    # an `errors` map; everything else still gets timed.
    errors = state["errors"]

    # Warm-up pass 1 (sf0.001): Python-worker imports, broadcast-thread
    # start, Arrow init. Pass 2 (untimed, at SF_DIR itself): AQE picks
    # join strategies per scale, so only a same-SF run actually compiles
    # the codegen stages the timed run will execute — warming at a
    # smaller SF leaves 1-2 s of Janino compile noise in first timed
    # runs (observed in this repo; ADVICE r1). Warm-up stops at 60% of
    # the wall budget (un-warmed queries still get timed, slightly
    # noisier — better than an empty artifact).
    for name in names:
        if time.monotonic() - start > BENCH_BUDGET_S * 0.6:
            break
        try:
            queries[name].build(spark, "/root/testdata/sf0.001").count()
            queries[name].build(spark, SF_DIR).count()
        except Exception as e:  # noqa: BLE001 — keep benching the rest
            errors[name] = f"{type(e).__name__}: {e}"[:500]

    # pinned machine probes, steady-state (post-warm-up); best-of-3
    # absorbs the one-time sf0.01-plan codegen of the first run
    state["calib_pre"] = pinned_calib(spark, queries)

    # Prompt Python GC between queries: several operators localCheckpoint
    # intermediate frames (t12/t13 vocab, st17 merge state ...), whose
    # executor-pinned blocks are only released after the Python-side
    # DataFrame refs die and the JVM ContextCleaner runs. Left to lazy
    # GC, a 138-query session accumulates pinned blocks and late-suite
    # heavy queries pay GC/memory pressure that controlled single-query
    # probes never see (r5: in-suite d07 43.7 s vs 12.9 s probed on the
    # same data+machine).
    import gc

    timings = state["timings"]
    for name in names:
        if name in errors:
            continue
        if time.monotonic() - start > BENCH_BUDGET_S:
            break  # remaining names land in skipped_budget
        q = queries[name]
        gc.collect()
        t0 = time.monotonic()
        try:
            q.build(spark, SF_DIR).count()
        except Exception as e:  # noqa: BLE001
            errors[name] = f"{type(e).__name__}: {e}"[:500]
            continue
        dt = time.monotonic() - t0
        timings[name] = round(dt, 3)
        state["total"] += dt

    # Machine-speed calibration: query wall times vary ~2x across the
    # containers that run this bench round-over-round, so the JSON
    # carries two fixed-work normalizers — a seeded numpy matmul
    # (BLAS/CPU) and a pure-JVM codegen range-sum (Spark scheduling +
    # whole-stage codegen). Compare rounds as value/calib, not raw secs.
    import numpy as np

    a = np.random.default_rng(0).standard_normal((2000, 2000))
    t0 = time.monotonic()
    _ = a @ a
    state["calib_mm"] = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    spark.range(2_000_000_000).selectExpr("sum(id)").collect()
    state["calib_rng"] = round(time.monotonic() - t0, 3)
    # post-suite pinned probes: pre/post drift bounds in-run noise
    state["calib_post"] = pinned_calib(spark, queries)

    emit(payload_now())
    spark.stop()


if __name__ == "__main__":
    main()
