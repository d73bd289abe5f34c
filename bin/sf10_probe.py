#!/usr/bin/env python
"""Third-decade scaling probe: extend the measured-exponent evidence
(BASELINE.md "sf3 scaling probes") from sf1→sf3 out to sf10.

Two parts:

1. TIMING — best-of-2 wall seconds (after a same-session sf0.01
   warm-up, gc.collect before each run) for the headline scalers at
   sf1 / sf3 / sf10, printing the per-decade exponents
   log(t_b/t_a)/log(sf_b/sf_a). The probe list is the existing
   exponent table (d06, q36, s11) plus the scan-agg headliners
   (q01, t01, d01, sk01) and d07 at the production threshold 0.9.
   s01/s02 stay excluded — they are the labeled quadratic correctness
   anchors under the BASELINE.md scale guard.

2. CORRECTNESS SPOT-CHECK — full DuckDB hash compare (band-aware,
   same logic as bin/oracle_sweep.py) at sf10 for the cheap-oracle
   subset, proving the hash contract holds a full two decades past
   the driver's sf0.01 and one past the round-5 sf3 sweep.

Usage: python bin/sf10_probe.py [--skip-gen-check]
Fixture: bin/make_sf.py --src testdata_sf1 --dst testdata_sf10 \
         --factor 10 --seed 44   (~2.4 GB, gitignored)
"""

from __future__ import annotations

import gc
import math
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_DIRS = [("sf1", "testdata_sf1", 1.0), ("sf3", "testdata_sf3", 3.0),
           ("sf10", "testdata_sf10", 10.0)]

TIMING_QUERIES = (
    "q01_pricing_summary",
    "t01_token_stats_by_lang",
    "d01_dedup_exact",
    "sk01_hll_user_rollup",
    "q36_cohort_retention",
    "s11_sq8_ann_cosine",
    "d06_embed_cosine_neardup",
)

CHECK_QUERIES = (
    "q01_pricing_summary",
    "t01_token_stats_by_lang",
    "d01_dedup_exact",
    "sk01_hll_user_rollup",
    "q36_cohort_retention",
)


def main() -> None:
    from sketchmlflink_spark.operators.dedup import d07_embed_lsh_candidate_verify
    from sketchmlflink_spark.registry import all_queries
    from sketchmlflink_spark.session import get_spark
    from tests.oracle_check import compare_query, duck_connection

    queries = all_queries()
    spark = get_spark("sf10-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: codegen + Python-worker imports at the smallest scale
    for name in TIMING_QUERIES:
        queries[name].build(spark, "/root/testdata/sf0.01").count()

    times: dict[str, dict[str, float]] = {}
    for name in TIMING_QUERIES + ("d07_thr0.9",):
        times[name] = {}
        for label, sf_dir, _ in SF_DIRS:
            best = None
            for _ in range(2):
                gc.collect()
                t0 = time.monotonic()
                if name == "d07_thr0.9":
                    d07_embed_lsh_candidate_verify(spark, sf_dir, threshold=0.9).count()
                else:
                    queries[name].build(spark, sf_dir).count()
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            times[name][label] = best
            print(f"{name:30s} {label:5s} {best:8.2f}s", flush=True)

    print("\n| query | sf1 | sf3 | sf10 | exp sf1→sf3 | exp sf3→sf10 |")
    print("|---|---|---|---|---|---|")
    for name, t in times.items():
        e13 = math.log(t["sf3"] / t["sf1"]) / math.log(3.0)
        e310 = math.log(t["sf10"] / t["sf3"]) / math.log(10.0 / 3.0)
        print(
            f"| {name} | {t['sf1']:.2f} s | {t['sf3']:.2f} s | "
            f"{t['sf10']:.2f} s | {e13:.2f} | {e310:.2f} |",
            flush=True,
        )

    print("\nsf10 correctness spot-check (DuckDB hash, band-aware):", flush=True)
    con = duck_connection("testdata_sf10")
    n_fail = 0
    for name in CHECK_QUERIES:
        q = queries[name]
        gc.collect()
        t0 = time.monotonic()
        df = q.build(spark, "testdata_sf10")
        problems = compare_query(df, con, q.oracle)
        kind = "hash"
        if problems and q.band is not None:
            problems = compare_query(df, con, q.oracle, rel_tol=q.band)
            kind = f"band{q.band}"
        dt = time.monotonic() - t0
        ok = not problems
        n_fail += 0 if ok else 1
        print(
            f"{name:40s} {kind:9s} {'OK' if ok else 'FAIL':4s} {dt:6.2f}s"
            + ("" if ok else "  " + "; ".join(problems[:3])),
            flush=True,
        )
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
