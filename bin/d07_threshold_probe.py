#!/usr/bin/env python
"""Measured scaling of d07 (LSH candidate+verify) at the PRODUCTION
similarity threshold (VERDICT r5 stretch item): the operator's docstring
claims that at cos >= 0.9 the pair listing is sparse and the run is no
longer output-bound — this probe measures it instead of asserting it.

For each sf fixture, best-of-2 wall seconds + emitted pair count at
threshold 0.4 (the catalog's audit setting) and 0.9 (production);
exponent = log3(t_sf3 / t_sf1). Results recorded in BASELINE.md.

Usage: python bin/d07_threshold_probe.py [sf_dir ...]
"""

from __future__ import annotations

import gc
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_DIRS = sys.argv[1:] or ["/root/testdata/sf0.1", "testdata_sf1", "testdata_sf3"]


def main() -> None:
    from sketchmlflink_spark.operators.dedup import d07_embed_lsh_candidate_verify
    from sketchmlflink_spark.session import get_spark

    spark = get_spark("d07-threshold-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up: codegen + Python-worker imports at the smallest scale
    d07_embed_lsh_candidate_verify(spark, "/root/testdata/sf0.01").count()
    for thr in (0.4, 0.9):
        for sf in SF_DIRS:
            best, n = None, None
            for _ in range(2):
                gc.collect()
                t0 = time.monotonic()
                n = d07_embed_lsh_candidate_verify(spark, sf, threshold=thr).count()
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            print(f"d07 thr={thr} {sf:25s} {best:8.2f}s  pairs={n}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
