#!/usr/bin/env python
"""Controlled best-of-3 re-pin for named queries — the q28 protocol
(BASELINE.md round-9/round-10 records) as a reusable tool: fresh quiet
session, sf0.001 warm-up of each target, the pinned calib trio at
sf0.01 beside it (so the round-over-round reader can normalize), then
best-of-3 at the target SF dir. Prints one JSON line.

Usage: python bin/repin_probe.py SF_DIR name1 name2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> None:
    sf_dir, names = sys.argv[1], sys.argv[2:]
    import gc

    from bench import CALIB_REFERENCE, machine_factor, pinned_calib
    from sketchmlflink_spark.registry import all_queries
    from sketchmlflink_spark.session import get_spark

    spark = get_spark("sketchmlflink-repin")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    for name in names:  # warm-up: worker imports, codegen, AQE at tiny SF
        queries[name].build(spark, "/root/testdata/sf0.001").count()
    calib = pinned_calib(spark, queries)

    out: dict = {"sf_dir": sf_dir, "calib_pinned": calib,
                 "calib_reference": CALIB_REFERENCE, "runs": {}, "best": {}}
    factor, suspect = machine_factor(calib, None)
    out["machine_factor"], out["calib_noise_suspect"] = factor, suspect
    for name in names:
        runs = []
        for _ in range(3):
            gc.collect()
            t0 = time.monotonic()
            queries[name].build(spark, sf_dir).count()
            runs.append(round(time.monotonic() - t0, 3))
        out["runs"][name] = runs
        out["best"][name] = min(runs)
        print(f"# {name}: {runs} best={min(runs)}", file=sys.stderr, flush=True)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
