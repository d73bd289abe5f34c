#!/usr/bin/env python
"""Driver-window pre-validation: replay exactly what the spark-graft
driver's per-round correctness check will see — the FIRST 50 entries of
``__spark_entry__.queries()`` in registration order, each run against
its ``oracle_sql()`` with the repr-strict comparator (the closest local
stand-in for the driver's canonical value hash), rows-only entries
executed for non-emptiness.

Run this before freezing a round's HEAD so a window slot can never go
red for a reason a local gate would have caught. Prints one line per
query and the tally line the round artifacts record
(WINDOW_PREVAL_r*.txt).

Usage: python bin/window_preval.py [sf_dir] [window_size]
       defaults: /root/testdata/sf0.01 50
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> None:
    from sketchmlflink_spark.registry import all_queries
    from sketchmlflink_spark.session import get_spark
    from tests.oracle_check import compare_query_strict, duck_connection

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    window = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    spark = get_spark("window-preval")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(sf_dir)

    names = list(all_queries().items())[:window]
    n_strict = n_rows = n_fail = 0
    for name, q in names:
        t0 = time.monotonic()
        try:
            df = q.build(spark, sf_dir)
            if q.oracle is not None:
                problems = compare_query_strict(df, con, q.oracle)
                ok, kind = not problems, "reprS"
            else:
                ok, kind = df.count() >= 1, "rows"
                problems = [] if ok else ["empty result"]
        except Exception as e:  # noqa: BLE001
            ok, kind, problems = False, "err", [f"{type(e).__name__}: {e}"[:200]]
        dt = time.monotonic() - t0
        if ok and kind == "reprS":
            n_strict += 1
        elif ok:
            n_rows += 1
        else:
            n_fail += 1
        print(
            f"{name:40s} {kind:5s} {'OK' if ok else 'FAIL':4s} {dt:5.1f}s"
            + ("" if ok else "  " + "; ".join(problems[:2])),
            flush=True,
        )

    print(
        f"\nWINDOW PREVALIDATION: {n_strict} strict-exact + {n_rows} rows-only "
        f"= {n_strict + n_rows}/{len(names)} green, {n_fail} failed",
        flush=True,
    )
    if n_fail:
        sys.exit(1)


if __name__ == "__main__":
    main()
