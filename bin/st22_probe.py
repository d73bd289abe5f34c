#!/usr/bin/env python
"""st22 scaling probe: the hot-key-quarantined stream-stream join
across skew fixtures and scales (round-8 continued session).

What it measures, per fixture dir:
  - the census wall (the one extra batch scan st22 pays) and its result
  - st22 engine wall + emitted pair count (count(), no driver collect)
  - on UNIFORM fixtures also st08's wall, so the quarantine overhead on
    non-skewed data (census + empty-hot-path check) is a measured
    number, not a claim
  - the hot/cold split sizes, because the whole design argument is that
    the hot side's output grows ~quadratically in hot-key frequency
    (that's the answer's size, inherent to join semantics) while the
    per-task work stays bounded by the (user, 3h-block) bucketing

st08 is NOT run on skew fixtures — its single-task state exceeded
1500 s at sf1skew (measured r8, BASELINE.md); that is exactly what the
in-registry skew guard documents and st22 fixes.

Usage: python bin/st22_probe.py [dir ...]
       default: testdata_sf1 testdata_sf1skew testdata_sf3 testdata_sf3skew
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> None:
    from pyspark.sql import functions as F

    from sketchmlflink_spark.registry import is_skew_fixture
    from sketchmlflink_spark.session import get_spark
    from sketchmlflink_spark.sources.tables import load_table
    from sketchmlflink_spark.streaming import pipelines as P
    from sketchmlflink_spark.streaming.queries import (
        st08_stream_interval_join,
        st22_stream_interval_join_quarantine,
    )

    dirs = sys.argv[1:] or [
        "testdata_sf1",
        "testdata_sf1skew",
        "testdata_sf3",
        "testdata_sf3skew",
    ]
    spark = get_spark("st22-probe")
    spark.sparkContext.setLogLevel("ERROR")

    for d in dirs:
        if not os.path.isdir(d):
            print(f"{d}: missing, skipped", flush=True)
            continue
        ev = load_table(spark, d, "events")
        n_events = ev.count()
        t0 = time.monotonic()
        hot = P.hot_user_census(ev)
        t_census = time.monotonic() - t0
        n_hot_rows = (
            ev.where(F.col("user_id").isin(hot)).count() if hot else 0
        )
        t0 = time.monotonic()
        n_pairs = st22_stream_interval_join_quarantine(spark, d).count()
        t_st22 = time.monotonic() - t0
        line = (
            f"{d}: events={n_events} census={hot} ({t_census:.1f}s) "
            f"hot_rows={n_hot_rows} ({0 if not n_events else 100.0 * n_hot_rows / n_events:.1f}%) "
            f"st22_pairs={n_pairs} st22_wall={t_st22:.1f}s"
        )
        if not is_skew_fixture(d):
            t0 = time.monotonic()
            n08 = st08_stream_interval_join(spark, d).count()
            t_st08 = time.monotonic() - t0
            assert n08 == n_pairs, (n08, n_pairs)
            line += (
                f" | st08_wall={t_st08:.1f}s quarantine_overhead="
                f"{t_st22 / t_st08:.2f}x (uniform: census empty, same plan)"
            )
        else:
            line += " | st08 skipped (skew guard: single-task state, >1500s at sf1skew)"
        print(line, flush=True)


if __name__ == "__main__":
    main()
