#!/usr/bin/env python
"""Phase attribution for streaming-replay queries (optimization guide
§1: measure first). Runs named registry queries in a fresh session with
SPARK_GRAFT_STREAM_PROGRESS_DIR pointed at a scratch dir, then reports,
per streaming sub-query the entry started: batch count and the
durationMs breakdown (addBatch / getBatch / latestOffset / walCommit /
commitOffsets / queryPlanning) summed over batches — so replay wall
time is attributed to engine phases instead of guessed at. Prints one
JSON line per entry plus a human table on stderr.

Usage: python bin/st_phase_probe.py SF_DIR name1 name2 ...
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> None:
    sf_dir, names = sys.argv[1], sys.argv[2:]
    scratch = tempfile.mkdtemp(prefix="st_phase_probe_")
    os.environ["SPARK_GRAFT_STREAM_PROGRESS_DIR"] = scratch

    from sketchmlflink_spark.registry import all_queries
    from sketchmlflink_spark.session import get_spark

    spark = get_spark("sketchmlflink-st-phase-probe")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # warm-up at sf0.001: worker imports, codegen, replay-fixture builds
    for name in names:
        queries[name].build(spark, "/root/testdata/sf0.001").count()
    shutil.rmtree(scratch, ignore_errors=True)

    for name in names:
        os.makedirs(scratch, exist_ok=True)
        t0 = time.monotonic()
        queries[name].build(spark, sf_dir).count()
        wall = round(time.monotonic() - t0, 3)
        subs = []
        for fn in sorted(os.listdir(scratch)):
            batches = [json.loads(l) for l in open(os.path.join(scratch, fn))]
            agg: dict[str, float] = {}
            # numRowsTotal is ALWAYS 0 since the session set
            # rocksdb.trackTotalNumberOfRows=false (that is the point of
            # the setting) — attribute state size via the updated/removed
            # counters instead, which stay live (ADVICE r11)
            state = {"rows_updated": 0, "rows_removed": 0, "commit_ms": 0}
            for b in batches:
                for k, v in (b.get("durationMs") or {}).items():
                    agg[k] = agg.get(k, 0) + v
                for so in b.get("stateOperators") or []:
                    state["rows_updated"] += so.get("numRowsUpdated", 0)
                    state["rows_removed"] += so.get("numRowsRemoved", 0)
                    state["commit_ms"] += so.get("commitTimeMs", 0)
            subs.append(
                {
                    "query_file": fn,
                    "n_batches": len(batches),
                    "duration_ms": {k: round(v, 1) for k, v in sorted(agg.items())},
                    "state": state,
                }
            )
        print(json.dumps({"name": name, "wall_s": wall, "sub_queries": subs}), flush=True)
        for s in subs:
            print(
                f"# {name} [{s['query_file']}] batches={s['n_batches']} "
                f"dur={s['duration_ms']} state={s['state']}",
                file=sys.stderr, flush=True,
            )
        shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
