#!/usr/bin/env python
"""Capture .explain('formatted') output for named registry queries into
plans/<round>/<query>_<label>.txt (optimization-round deliverable: the
judge checks plan claims against these files).

Usage: python bin/capture_plans.py SF_DIR OUT_DIR LABEL name1 name2 ...
       (names 'ALL' → every registered query)
"""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> None:
    sf_dir, out_dir, label = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]

    from sketchmlflink_spark.registry import all_queries
    from sketchmlflink_spark.session import get_spark

    spark = get_spark("sketchmlflink-capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    if names == ["ALL"]:
        names = list(queries)
    os.makedirs(out_dir, exist_ok=True)

    for name in names:
        out = os.path.join(out_dir, f"{name}_{label}.txt")
        try:
            df = queries[name].build(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
        except Exception as e:  # noqa: BLE001 — capture what we can
            plan = f"(plan capture failed: {type(e).__name__}: {e})"
        with open(out, "w") as f:
            f.write(f"-- {name} @ {sf_dir} [{label}]\n")
            f.write(plan)
        print(f"wrote {out}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
