#!/usr/bin/env python
"""Full local oracle sweep: every registered query vs its DuckDB oracle
(or rows-only execution) at a given sf dir. Prints one line per query
and a final tally — the reproducible backing for SURVEY.md §8 status
claims.

Usage: python bin/oracle_sweep.py [sf_dir] [--skip name1,name2] [--strict]
       [--no-default-guard]

The BASELINE.md scale guard is applied AUTOMATICALLY: each registry
entry carries its own `scale_guard_sf`, the sweep infers the scale
factor from the sf_dir path, and guarded entries are skipped at or
above their threshold (ADVICE r6 — no invocation depends on a manually
passed list). --skip adds names on top; --no-default-guard disables
the automatic guard (to deliberately run a quadratic anchor).

--strict switches the comparator to the repr-strict cross-engine diff
(tests/oracle_check.compare_query_strict): canonical sorted rows,
floats via repr, ZERO tolerance — i.e. what the driver's canonical
value hash actually sees. The default isclose comparator treats
-0.0 == 0.0 and date == midnight-timestamp, which let t12's signed
zero through two rounds of local gates (round-5 verdict item 2).
Run the strict mode at sf0.01 every round.
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

_args = [a for a in sys.argv[1:] if not a.startswith("--")]
SF_DIR = _args[0] if _args else "/root/testdata/sf0.01"
STRICT = "--strict" in sys.argv[1:]
SKIP: set[str] = set()
for _a in sys.argv[1:]:
    if _a.startswith("--skip"):
        SKIP = set(_a.split("=", 1)[1].split(",")) if "=" in _a else set(
            sys.argv[sys.argv.index(_a) + 1].split(",")
        )
SKEW_SKIP: set[str] = set()  # skew-guarded names, tracked apart from SKIP
# so the per-line and tally labels attribute each skip to its true guard
ONLY: set[str] = set()  # --only name1,name2 → sweep just these entries
for _a in sys.argv[1:]:
    if _a.startswith("--only"):
        ONLY = set(_a.split("=", 1)[1].split(",")) if "=" in _a else set(
            sys.argv[sys.argv.index(_a) + 1].split(",")
        )


def main() -> None:
    from sketchmlflink_spark.registry import (
        all_queries,
        infer_sf,
        scale_guarded_names,
        skew_guarded,
    )
    from sketchmlflink_spark.session import get_spark
    from tests.oracle_check import (
        compare_query,
        compare_query_strict,
        duck_connection,
    )

    spark = get_spark("sketchmlflink-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(SF_DIR)
    queries = all_queries()
    if ONLY:
        unknown = ONLY - set(queries)
        if unknown:
            print(f"--only names not in registry: {sorted(unknown)}", flush=True)
            sys.exit(2)
        queries = {n: q for n, q in queries.items() if n in ONLY}

    # always defined — --no-default-guard must not NameError the skip
    # check below (ADVICE r10 item 1); it just leaves the set empty
    auto: set[str] = set()
    if "--no-default-guard" not in sys.argv[1:]:
        sf = infer_sf(SF_DIR)
        if sf is None:
            print(
                f"WARNING: no sf token in {SF_DIR!r} — scale unknown, "
                "quadratic correctness anchors will run UNGUARDED",
                flush=True,
            )
        auto = scale_guarded_names(sf)
        if auto:
            print(f"auto scale guard at sf={sf}: {sorted(auto)}", flush=True)
        skew = skew_guarded(SF_DIR)
        for name, reason in sorted(skew.items()):
            print(f"skew guard: {name} — {reason}", flush=True)
        SKEW_SKIP.update(skew)

    import gc

    # one disjoint attribution, computed once, driving BOTH the per-line
    # labels and the tally (ADVICE r10 item 5: the two previously used
    # opposite precedence orders, so a name in several skip sets could be
    # labeled "skew guard" per-line but counted under --skip in the
    # summary). Precedence: explicit --skip > skew guard > scale guard.
    manual = SKIP & set(queries)
    skew_skipped = (SKEW_SKIP & set(queries)) - manual
    guard_skipped = (auto & set(queries)) - manual - skew_skipped
    skip_label = {n: "--skip" for n in manual}
    skip_label.update({n: "skew guard" for n in skew_skipped})
    skip_label.update({n: "scale guard" for n in guard_skipped})

    n_hash = n_rows_only = n_band = n_fail = 0
    for name, q in queries.items():
        gc.collect()  # release prior queries' checkpointed lineage (see bench.py)
        if name in skip_label:
            print(f"{name:40s} skip  ({skip_label[name]})", flush=True)
            continue
        t0 = time.monotonic()
        try:
            df = q.build(spark, SF_DIR)
            if q.oracle is not None:
                if STRICT:
                    problems = compare_query_strict(df, con, q.oracle)
                    ok = not problems
                    kind = "reprS"
                else:
                    problems = compare_query(df, con, q.oracle)
                    ok = not problems
                    kind = "hash"
                if not ok and q.band is not None:
                    # approximate estimator past its exact regime:
                    # fall back to its documented tolerance band
                    problems = compare_query(df, con, q.oracle, rel_tol=q.band)
                    ok = not problems
                    kind = f"band{q.band}"
            else:
                ok = df.count() >= 1
                problems = [] if ok else ["empty result"]
                kind = "rows"
        except Exception as e:  # noqa: BLE001
            ok, kind, problems = False, "err", [f"{type(e).__name__}: {e}"[:300]]
        dt = time.monotonic() - t0
        if ok and kind in ("hash", "reprS"):
            n_hash += 1
        elif ok and kind.startswith("band"):
            n_band += 1
        elif ok:
            n_rows_only += 1
        else:
            n_fail += 1
        status = "OK" if ok else "FAIL"
        print(f"{name:40s} {kind:5s} {status:4s} {dt:6.2f}s"
              + ("" if ok else "  " + "; ".join(problems[:3])), flush=True)

    total = len(queries) - len(skip_label)
    print(
        f"\nSWEEP {SF_DIR}: {n_hash} hash-matched + {n_band} band-matched + "
        f"{n_rows_only} rows-only OK "
        f"= {n_hash + n_band + n_rows_only}/{total} green, {n_fail} failed"
        + (f" ({len(guard_skipped)} skipped by scale guard: {sorted(guard_skipped)})" if guard_skipped else "")
        + (f" ({len(skew_skipped)} skipped by skew guard: {sorted(skew_skipped)})" if skew_skipped else "")
        + (f" ({len(manual)} skipped by --skip: {sorted(manual)})" if manual else "")
    )
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
