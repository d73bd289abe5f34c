#!/usr/bin/env python
"""Canonical value-hash of every hash-oracled catalog query, printed as
one JSON object {query_name: md5_hex}.

Purpose: partition/config perturbation testing (VERDICT r4 item 2). A
`round(avg(<double>))` expression can be order-dependent — its 4th
decimal flips for boundary values under a different partition count or
thread count, which is exactly how t12 went red in the driver's
environment while passing every single-config local check. Running this
script under two different sessions and diffing the hashes catches that
bug class for the WHOLE catalog at once:

    SPARK_GRAFT_CPUS=4  python bin/hash_catalog.py --shuffle 2  --sf ... --out a.json
    SPARK_GRAFT_CPUS=32 python bin/hash_catalog.py --shuffle 32 --sf ... --out b.json
    diff a.json b.json

The hash canonicalizes the same way the driver's comparator does:
columns sorted by name, rows sorted, every cell rendered to an exact
string (float via repr → full bit pattern, no tolerance). Queries with
no oracle (rows-only by contract: run-varying timings, probabilistic
candidate sets) are excluded — they are nondeterministic by contract.
tests/test_perturbation.py wires this into pytest.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def _cell(v) -> str:
    if v is None:
        return "\x00null"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        return f"f:{v!r}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, (bytes, bytearray)):
        return "x:" + bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}={_cell(v[k])}" for k in sorted(v)) + "}"
    if hasattr(v, "isoformat"):
        return "t:" + v.isoformat()
    return "s:" + str(v)


def df_value_hash(df) -> str:
    cols = sorted(df.columns)
    rows = sorted("\x01".join(_cell(r[c]) for c in cols) for r in df.collect())
    h = hashlib.md5()
    h.update(("\x02".join(cols)).encode())
    for r in rows:
        h.update(b"\x03")
        h.update(r.encode())
    return h.hexdigest()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--shuffle", type=int, default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--only", default=None, help="comma-separated query names")
    args = ap.parse_args()

    from sketchmlflink_spark.registry import all_queries
    from sketchmlflink_spark.session import get_spark

    spark = get_spark("sketchmlflink-hashcat", shuffle_partitions=args.shuffle)
    spark.sparkContext.setLogLevel("ERROR")

    only = set(args.only.split(",")) if args.only else None
    import gc

    out: dict[str, str] = {}
    for name, q in all_queries().items():
        gc.collect()  # release prior queries' checkpointed lineage (see bench.py)
        if q.oracle is None:
            continue  # rows-only by contract → nondeterministic by contract
        if only is not None and name not in only:
            continue
        try:
            out[name] = df_value_hash(q.build(spark, args.sf))
        except Exception as e:  # noqa: BLE001 — the diff surfaces it
            out[name] = f"ERROR:{type(e).__name__}: {e}"[:300]
    payload = json.dumps(out, indent=0, sort_keys=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(payload)
    else:
        print(payload)
    spark.stop()


if __name__ == "__main__":
    main()
