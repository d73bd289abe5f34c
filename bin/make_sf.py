#!/usr/bin/env python
"""Deterministic scale-up of the driver testdata tables.

Replicates a source sf dir ``factor`` times with key offsets that
preserve referential integrity exactly (copy 0 is the identity, so the
source data is a subset of the output):

  customer.c_custkey   += i * (max_custkey + 1)
  orders.o_orderkey    += i * (max_orderkey + 1), o_custkey follows customer
  lineitem.l_orderkey  follows orders, l_partkey/l_suppkey follow part/supplier
  events.event_id/user_id offset by their own domain sizes
  documents.doc_id offset; text perturbed per copy (" v<i>" suffix) so the
    corpus is not 10x exact duplicates; n_chars recomputed = len(text)
  embeddings.vec_id offset; per-copy seeded gaussian jitter (sigma=0.01)
    so ANN neighbours are near- rather than exact-duplicates

region/nation are dimension tables and are copied verbatim.

Everything is seeded — same (src, factor, seed) in, same bytes out —
so an sf1 fixture set can be regenerated anywhere from the driver's
sf0.1 data.  Used for the VERDICT r3 item 1 "prove it at sf1" runs.

Usage: python bin/make_sf.py [--src /root/testdata/sf0.1] \
                             [--dst testdata_sf1] [--factor 10] [--seed 42] \
                             [--skew 0.3] [--clump 0.3]

--skew FRAC builds a HOT-KEY variant (VERDICT r6 item 2: at 100 TB
corpora are Zipf-skewed by construction; make_sf otherwise replicates
uniformly so no fixture exercises a 30%-of-rows hot key). Deterministic
modulo-on-id remaps, applied after scaling:

  events.user_id    -> user 0 for ~FRAC of rows (hot sessionize /
                       stream-session / per-user agg key)
  lineitem.l_partkey-> min partkey for ~FRAC of rows (hot join key into
                       part; FK validity preserved)
  documents.text    -> ~FRAC of docs get ' zipfhead' x 40 appended (one
                       token carrying ~FRAC of the corpus token mass —
                       the Zipf head for token-explode group-bys/joins)

The skewed dir is a SEPARATE fixture for skew benches and
correctness-under-skew oracle runs; it is not a referentially-identical
scale-up of the source (user 0 absorbs other users' rows by design).
"""

from __future__ import annotations

import argparse
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# (table, key columns to offset keyed by the domain table that owns them)
# domain -> (table that defines the domain, its key column)
DOMAINS = {
    "custkey": ("customer", "c_custkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "partkey": ("part", "p_partkey"),
    "orderkey": ("orders", "o_orderkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}


def domain_sizes(con: duckdb.DuckDBPyConnection, src: str) -> dict[str, int]:
    sizes = {}
    for dom, (table, col) in DOMAINS.items():
        (mx,) = con.execute(
            f"SELECT max({col}) FROM read_parquet('{src}/{table}.parquet')"
        ).fetchone()
        sizes[dom] = int(mx) + 1
    return sizes


def scale_sql_tables(
    con, src: str, dst: str, factor: int, d: dict[str, int], skew: float = 0.0,
    clump: float = 0.0,
) -> None:
    """Relational tables via one DuckDB COPY each (cross join with range(factor)).

    ``clump`` additionally plants a near-duplicate DOCUMENT clump (the
    text twin of scale_embeddings' vector clump, round 10 for the d04
    probe): ~clump of all docs become the FIRST source doc's text plus
    one unique trailing token (' u<doc_id>'), so pairwise Jaccard stays
    ≈1 and their MinHash bands collide in (almost) every band — the hot
    (band, band_hash) bucket shape mirror/boilerplate pages create.
    Deterministic on the OUTPUT doc_id, like the --skew remaps."""
    # Deterministic hot-key remaps (see module docstring). Modulo on the
    # ALREADY-OFFSET id so every replica contributes to the same hot key.
    pct = int(round(skew * 100))
    (min_part,) = con.execute(
        f"SELECT min(p_partkey) FROM read_parquet('{src}/part.parquet')"
    ).fetchone()
    skew_user = (
        f"CASE WHEN (event_id + i*{d['event_id']}) % 100 < {pct} "
        f"THEN 0 ELSE user_id + i*{d['user_id']} END AS user_id"
    )
    skew_part = (
        f"CASE WHEN (l_orderkey + i*{d['orderkey']}) % 100 < {pct} "
        f"THEN {min_part} ELSE l_partkey + i*{d['partkey']} END AS l_partkey"
    )
    # ~40 copies of one token per hot doc ~= the per-doc token count, so
    # 'zipfhead' carries ~skew of the corpus token mass.
    hot_text = (
        "CASE WHEN i = 0 THEN text ELSE text || ' v' || i::VARCHAR END"
        f" || CASE WHEN (doc_id + i*{d['doc_id']}) % 100 < {pct} "
        "THEN repeat(' zipfhead', 40) ELSE '' END"
    )
    plans = {
        "region": "r_regionkey, r_name",
        "nation": "n_nationkey, n_name, n_regionkey",
        "customer": (
            f"c_custkey + i*{d['custkey']} AS c_custkey, c_name, c_nationkey, "
            "c_acctbal, c_mktsegment"
        ),
        "supplier": (
            f"s_suppkey + i*{d['suppkey']} AS s_suppkey, s_name, s_nationkey, s_acctbal"
        ),
        "part": (
            f"p_partkey + i*{d['partkey']} AS p_partkey, p_name, p_brand, p_type, "
            "p_size, p_retailprice"
        ),
        "orders": (
            f"o_orderkey + i*{d['orderkey']} AS o_orderkey, "
            f"o_custkey + i*{d['custkey']} AS o_custkey, "
            "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"
        ),
        "lineitem": (
            f"l_orderkey + i*{d['orderkey']} AS l_orderkey, "
            + (skew_part if skew else f"l_partkey + i*{d['partkey']} AS l_partkey")
            + ", "
            f"l_suppkey + i*{d['suppkey']} AS l_suppkey, "
            "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
            "l_returnflag, l_linestatus, l_shipdate"
        ),
        "events": (
            f"event_id + i*{d['event_id']} AS event_id, ts, "
            + (skew_user if skew else f"user_id + i*{d['user_id']} AS user_id")
            + ", event_type, value, props"
        ),
        "documents": (
            f"doc_id + i*{d['doc_id']} AS doc_id, "
            + (
                f"{hot_text} AS text, lang, source, length({hot_text})::BIGINT AS n_chars"
                if skew
                else (
                    "CASE WHEN i = 0 THEN text ELSE text || ' v' || i::VARCHAR END AS text, "
                    "lang, source, "
                    "length(CASE WHEN i = 0 THEN text ELSE text || ' v' || i::VARCHAR END)"
                    "::BIGINT AS n_chars"
                )
            )
        ),
    }
    if clump:
        pct_clump = int(round(clump * 100))
        base_text = (
            f"(SELECT text FROM read_parquet('{src}/documents.parquet') "
            "ORDER BY doc_id LIMIT 1)"
        )
        # --skew composes with --clump: non-clumped docs keep the skew
        # hot_text zipfhead injection instead of silently reverting to
        # the plain ' v<i>' perturbation (ADVICE r10 item 2).
        non_clump_text = (
            hot_text if skew
            else "CASE WHEN i = 0 THEN text ELSE text || ' v' || i::VARCHAR END"
        )
        clump_text = (
            f"CASE WHEN (doc_id + i*{d['doc_id']}) % 100 < {pct_clump} "
            f"THEN {base_text} || ' u' || (doc_id + i*{d['doc_id']})::VARCHAR "
            f"ELSE {non_clump_text} END"
        )
        plans["documents"] = (
            f"doc_id + i*{d['doc_id']} AS doc_id, "
            f"{clump_text} AS text, lang, source, "
            f"length({clump_text})::BIGINT AS n_chars"
        )
    for table, cols in plans.items():
        reps = 1 if table in ("region", "nation") else factor
        con.execute(
            f"COPY (SELECT {cols} "
            f"FROM read_parquet('{src}/{table}.parquet') "
            f"CROSS JOIN range({reps}) t(i) "
            f"ORDER BY i) "
            f"TO '{dst}/{table}.parquet' (FORMAT PARQUET)"
        )
        print(f"  {table}: x{reps}", flush=True)


def scale_embeddings(
    src: str, dst: str, factor: int, seed: int, d: dict[str, int], clump: float = 0.0
) -> None:
    t = pq.read_table(f"{src}/embeddings.parquet")
    vec_id = t.column("vec_id").to_numpy()
    emb = np.stack(t.column("embedding").to_pylist()).astype(np.float32)
    label = t.column("label").to_numpy()
    n, dim = emb.shape
    ids, vecs, labels = [], [], []
    for i in range(factor):
        rng = np.random.default_rng(seed + i)
        jitter = 0.0 if i == 0 else rng.normal(0.0, 0.01, size=emb.shape).astype(np.float32)
        ids.append(vec_id + i * d["vec_id"])
        vecs.append(emb + jitter)
        labels.append(label)
    all_vecs = np.concatenate(vecs)
    if clump:
        # --clump FRAC: plant a dense near-duplicate CLUMP — ~FRAC of all
        # vectors become tiny jitters of ONE base vector, so they share
        # LSH buckets in (almost) every band and the in-bucket verify
        # work concentrates quadratically in those buckets. This is the
        # hot-bucket shape real corpora have (boilerplate/mirror pages)
        # and the fixture d07's one-task-per-bucket ceiling vs d18's
        # tiling is measured on (VERDICT r8 item 5). Deterministic on
        # the OUTPUT vec_id, like the --skew remaps.
        all_ids = np.concatenate(ids)
        members = (all_ids % 100) < int(round(clump * 100))
        crng = np.random.default_rng(seed + 7_777)
        base = emb[0]
        all_vecs = all_vecs.copy()
        all_vecs[members] = base + crng.normal(
            0.0, 0.001, size=(int(members.sum()), dim)
        ).astype(np.float32)
        print(f"  clump: {int(members.sum())} vectors onto one base (sigma=0.001)",
              flush=True)
    out = pa.table(
        {
            "vec_id": pa.array(np.concatenate(ids), type=pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(all_vecs.reshape(-1), type=pa.float32()), dim
            ).cast(pa.list_(pa.float32())),
            "label": pa.array(np.concatenate(labels), type=pa.int32()),
        }
    )
    pq.write_table(out, f"{dst}/embeddings.parquet")
    print(f"  embeddings: x{factor} (jitter sigma=0.01)", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="testdata_sf1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--skew", type=float, default=0.0,
                    help="hot-key fraction (e.g. 0.3); 0 = uniform replication")
    ap.add_argument("--clump", type=float, default=0.0,
                    help="near-dup embedding + document clump fraction (hot LSH bucket)")
    args = ap.parse_args()

    os.makedirs(args.dst, exist_ok=True)
    con = duckdb.connect()
    d = domain_sizes(con, args.src)
    print(f"domain sizes: {d}" + (f", skew={args.skew}" if args.skew else ""), flush=True)
    scale_sql_tables(con, args.src, args.dst, args.factor, d, skew=args.skew,
                     clump=args.clump)
    scale_embeddings(args.src, args.dst, args.factor, args.seed, d, clump=args.clump)
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        (n,) = con.execute(
            f"SELECT count(*) FROM read_parquet('{args.dst}/{t}.parquet')"
        ).fetchone()
        print(f"{t}: {n} rows", flush=True)


if __name__ == "__main__":
    main()
