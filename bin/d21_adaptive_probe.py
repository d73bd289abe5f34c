#!/usr/bin/env python
"""Adaptive-tile geometry probe (VERDICT r10 item 6): show the per-task
candidate-emission cap holds across clump sizes 0.1×–10× the D21_TILE
constant WITHOUT manual tile selection, pair set unchanged.

For each fixture, using the PRODUCTION default tile (no override):
  * the hottest (band, band_hash) bucket size and the geometry the
    adaptive rule derives for it (tile_b, m, tile-pair tasks),
  * per-TASK emitted-pair counts measured from the tile-pair frame
    (|ia|·|ib| cross / triangular same-tile — exact, no expansion), so
    the 10× fixture (≥1.6B raw pairs) probes in seconds,
  * max-task share of total emission + the cap ratio vs D21_TILE².
On fixtures small enough to expand fully (≤ ~0.7×), also assert the
d04 ↔ d21 verified pair checksum parity end-to-end.

Usage: python bin/d21_adaptive_probe.py fixture_dir [--full-parity]
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_DIR = sys.argv[1]
FULL_PARITY = "--full-parity" in sys.argv[1:]


def main() -> None:
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from sketchmlflink_spark.functions import text as T
    from sketchmlflink_spark.operators import dedup as D
    from sketchmlflink_spark.session import get_spark

    from sketchmlflink_spark.operators.relational import t

    spark = get_spark("d21-adaptive-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # per-key task structure must stay visible (see d04_clump_probe)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

    docs = t(spark, SF_DIR, "documents")
    tok = docs.select("doc_id", T.tokens("text").alias("tk")).where(
        F.size("tk") >= D.SHINGLE_SIZE
    )
    sh = tok.select("doc_id", D.shingles(F.col("tk")).alias("sh")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sigs = D.minhash_signatures(sh).localCheckpoint()

    bands = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.xxhash64(
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"s{j * D.MINHASH_ROWS_PER_BAND + r}").cast("string")
                            for r in range(D.MINHASH_ROWS_PER_BAND)
                        ],
                    )
                ).alias("band_hash"),
            )
            for j in range(D.MINHASH_BANDS)
        ]
    )
    exploded = sigs.select("doc_id", F.explode(bands).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.band_hash").alias("band_hash")
    )
    census = (
        exploded.groupBy("band", "band_hash").count()
        .agg(F.max("count"), F.count(F.lit(1)), F.sum("count"))
        .first()
    )
    hot, n_buckets, n_rows = census
    print(
        f"{SF_DIR}: hottest bucket {hot} rows "
        f"({hot / D.D21_TILE:.2f}x D21_TILE={D.D21_TILE}), "
        f"{n_buckets} buckets / {n_rows} banded rows", flush=True,
    )

    # tile-pair frame at the PRODUCTION default tile — per-task emission
    tp = D._minhash_tile_pairs(exploded, "doc_id", D.D21_TILE)
    emitted = F.when(
        F.col("same_tile"),
        (F.size("ia") * (F.size("ia") - 1) / 2).cast("long"),
    ).otherwise((F.size("ia").cast("long") * F.size("ib")))
    t0 = time.monotonic()
    per_task = (
        tp.select(F.spark_partition_id().alias("pid"), emitted.alias("em"))
        .groupBy("pid").agg(F.sum("em").alias("n"), F.max("em").alias("mx"))
        .collect()
    )
    wall = time.monotonic() - t0
    sizes = sorted((r["n"] for r in per_task), reverse=True)
    total = sum(sizes)
    max_single = max(r["mx"] for r in per_task)
    print(
        f"  tile-pair geometry (default tile, adaptive): wall {wall:.1f}s  "
        f"emitted-pairs total {total}  tasks {len(sizes)}  "
        f"max-task {sizes[0]} ({100.0 * sizes[0] / max(total, 1):.1f}% share)  "
        f"max single tile-pair emission {max_single} "
        f"(cap ratio {max_single / (D.D21_TILE ** 2):.3f} of tile^2)  "
        f"top5 {sizes[:5]}", flush=True,
    )

    if FULL_PARITY:
        def chk(df, *cols):
            r = df.agg(
                F.count(F.lit(1)),
                F.sum(F.xxhash64(*cols).cast("decimal(38,0)")),
            ).first()
            return r[0], r[1]

        t0 = time.monotonic()
        n04, c04 = chk(D.d04_minhash_lsh_neardup(spark, SF_DIR), "doc_a", "doc_b")
        w04 = time.monotonic() - t0
        t0 = time.monotonic()
        n21, c21 = chk(D.d21_minhash_tiled_neardup(spark, SF_DIR), "doc_a", "doc_b")
        w21 = time.monotonic() - t0
        print(
            f"  parity: d04 {n04} pairs {w04:.1f}s / d21 {n21} pairs {w21:.1f}s  "
            f"checksums {'EQUAL' if (n04, c04) == (n21, c21) else 'DIVERGE'}",
            flush=True,
        )
        assert (n04, c04) == (n21, c21)
    sh.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
