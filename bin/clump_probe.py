#!/usr/bin/env python
"""d07-vs-d18 on a CLUMPED fixture (make_sf --clump): the hot-LSH-bucket
shape d18 exists for (VERDICT r8 item 5).

A near-dup clump shares buckets in (almost) every band, so d07's
one-Python-worker-per-(band, bucket) verify concentrates the clump's
quadratic work — and its multi-million-pair emission — in single tasks,
while d18 splits the same bucket into tile-pair tasks. This probe
records, per operator: wall seconds, total pairs, pairs emitted per
TASK of the verify stage (spark_partition_id of the UDF output — the
single-task ceiling in rows, machine-independent), and a deterministic
pair checksum (d07/d18 must agree exactly — same first-match emission).

Both operators' verify stages land on spark.sql.shuffle.partitions
tasks here; what the probe exposes is the SHARE of output one task
owns: d07 cannot split the clump bucket no matter how many partitions
exist, d18 spreads it across tile pairs.

Usage: python bin/clump_probe.py [fixture_dir] [tile]
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "testdata_sf1clump"
TILE = int(sys.argv[2]) if len(sys.argv) > 2 else 2048


def main() -> None:
    from pyspark.sql import functions as F

    from sketchmlflink_spark.operators import dedup as D
    from sketchmlflink_spark.session import get_spark

    spark = get_spark("clump-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def profile(name, df):
        t0 = time.monotonic()
        per_task = (
            df.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.xxhash64("id_a", "id_b").cast("decimal(38,0)")).alias("c"),
            )
            .collect()
        )
        wall = time.monotonic() - t0
        sizes = sorted((r["n"] for r in per_task), reverse=True)
        total = sum(sizes)
        chk = sum(r["c"] for r in per_task)
        print(
            f"{name}: wall {wall:.2f}s  pairs {total}  verify tasks {len(sizes)}  "
            f"max-task pairs {sizes[0]} ({100.0 * sizes[0] / total:.1f}% of output "
            f"in one task)  top5 {sizes[:5]}  checksum {chk}",
            flush=True,
        )
        return total, chk, wall

    # warm-up (worker imports, codegen) on the small fixture
    D.d07_embed_lsh_candidate_verify(spark, "/root/testdata/sf0.001").count()
    D.d18_embed_lsh_tiled_pairs(spark, "/root/testdata/sf0.001", tile=TILE).count()

    n7, c7, w7 = profile("d07", D.d07_embed_lsh_candidate_verify(spark, SF_DIR))
    n18, c18, w18 = profile(
        f"d18(tile={TILE})", D.d18_embed_lsh_tiled_pairs(spark, SF_DIR, tile=TILE)
    )
    assert (n7, c7) == (n18, c18), f"pair sets diverge: {(n7, c7)} vs {(n18, c18)}"
    print(f"pair-count + checksum parity: OK  (d07/d18 wall ratio {w7 / w18:.2f}x)",
          flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
