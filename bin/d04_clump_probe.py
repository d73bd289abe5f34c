#!/usr/bin/env python
"""d04's MinHash-LSH verify under a near-dup DOCUMENT clump (VERDICT r9
item 5 — the d18 lesson applied to the minhash family).

make_sf --clump now plants a text clump: ~FRAC of docs become one base
doc's text plus a unique trailing token, so their bands collide in
(almost) every band. d04's candidate generation is a self-join keyed on
(band, band_hash); a join KEY cannot split across tasks, so the clump's
quadratic pair production concentrates per band — but UNLIKE d07
(where ALL bands of a bucket land in the one (band, bucket) task of an
80-task applyInPandas), each band is a DIFFERENT join key, so banding
spreads a clump across at most MINHASH_BANDS tasks. Measured (r10,
30% clump): two of the 8 band keys hash to one reducer → 24.1% of the
raw join output in one task, per-key work growing quadratically and
uncapped with clump size. d21 (lsh_candidate_pairs_tiled) fixes this
with d18's recipe — tile the bucket members, pack tiles into single
rows, self-join tile PAIRS, expand after the (band, band_hash, ta, tb)
repartition with a tile² per-task output cap: max-task share drops to
6.5% at tile=256 with a byte-identical pair checksum. The downstream
stages (distinct, exact-Jaccard verify) shuffle on pair ids and spread
freely under both.

Reported per stage: total rows, tasks, max-task rows and share, top-5
task sizes; plus d04/d21 end-to-end walls and pair checksums (asserted
equal).

Usage: python bin/d04_clump_probe.py [fixture_dir] [tile]
Fixture: python bin/make_sf.py --src /root/testdata/sf0.1 \
           --dst testdata_sf0.1clump --factor 1 --seed 42 --clump 0.3
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "testdata_sf0.1clump"
# The fixture's clump (~1500 docs) fits inside the production D21_TILE
# (2048) — one tile per bucket, i.e. the d04 shape and no spreading at
# all. Probe with a tile that forces the multi-tile geometry a
# 100-TB-scale clump would hit (first run proved the degenerate case:
# tile=2048 reads 25.3%, the same one-task share as the plain shuffle
# join).
TILE = int(sys.argv[2]) if len(sys.argv) > 2 else 256


def main() -> None:
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from sketchmlflink_spark.functions import text as T
    from sketchmlflink_spark.operators import dedup as D
    from sketchmlflink_spark.operators.relational import t
    from sketchmlflink_spark.session import get_spark

    spark = get_spark("d04-clump-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # At this fixture scale AQE coalesces the whole banded join into ONE
    # ~200MB task, hiding the key→task structure entirely (first probe
    # run: every stage "100% in one task"). A 100-TB run's shuffle
    # blocks are far past the coalesce target, so the structural
    # question — can a single (band, band_hash) KEY concentrate — is
    # what matters; disable coalescing so tasks map to hash partitions
    # of the join key and the per-key concentration is visible.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

    def profile(name, df, *cols):
        t0 = time.monotonic()
        per_task = (
            df.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("c"),
            )
            .collect()
        )
        wall = time.monotonic() - t0
        sizes = sorted((r["n"] for r in per_task), reverse=True)
        total = sum(sizes)
        chk = sum(r["c"] for r in per_task)
        print(
            f"{name}: wall {wall:.2f}s  rows {total}  tasks {len(sizes)}  "
            f"max-task {sizes[0]} ({100.0 * sizes[0] / total:.1f}% of output "
            f"in one task)  top5 {sizes[:5]}  checksum {chk}",
            flush=True,
        )
        return total, chk

    # warm-up on the small fixture
    D.d04_minhash_lsh_neardup(spark, "/root/testdata/sf0.001").count()

    docs = t(spark, SF_DIR, "documents")
    tok = docs.select("doc_id", T.tokens("text").alias("tk")).where(
        F.size("tk") >= D.SHINGLE_SIZE
    )
    sh = tok.select("doc_id", D.shingles(F.col("tk")).alias("sh")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sigs = D.minhash_signatures(sh).localCheckpoint()

    # stage 1 — the raw per-band candidate join (pre-distinct) under the
    # plan local data actually gets: the signature table is far below
    # the broadcast threshold, so Spark BROADCASTS one side and the
    # quadratic output spreads by left-side row — no key concentration
    # at all at this scale
    profile(
        "cands raw (broadcast plan)",
        D.lsh_candidate_pairs(sigs, distinct=False),
        "id_a",
        "id_b",
    )
    # stage 1b — the 100-TB plan shape: signatures of a 100-TB corpus
    # exceed any broadcast threshold, so the join shuffles on
    # (band, band_hash) and a join KEY cannot split across tasks; force
    # that plan to measure the per-key concentration banding leaves
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    profile(
        "cands raw (forced shuffle join — the 100-TB plan)",
        D.lsh_candidate_pairs(sigs, distinct=False),
        "id_a",
        "id_b",
    )
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    # stage 1c — d21's tiled generation: the expansion happens after the
    # repartition on (band, band_hash, ta, tb) with a tile² output cap
    # per task, broadcast-threshold-independent by construction
    profile(
        f"cands raw (d21 tiled expansion, tile={TILE})",
        D.lsh_candidate_pairs_tiled(sigs, tile=TILE, distinct=False),
        "id_a",
        "id_b",
    )
    # stage 2 — after distinct (shuffles on the pair: spreads freely)
    profile("cands distinct", D.lsh_candidate_pairs(sigs), "id_a", "id_b")
    # end-to-end d04 (verify joins shuffle on id_a/id_b: spread freely)
    t0 = time.monotonic()
    out = D.d04_minhash_lsh_neardup(spark, SF_DIR)
    n, chk = profile("d04 verified pairs", out, "doc_a", "doc_b")
    print(f"d04 end-to-end wall {time.monotonic() - t0:.2f}s  pairs {n}", flush=True)
    # end-to-end d21 — identical pair set, tiled generation
    t0 = time.monotonic()
    out21 = D.d21_minhash_tiled_neardup(spark, SF_DIR, tile=TILE)
    n21, chk21 = profile("d21 verified pairs", out21, "doc_a", "doc_b")
    print(f"d21 end-to-end wall {time.monotonic() - t0:.2f}s  pairs {n21}", flush=True)
    assert (n, chk) == (n21, chk21), f"pair sets diverge: {(n, chk)} vs {(n21, chk21)}"
    print("d04/d21 pair-count + checksum parity: OK", flush=True)
    sh.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
