#!/usr/bin/env python
"""Third-decade scaling probe for the ML arm (VERDICT r6 item 3) —
the reference's own core. For each fixture dir: wall time AND measured
sketch-shuffle payload bytes for

  m03  dense exact arm   (5 epochs, embeddings)
  m04  dense sketch arm  (5 epochs, embeddings, forced codec)
  m09  sparse sketch arm (3 epochs, documents hashing-trick, dim 2^20)
  m09x sparse arm with compression None at dim 2^20 — the A/B control
  wide / widex  sparse arms over a SYNTHETIC wide COO set (~200 hashed
       indices per row, dim 2^20): the fixture documents have a ~31
       token vocabulary, so m09's per-partition nnz (~31) always rides
       the exact fallback — the codec's actual regime (nnz >> 512, the
       reference's wide-LibSVM workload) needs this arm to be measured
       distributed, not just in unit tests.

Every arm repartitions its input to the core count first so the
gradient reduce tree has a cluster-shaped fan-in (the single-file
parquet otherwise blockifies into 1-2 partitions and there IS no tree).
`shuffle_bytes` is the engine's own accounting (ml/sgd.py: every leaf
payload + every re-sketched combine hop — an upper bound on
cross-executor gradient traffic). Compression ratio = exact/sketch at
the same scale.

Usage: python bin/ml_probe.py [sf_dir ...]
       default: /root/testdata/sf0.1 testdata_sf1 testdata_sf3 testdata_sf10
Prints one JSON line per (probe, sf_dir) and a final summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> None:
    dirs = [os.path.abspath(d) for d in sys.argv[1:]] or [
        "/root/testdata/sf0.1",
        os.path.join(REPO_ROOT, "testdata_sf1"),
        os.path.join(REPO_ROOT, "testdata_sf3"),
        os.path.join(REPO_ROOT, "testdata_sf10"),
    ]
    from sketchmlflink_spark.config import SketchConfig
    from sketchmlflink_spark.ml.regression import MultipleLinearRegression
    from sketchmlflink_spark.ml_queries import (
        HASH_DIM_WIDE,
        _sparse_training_df,
        _training_df,
    )
    from sketchmlflink_spark.session import ensure_workers_can_import, get_spark

    spark = get_spark("sketchmlflink-mlprobe")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_workers_can_import(spark)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from sketchmlflink_spark.operators.relational import t as load_t

    WIDE_K = 200  # hashed indices per row

    def _wide_synth_df(sf_dir, dim):
        """Deterministic wide COO over the embeddings ids: ~WIDE_K
        unique hashed indices per row, values in [-1, 1), label linear
        in vec_id — no RNG, reproducible anywhere."""
        emb = load_t(spark, sf_dir, "embeddings").select("vec_id")
        seq = F.sequence(F.lit(1), F.lit(WIDE_K))
        idx = F.transform(
            seq, lambda i: F.pmod(F.hash(F.col("vec_id") * 1000 + i), F.lit(dim)).cast("int")
        )
        vals = F.transform(
            seq, lambda i: F.pmod(F.hash(F.col("vec_id") + i * 7), F.lit(1000)) / 500.0 - 1.0
        )
        label = (F.pmod(F.col("vec_id") * 131, F.lit(1000)) / 100.0).alias("label")
        return emb.select("vec_id", idx.alias("indices"), vals.alias("values"), label)

    def probes(sf_dir):
        yield "m03_exact_dense", (
            lambda: (_training_df(spark, sf_dir),
                     MultipleLinearRegression(iterations=5, step_size=0.5,
                                              compression="None"), None))
        yield "m04_sketch_dense", (
            lambda: (_training_df(spark, sf_dir),
                     MultipleLinearRegression(iterations=5, step_size=0.5,
                                              compression="Sketch",
                                              sketch_cfg=SketchConfig(auto_fallback_nnz=0)),
                     None))
        yield "m09_sketch_sparse_1m", (
            lambda: (_sparse_training_df(spark, sf_dir, hash_dim=HASH_DIM_WIDE),
                     MultipleLinearRegression(iterations=3, step_size=0.01,
                                              compression="Sketch"),
                     HASH_DIM_WIDE))
        yield "m09x_exact_sparse_1m", (
            lambda: (_sparse_training_df(spark, sf_dir, hash_dim=HASH_DIM_WIDE),
                     MultipleLinearRegression(iterations=3, step_size=0.01,
                                              compression="None"),
                     HASH_DIM_WIDE))
        yield "wide_sketch_1m", (
            lambda: (_wide_synth_df(sf_dir, HASH_DIM_WIDE),
                     MultipleLinearRegression(iterations=3, step_size=0.001,
                                              compression="Sketch"),
                     HASH_DIM_WIDE))
        yield "widex_exact_1m", (
            lambda: (_wide_synth_df(sf_dir, HASH_DIM_WIDE),
                     MultipleLinearRegression(iterations=3, step_size=0.001,
                                              compression="None"),
                     HASH_DIM_WIDE))

    results = {}
    for sf_dir in dirs:
        for name, make in probes(sf_dir):
            df, mlr, dim = make()
            df = df.repartition(cpus)  # cluster-shaped reduce fan-in
            n = df.count()  # materialize input, excluded from fit wall
            t0 = time.monotonic()
            mlr.fit(df, dim=dim)
            wall = round(time.monotonic() - t0, 3)
            rec = {
                "probe": name,
                "sf_dir": sf_dir,
                "rows": n,
                "wall_s": wall,
                "shuffle_bytes": int(mlr.result_.shuffle_bytes),
                "epochs": mlr.solver.iterations,
            }
            results[(name, sf_dir)] = rec
            print(json.dumps(rec), flush=True)

    # compression ratios at each scale
    summary = {}
    for sf_dir in dirs:
        tag = os.path.basename(sf_dir.rstrip("/"))
        try:
            summary[f"dense_ratio_{tag}"] = round(
                results[("m03_exact_dense", sf_dir)]["shuffle_bytes"]
                / max(results[("m04_sketch_dense", sf_dir)]["shuffle_bytes"], 1), 2)
            summary[f"sparse_ratio_{tag}"] = round(
                results[("m09x_exact_sparse_1m", sf_dir)]["shuffle_bytes"]
                / max(results[("m09_sketch_sparse_1m", sf_dir)]["shuffle_bytes"], 1), 2)
            summary[f"wide_ratio_{tag}"] = round(
                results[("widex_exact_1m", sf_dir)]["shuffle_bytes"]
                / max(results[("wide_sketch_1m", sf_dir)]["shuffle_bytes"], 1), 2)
        except KeyError:
            pass
    print(json.dumps({"metric": "ml_probe_summary", **summary}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
