#!/usr/bin/env python
"""Single-node sustained-throughput micro-bench for the catalog's two
stateful-streaming state classes (VERDICT r8 item 8).

The catalog's streaming entries are all bounded file replays
(Trigger.AvailableNow over fingerprinted copies of the events table), so
BENCH artifacts measure replay wall time, never sustained rows/sec — the
one number a user sizing a production stream actually needs. This probe
puts an honest, clearly-single-node number on that gap using Spark's
`rate` source as an unbounded generator that deliberately outruns the
pipeline (rowsPerSecond far above capacity), so processedRowsPerSecond
from StreamingQueryProgress measures the pipeline's true capacity, not
the generator's.

Two pipelines, each the state class of a shipped catalog entry:

* st04-class — session_window(gap 30 min) per user, user_id = value % K.
  With a 30-minute gap and a ~1-minute run no session ever closes, so
  RocksDB state holds exactly K open sessions at steady state: sweeping
  K sweeps state size at constant per-row work. Append mode + watermark
  (the production sessionize shape — update mode is unsupported for
  session windows), noop sink; nothing is emitted because no session
  closes, so the number is pure ingest+state-merge capacity.
* st21-class — watermarked exact dedup on a unique event_id (value),
  horizon H: state holds ~capacity×H distinct digests; sweeping H sweeps
  state size. Append mode, noop sink.

Output: one JSON line per config with median steady-state
processedRowsPerSecond (batches after the first, i.e. post-codegen
warmup), final state rows/bytes from stateOperators, and batch count.
RocksDB state store (the repo default) unless SPARK_GRAFT_STATE_STORE
overrides. THIS IS local[32] ON ONE BOX — the artifact labels it so; the
cluster story is partition-parallel state (shuffle_partitions state
stores per op), which local mode exercises with 32.

Usage: python bin/stream_throughput_probe.py [--secs 45] [--rate 2000000]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from pyspark.sql import DataFrame, SparkSession, functions as F


def rate_source(spark: SparkSession, rows_per_sec: int) -> DataFrame:
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_sec))
        .option("numPartitions", str(int(os.environ.get("SPARK_GRAFT_CPUS", "32"))))
        .load()
    )


def sessionize_pipe(src: DataFrame, n_keys: int) -> tuple[DataFrame, str]:
    out = (
        src.select(
            (F.col("value") % n_keys).alias("user_id"),
            F.col("timestamp").alias("ts"),
        )
        .withWatermark("ts", "10 seconds")
        .groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_in_session"))
    )
    return out, "append"


def dedup_pipe(src: DataFrame, horizon_s: int) -> tuple[DataFrame, str]:
    out = (
        src.select(F.col("value").alias("event_id"), F.col("timestamp").alias("ts"))
        .withWatermark("ts", f"{horizon_s} seconds")
        .dropDuplicates(["event_id", "ts"])
    )
    return out, "append"


def quarantine_pipe(
    src: DataFrame, n_keys: int, hot_pct: int, hot_keys: list[int] | None
) -> tuple[DataFrame, str]:
    """st22-class: a watermarked stream-stream interval join (clicks ×
    views on key, 2 s lookback) under a ~hot_pct% hot key (value%100 <
    hot_pct → key 0). ``hot_keys`` is the census-quarantine filter —
    None plays the pre-flip epoch (the hot key floods join state and
    output grows quadratically in its per-interval row count), a list
    plays the post-flip epoch (hot traffic excluded from the stream,
    exactly st22's cold path; production handles the quarantined key in
    the bounded batch pass, which this rate probe does not model)."""
    ev = src.select(
        F.when(F.col("value") % 100 < hot_pct, F.lit(0))
        .otherwise(F.col("value") % n_keys)
        .alias("k"),
        (F.col("value") % 2 == 0).alias("is_click"),
        F.col("timestamp").alias("ts"),
    )
    if hot_keys:
        ev = ev.where(~F.col("k").isin(hot_keys))
    clicks = ev.where(F.col("is_click")).select(
        F.col("k").alias("ck"), F.col("ts").alias("cts")
    ).withWatermark("cts", "10 seconds")
    views = ev.where(~F.col("is_click")).select(
        F.col("k").alias("vk"), F.col("ts").alias("vts")
    ).withWatermark("vts", "10 seconds")
    j = clicks.join(
        views,
        (F.col("ck") == F.col("vk"))
        & (F.col("vts") <= F.col("cts"))
        & (F.col("vts") > F.col("cts") - F.expr("INTERVAL 2 SECONDS")),
    )
    return j, "append"


def _drain_progress(q) -> list[dict]:
    return [
        json.loads(p if isinstance(p, str) else p.json)
        for p in (q.recentProgress or [])
    ]


def _steady_stats(progresses: list[dict]) -> dict:
    steady = [p for p in progresses[1:] if p.get("numInputRows", 0) > 0]
    rps = [p["processedRowsPerSecond"] for p in steady if "processedRowsPerSecond" in p]
    rows = sum(p.get("numInputRows", 0) for p in steady)
    busy_ms = sum(p.get("batchDuration", 0) for p in steady)
    state = (steady[-1].get("stateOperators") or [{}])[0] if steady else {}
    return {
        "agg_rows_per_sec": round(rows / (busy_ms / 1000.0)) if busy_ms else None,
        "median_rows_per_sec": round(statistics.median(rps)) if rps else None,
        "batches_measured": len(rps),
        "state_rows_total": state.get("numRowsTotal"),
    }


def run_quarantine_flip(spark: SparkSession, rate: int, secs: int,
                        n_keys: int, hot_pct: int) -> dict:
    """Two epochs around a census flip, the st22/st23 production shape
    (quarantine applies at epoch boundaries, never mid-batch): epoch 1
    runs the join with key 0 hot and UN-quarantined (an empty cold-start
    census — st08's blow-up mode); the probe then 'takes the census',
    stops the query, and restarts FROM THE SAME CHECKPOINT with the
    quarantine filter (a stream-side filter change, a restart-allowed
    plan modification). Reports each epoch's sustained rows/s and the
    FLIP LATENCY — stop-initiate → first post-restart batch committed,
    i.e. how long a census flip takes to actually apply."""
    import shutil
    import tempfile

    ckpt = tempfile.mkdtemp(prefix="quarantine_flip_ckpt_")

    def start(hot_keys):
        df, mode = quarantine_pipe(rate_source(spark, rate), n_keys, hot_pct, hot_keys)
        return (
            df.writeStream.format("noop")
            .outputMode(mode)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="2 seconds")
            .start()
        )

    q = start(None)
    try:
        time.sleep(secs)
        p1 = _drain_progress(q)
    finally:
        t_flip = time.monotonic()
        q.stop()
    q2 = start([0])
    try:
        # first committed batch after the flip = the census is live
        flip_latency = None
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            if q2.lastProgress and q2.lastProgress.get("numInputRows", 0) > 0:
                flip_latency = time.monotonic() - t_flip
                break
            time.sleep(0.25)
        time.sleep(secs)
        p2 = _drain_progress(q2)
    finally:
        q2.stop()
    shutil.rmtree(ckpt, ignore_errors=True)
    s1, s2 = _steady_stats(p1), _steady_stats(p2)
    s1["batches_committed"] = len(p1)
    s2["batches_committed"] = len(p2)
    if not p1 or s1["batches_measured"] == 0:
        # the finding, stated instead of nulls: the un-quarantined
        # hot-key join cannot even COMMIT a steady batch in the window —
        # output grows quadratically in the hot key's per-interval rows
        s1["note"] = (
            f"{len(p1)} batch(es) committed in {secs} s at the offered "
            "rate — the un-quarantined hot-key join cannot keep up; "
            "this is st08's blow-up mode, the reason the census exists"
        )
    return {
        "config": f"st22-class census flip (K={n_keys:,}, hot key ~{hot_pct}% of rows)",
        "epoch1_unquarantined": s1,
        "epoch2_quarantined": s2,
        "flip_latency_sec": round(flip_latency, 2) if flip_latency else None,
    }


def run_config(spark: SparkSession, label: str, result: DataFrame,
               mode: str, secs: int) -> dict:
    q = (
        result.writeStream.format("noop")
        .outputMode(mode)
        .trigger(processingTime="2 seconds")
        .start()
    )
    try:
        time.sleep(secs)
        # recentProgress yields StreamingQueryProgress objects in PySpark 4
        # (JSON strings in 3.x) — normalize via the .json property.
        progresses = [
            json.loads(p if isinstance(p, str) else p.json)
            for p in (q.recentProgress or [])
        ]
    finally:
        q.stop()
    # Skip the first batch (codegen + RocksDB column-family warmup);
    # report BOTH the per-batch median and the aggregate
    # rows/total-busy-seconds — the aggregate is the robust number when
    # catch-up batching leaves only a couple of huge batches.
    steady = [p for p in progresses[1:] if p.get("numInputRows", 0) > 0]
    rps = [p["processedRowsPerSecond"] for p in steady if "processedRowsPerSecond" in p]
    rows = sum(p.get("numInputRows", 0) for p in steady)
    busy_ms = sum(p.get("batchDuration", 0) for p in steady)
    state = (steady[-1].get("stateOperators") or [{}])[0] if steady else {}
    return {
        "config": label,
        "agg_rows_per_sec": round(rows / (busy_ms / 1000.0)) if busy_ms else None,
        "median_rows_per_sec": round(statistics.median(rps)) if rps else None,
        "batches_measured": len(rps),
        "state_rows_total": state.get("numRowsTotal"),
        "state_memory_bytes": state.get("memoryUsedBytes"),
        "rows_processed": rows,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--secs", type=int, default=45)
    ap.add_argument("--rate", type=int, default=2_000_000)
    ap.add_argument("--qrate", type=int, default=200_000,
                    help="offered rows/s for the quarantine-flip config")
    ap.add_argument("--quarantine-only", action="store_true",
                    help="skip the st04/st21 configs (re-run just the flip)")
    args = ap.parse_args()

    from sketchmlflink_spark.session import get_spark, tune_for_session

    spark = tune_for_session(get_spark("stream-throughput-probe"))
    spark.sparkContext.setLogLevel("ERROR")
    provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", "HDFSBacked(default)"
    )
    print(json.dumps({"note": "single-node local[%s] rate-source saturation probe"
                              % os.environ.get("SPARK_GRAFT_CPUS", "32"),
                      "state_store": provider.rsplit(".", 1)[-1],
                      "offered_rows_per_sec": args.rate,
                      "secs_per_config": args.secs}), flush=True)

    configs = []
    if not args.quarantine_only:
        for k in (10_000, 100_000, 1_000_000):
            configs.append((f"st04-class sessionize K={k:,} open sessions",
                            lambda s, k=k: sessionize_pipe(rate_source(s, args.rate), k)))
        for h in (5, 30):
            configs.append((f"st21-class watermarked dedup horizon={h}s",
                            lambda s, h=h: dedup_pipe(rate_source(s, args.rate), h)))

    for label, build in configs:
        df, mode = build(spark)
        res = run_config(spark, label, df, mode, args.secs)
        print(json.dumps(res), flush=True)

    # st22-class census-flip epochs (VERDICT r9 item 7). Offered rate is
    # deliberately lower: with a ~30% hot key and a 2 s join interval the
    # UN-quarantined epoch's output grows quadratically in the hot key's
    # per-interval rows — the blow-up the flip exists to stop.
    print(json.dumps(run_quarantine_flip(
        spark, rate=args.qrate, secs=args.secs, n_keys=100_000, hot_pct=30
    )), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
