"""SparkSession factory with scale-aware defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32 threads);
the same settings are what we'd ship to a 1000-executor cluster: AQE for
runtime re-planning (skew joins, partition coalescing), Arrow for every
Python<->JVM crossing, and shuffle partitions sized to the environment
instead of Spark's legacy 200.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "sketchmlflink-spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    return builder.getOrCreate()


def tune_for_session(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to a session we didn't build (the driver
    harness hands us its own SparkSession in ``entry``)."""
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # UTC so date_trunc/date_format on instant-typed columns agree with
    # the (naive-timestamp) DuckDB oracle regardless of host timezone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # right-size shuffle/state partitioning to the machine instead of
    # the legacy 200 (matters most for streaming: 200 partitions = 200
    # state stores per stateful op); a runtime conf, safe to set here
    try:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        if int(spark.conf.get("spark.sql.shuffle.partitions")) > 4 * cpus:
            spark.conf.set("spark.sql.shuffle.partitions", str(cpus))
    except Exception:
        pass
    try:
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    except Exception:
        pass
    # Streaming state must not live on the JVM heap. The default
    # HDFSBackedStateStoreProvider keeps every key's state in an on-heap
    # map, so state size is capped by executor heap: the round-7 sf10
    # probe OOM'd an 8 GiB heap on st04's session windows (9.5M sessions
    # in one micro-batch) even in an isolated session. RocksDB keeps
    # state off-heap/on-disk with a bounded block cache — the same
    # switch a 100-TB/day cluster job makes — and the identical probe
    # completes in ~38 s with identical results (state backend is
    # semantics-neutral; the full oracle sweep re-verified after the
    # switch). Override via SPARK_GRAFT_STATE_STORE=hdfs for A/B runs.
    try:
        if os.environ.get("SPARK_GRAFT_STATE_STORE", "rocksdb") == "rocksdb":
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass",
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider",
            )
            # Commit-path tunings (optimization guide §1.2: per-task
            # work), both standard for production RocksDB state:
            # changelog checkpointing appends a small changelog per
            # commit instead of uploading a full snapshot (snapshots
            # move to background maintenance) — the r11 phase probe
            # measured commit time as the dominant micro-batch cost;
            # trackTotalNumberOfRows=false drops the extra read-before-
            # write RocksDB does per put/delete just to maintain the
            # numRowsTotal metric (semantics-neutral, metric-only).
            spark.conf.set(
                "spark.sql.streaming.stateStore.rocksdb."
                "changelogCheckpointing.enabled", "true",
            )
            spark.conf.set(
                "spark.sql.streaming.stateStore.rocksdb."
                "trackTotalNumberOfRows", "false",
            )
    except Exception:
        pass
    return spark


def ensure_workers_can_import(spark: SparkSession) -> None:
    """Ship the package to Python workers via addPyFile so functions
    serialized by reference (mapInPandas bodies, the sketch codec)
    resolve on executors — required on a real cluster, and also in
    local mode when PYTHONPATH doesn't cover the repo."""
    sc = spark.sparkContext
    if getattr(sc, "_sketchml_pkg_added", False):
        return
    import hashlib
    import pathlib
    import tempfile
    import zipfile

    pkg_dir = pathlib.Path(__file__).resolve().parent
    # Content-hash file name + write-then-atomic-rename: concurrent
    # driver processes on one box (a sweep beside hash_catalog
    # subprocesses) share one zip per package version instead of leaking
    # a per-PID file each (ADVICE r10 item 4), and a process racing a
    # rewrite against addPyFile still never ships a truncated zip —
    # os.replace is atomic and same-content writes are byte-identical.
    sources = sorted(pkg_dir.rglob("*.py"))
    h = hashlib.sha256()
    for p in sources:
        h.update(str(p.relative_to(pkg_dir.parent)).encode())
        h.update(p.read_bytes())
    zpath = os.path.join(
        tempfile.gettempdir(), f"sketchmlflink_spark_pkg_{h.hexdigest()[:16]}.zip"
    )
    if not os.path.exists(zpath):
        tmp_path = f"{zpath}.{os.getpid()}.tmp"
        with zipfile.ZipFile(tmp_path, "w") as z:
            for p in sources:
                z.write(p, p.relative_to(pkg_dir.parent))
        os.replace(tmp_path, zpath)
    sc.addPyFile(zpath)
    sc._sketchml_pkg_added = True
