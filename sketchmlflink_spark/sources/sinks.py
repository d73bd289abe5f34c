"""Write-side surface: partitioned and bucketed parquet sinks.

The reference's only sink is a driver-side CSV log line
(Test.scala:66-77 → our `experiment.py`). A 100 TB pipeline needs real
table sinks, and the two layout decisions that dominate read cost at
that scale are made at WRITE time:

* **Partition columns** (`partitionBy`) → directory-level pruning: a
  reader filtering on the partition column opens only matching
  directories (`PartitionFilters` in the scan, zero I/O for the rest).
  Choose low-cardinality columns (date, event_type); high-cardinality
  partitioning creates millions of tiny files.
* **Bucketing** (`bucketBy` + `sortBy`) → co-located, pre-sorted data:
  two tables bucketed on the same key into the same bucket count join
  with NO shuffle and NO sort — the per-bucket files are the shuffle
  output, paid once at write time and amortized over every subsequent
  join/aggregation on that key. This is how the fact-to-fact
  orders⋈lineitem join survives 100 TB: neither side broadcasts, and
  re-shuffling both per query would dominate the runtime.

`coalesce_small_output` handles the inverse problem: a heavily filtered
result written with the parent's partitioning produces thousands of
KB-sized files whose open/close overhead dominates downstream reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet. ``sort_cols`` sorts within each
    output file (better RLE/dictionary compression + min/max row-group
    pruning for range predicates on the sort key)."""
    out = df
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    path: str,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (+ optionally sorted) table registered in the session
    catalog with an explicit external ``path``. Bucket count is a write
    -time contract: pick it once per key domain (e.g. 4096 at 100 TB so
    a bucket is a few GB) and reuse it on every table sharing the key,
    or the bucketing can't be exploited."""
    # One file per bucket: repartition on the bucket key with the bucket
    # count (same murmur3 hash as the bucketing spec, so partition i
    # holds exactly bucket i). Without this, multi-file buckets make the
    # planner distrust the write-time sortBy and re-sort on every read.
    out = df.repartition(n_buckets, *bucket_cols)
    w = out.write.mode(mode).option("path", path).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def coalesce_small_output(df: DataFrame, target_files: int) -> DataFrame:
    """Cap output file count for small/filtered results. ``coalesce``
    (not ``repartition``): it merges upstream partitions without a
    shuffle."""
    return df.coalesce(target_files)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — the path through which bucketing metadata flows
    to the planner (a plain ``read.parquet`` of the same files would
    NOT know the layout and would re-shuffle)."""
    return spark.table(table)
