"""Parquet table loaders for the driver's TPC-H-ish star schema
(TESTDATA.md / FIXTURES.md §4).

Plain ``spark.read.parquet`` — Catalyst handles column pruning and
predicate pushdown into the scan, which is exactly what we want at
100 TB: no eager caching, no driver-side materialization here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized
        # reader rejects; read nanos as long and floor to microseconds
        # with exact integer division (a double division would lose
        # precision above 2^53 ns).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_temp_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES) -> None:
    """Expose tables as temp views so queries can also be written in
    ``spark.sql`` form (same names DuckDB pre-registers for the oracle)."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
