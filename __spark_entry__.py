"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over sketchmlflink_spark.registry — every implemented
operator/query from SURVEY.md §2 (plus the M5/M6 pipeline surface) is
registered there with its DuckDB oracle where SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

SF0001_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the TPC-H-Q1-style
    pricing summary (scan → pushed filter → hash aggregate)."""
    from sketchmlflink_spark.registry import all_queries

    return all_queries()["q01_pricing_summary"].build(spark, SF0001_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from sketchmlflink_spark.registry import query_fns

    return query_fns()


def oracle_sql() -> dict[str, str]:
    from sketchmlflink_spark.registry import oracle_sqls

    return oracle_sqls()
