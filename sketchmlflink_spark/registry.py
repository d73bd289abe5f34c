"""Query registry: the driver-facing catalog of every implemented
operator/query (SURVEY.md §2 inventory + §7.1 M0/M5/M6 surface).

Each entry pairs a Spark DataFrame builder with (where SQL-expressible)
an equivalent DuckDB oracle SQL string. ``__spark_entry__.py`` is a thin
shim over this module. Column names are aliased identically on both
sides — the driver's comparator sorts columns by name before hashing.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class EngineQuery:
    name: str
    build: QueryFn
    oracle: Optional[str]  # DuckDB SQL, or None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, EngineQuery] = {}


def register(name: str, oracle: Optional[str] = None, doc: str = "", tags: tuple[str, ...] = ()):
    """Decorator: add a (spark, sf_dir) -> DataFrame builder to the catalog."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = EngineQuery(name=name, build=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn

    return wrap


def all_queries() -> dict[str, EngineQuery]:
    _load_operator_modules()
    return dict(_REGISTRY)


def query_fns() -> dict[str, QueryFn]:
    return {name: q.build for name, q in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}


_LOADED = False


def _load_operator_modules() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from sketchmlflink_spark.operators import (  # noqa: F401
        dedup,
        multimodal,
        pipeline,
        relational,
        similarity,
        sketch_aggs,
        textops,
    )
    from sketchmlflink_spark import ml_queries  # noqa: F401
    from sketchmlflink_spark.streaming import queries as streaming_queries  # noqa: F401

    _LOADED = True
