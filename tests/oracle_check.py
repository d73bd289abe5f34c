"""Local mirror of the driver's correctness gate: run a registered Spark
query and its DuckDB oracle on the same parquet dir, compare
order-insensitively (columns sorted by name, rows sorted, floats to
1e-9 rel tolerance — stricter than a value hash)."""

from __future__ import annotations

import math
import os

import duckdb

TABLES = (
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


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{os.path.join(sf_dir, t + '.parquet')}')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        return v
    if isinstance(v, int):
        return int(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _sort_key(row):
    return tuple((x is None, str(x)) for x in row)


def compare_query(spark_df, con, sql: str, rel_tol: float = 1e-9) -> list[str]:
    """Returns a list of human-readable diffs; empty == match.

    ``rel_tol`` loosens the numeric comparison for approximate-estimator
    queries whose EngineQuery carries a documented tolerance band (e.g.
    sk01's HLL estimate past its sparse-exact regime): floats AND
    integer estimates compare within the band instead of exactly. The
    default keeps the strict behavior (ints exact, floats 1e-9)."""
    problems: list[str] = []
    spark_rows = spark_df.collect()
    spark_cols = sorted(spark_df.columns)
    duck = con.execute(sql)
    duck_cols_raw = [d[0] for d in duck.description]
    duck_rows = duck.fetchall()
    duck_cols = sorted(duck_cols_raw)
    if spark_cols != duck_cols:
        problems.append(f"column mismatch: spark={spark_cols} duck={duck_cols}")
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}")
        return problems
    s = sorted(
        (tuple(_norm_cell(r[c]) for c in spark_cols) for r in spark_rows), key=_sort_key
    )
    duck_idx = [duck_cols_raw.index(c) for c in duck_cols]
    d = sorted(
        (tuple(_norm_cell(r[i]) for i in duck_idx) for r in duck_rows), key=_sort_key
    )
    for i, (sr, dr) in enumerate(zip(s, d)):
        for c, (sv, dv) in zip(spark_cols, zip(sr, dr)):
            if isinstance(sv, float) and isinstance(dv, float):
                if not (
                    (math.isnan(sv) and math.isnan(dv))
                    or math.isclose(sv, dv, rel_tol=rel_tol, abs_tol=1e-9)
                ):
                    problems.append(f"row {i} col {c}: spark={sv!r} duck={dv!r}")
            elif (
                rel_tol > 1e-9
                and isinstance(sv, (int, float))
                and isinstance(dv, (int, float))
                and not isinstance(sv, bool)
                and not isinstance(dv, bool)
            ):
                if not math.isclose(sv, dv, rel_tol=rel_tol):
                    problems.append(f"row {i} col {c}: spark={sv!r} duck={dv!r}")
            elif sv != dv:
                problems.append(f"row {i} col {c}: spark={sv!r} duck={dv!r}")
        if len(problems) > 8:
            problems.append("...")
            break
    return problems
