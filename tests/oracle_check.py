"""Local mirror of the driver's correctness gate: run a registered Spark
query and its DuckDB oracle on the same parquet dir, compare
order-insensitively (columns sorted by name, rows sorted, floats to
1e-9 rel tolerance).

NOTE on strictness: the default ``compare_query`` is NOT strictly
stronger than the driver's value hash — ``math.isclose`` treats
-0.0 == 0.0 and tolerates type-rendering differences (date vs
timestamp) that a canonical string/bit hash does not (round-5 verdict:
t12's two-round driver red was a signed zero invisible to every
isclose-based gate). ``compare_query_strict`` below closes that gap:
it canonicalizes each row to the repr-level string a value hash sees
(floats via repr, zero tolerance, isoformat datetimes) and diffs
byte-for-byte."""

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


def _repr_cell(v) -> str:
    """Canonical string form at the fidelity a value hash sees.

    Floats go through ``repr`` (shortest round-trip form), so
    -0.0 != 0.0 and any ulp-level cross-engine drift shows; datetimes
    via isoformat (a DATE and a midnight TIMESTAMP render differently,
    as they would in any canonical serialization); Decimal normalized
    (DuckDB may return Decimal for DECIMAL-typed columns where Spark
    returns one too — compare by exact value, not trailing zeros)."""
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return repr(v)
    if isinstance(v, float):
        return repr(v)
    import decimal

    if isinstance(v, decimal.Decimal):
        return repr(v.normalize())
    if isinstance(v, int):
        return repr(int(v))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_repr_cell(x) for x in v) + "]"
    return str(v)


def compare_query_strict(spark_df, con, sql: str) -> list[str]:
    """Repr-strict cross-engine diff: exactly what the driver's
    canonical value hash sees — columns sorted by name, rows sorted by
    their canonical string form, every cell compared as its canonical
    string with ZERO tolerance. Catches signed zeros, 1-ulp float
    drift, and type-rendering mismatches that ``compare_query``'s
    isclose tolerates (round-5 verdict items 1/2/4)."""
    problems: list[str] = []
    spark_rows = spark_df.collect()
    spark_cols = sorted(spark_df.columns)
    duck = con.execute(sql)
    duck_cols_raw = [d[0] for d in duck.description]
    duck_rows = duck.fetchall()
    duck_cols = sorted(duck_cols_raw)
    if spark_cols != duck_cols:
        return [f"column mismatch: spark={spark_cols} duck={duck_cols}"]
    if len(spark_rows) != len(duck_rows):
        return [f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"]
    duck_idx = [duck_cols_raw.index(c) for c in duck_cols]
    s = sorted(tuple(_repr_cell(r[c]) for c in spark_cols) for r in spark_rows)
    d = sorted(tuple(_repr_cell(r[i]) for i in duck_idx) for r in duck_rows)
    for i, (sr, dr) in enumerate(zip(s, d)):
        if sr != dr:
            for c, sv, dv in zip(spark_cols, sr, dr):
                if sv != dv:
                    problems.append(f"row {i} col {c}: spark={sv!r} duck={dv!r}")
        if len(problems) > 8:
            problems.append("...")
            break
    return problems


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
