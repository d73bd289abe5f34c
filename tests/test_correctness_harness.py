"""Mirror of the driver's correctness gate at sf0.001: every registered
query with an oracle must match DuckDB order-insensitively; rows-only
queries must at least execute and return a stable schema."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL
from tests.oracle_check import compare_query, duck_connection


def _queries():
    from sketchmlflink_spark.registry import all_queries

    return all_queries()


QUERIES = _queries()
WITH_ORACLE = sorted(n for n, q in QUERIES.items() if q.oracle is not None)
ROWS_ONLY = sorted(n for n, q in QUERIES.items() if q.oracle is None)


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_SMALL)
    yield con
    con.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match(spark, duck, name):
    q = QUERIES[name]
    df = q.build(spark, SF_SMALL)
    problems = compare_query(df, duck, q.oracle)
    assert not problems, f"{name}: " + "; ".join(problems[:10])


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    q = QUERIES[name]
    df = q.build(spark, SF_SMALL)
    n = df.count()
    assert n >= 0
    assert len(df.schema.fields) > 0
