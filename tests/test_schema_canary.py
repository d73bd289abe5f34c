"""Testdata schema-drift canary (VERDICT r2 item 5).

Round 2 lost q22/q25, the whole streaming surface, and the benchmark to
a silent regeneration of the driver's testdata that changed events.ts
from TIMESTAMP(NANOS)-as-long to timestamp[us]/NTZ. This test reads the
PHYSICAL parquet footer of every table (pyarrow, no Spark — runs in
milliseconds) and asserts the engine's loaders handle each column's
actual type, so the next drift fails loudly in ONE obvious place
instead of six scattered oracle mismatches.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMALL

# Every physical arrow type the engine's loaders + queries are known to
# handle, per column. A drift to a type outside the allowed set means a
# loader (sources/tables.py, streaming/pipelines.py) needs a new branch
# BEFORE any oracle can be trusted.
TS_OK = (
    pa.timestamp("us"),          # → Spark TIMESTAMP_NTZ, normalized by cast
    pa.timestamp("us", tz="UTC"),  # → Spark TIMESTAMP, passes through
    pa.timestamp("ns"),          # → long via nanosAsLong, normalized by div
    pa.timestamp("ns", tz="UTC"),
    pa.int64(),                  # raw epoch nanos
)

EXPECTED = {
    "events": {
        "event_id": (pa.int64(),),
        "ts": TS_OK,
        "user_id": (pa.int64(),),
        "event_type": (pa.string(), pa.large_string()),
        "value": (pa.float64(),),
        "props": (pa.string(), pa.large_string()),
    },
    "documents": {
        "doc_id": (pa.int64(),),
        "text": (pa.string(), pa.large_string()),
        "lang": (pa.string(), pa.large_string()),
        "source": (pa.string(), pa.large_string()),
        "n_chars": (pa.int64(),),
    },
    "embeddings": {
        "vec_id": (pa.int64(),),
        "embedding": (pa.list_(pa.float32()), pa.list_(pa.float64())),
        "label": (pa.int32(), pa.int64()),
    },
    # NOTE: l_shipdate/o_orderdate get NO ts normalization (only
    # events.ts goes through normalize_event_ts), so their allowed set
    # is strictly what a raw spark.read handles: µs timestamps or dates.
    # A drift to ns/int64 here MUST fail this test until the loaders
    # grow a branch.
    "lineitem": {
        "l_orderkey": (pa.int64(),),
        "l_quantity": (pa.float64(),),
        "l_extendedprice": (pa.float64(),),
        "l_discount": (pa.float64(),),
        "l_shipdate": (
            pa.timestamp("us"),
            pa.timestamp("us", tz="UTC"),
            pa.date32(),
        ),
        "l_returnflag": (pa.string(), pa.large_string()),
    },
    "orders": {
        "o_orderkey": (pa.int64(),),
        "o_custkey": (pa.int64(),),
        "o_totalprice": (pa.float64(),),
        "o_orderdate": (
            pa.timestamp("us"),
            pa.timestamp("us", tz="UTC"),
            pa.date32(),
        ),
        "o_orderpriority": (pa.string(), pa.large_string()),
    },
    # dimension tables: join keys must keep integer types (int32/int64
    # both join fine against each other in Spark AND DuckDB)
    "customer": {
        "c_custkey": (pa.int64(), pa.int32()),
        "c_nationkey": (pa.int32(), pa.int64()),
        "c_acctbal": (pa.float64(),),
        "c_mktsegment": (pa.string(), pa.large_string()),
    },
    "supplier": {
        "s_suppkey": (pa.int64(), pa.int32()),
        "s_nationkey": (pa.int32(), pa.int64()),
        "s_acctbal": (pa.float64(),),
    },
    "part": {
        "p_partkey": (pa.int64(), pa.int32()),
        "p_size": (pa.int32(), pa.int64()),
        "p_retailprice": (pa.float64(),),
        "p_brand": (pa.string(), pa.large_string()),
        "p_type": (pa.string(), pa.large_string()),
    },
    "nation": {
        "n_nationkey": (pa.int32(), pa.int64()),
        "n_regionkey": (pa.int32(), pa.int64()),
        "n_name": (pa.string(), pa.large_string()),
    },
    "region": {
        "r_regionkey": (pa.int32(), pa.int64()),
        "r_name": (pa.string(), pa.large_string()),
    },
}


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_physical_schema_is_handled(table):
    path = os.path.join(SF_SMALL, f"{table}.parquet")
    schema = pq.read_schema(path)
    for col, allowed in EXPECTED[table].items():
        assert col in schema.names, f"{table}.{col} vanished from testdata"
        actual = schema.field(col).type
        assert actual in allowed, (
            f"{table}.{col} drifted to physical type {actual!r} — not in the "
            f"loader-handled set {allowed}; add a branch to "
            f"sources/tables.py (and streaming/pipelines.py if streamed) "
            f"before trusting any oracle result"
        )


def test_all_tables_present():
    from sketchmlflink_spark.sources.tables import TABLE_NAMES

    for t in TABLE_NAMES:
        assert os.path.exists(os.path.join(SF_SMALL, f"{t}.parquet")), t


def test_batch_and_stream_agree_on_ts(spark):
    """The batch loader and the streaming source must produce the SAME
    logical type and the SAME values for events.ts — the invariant whose
    violation silently corrupted all of round 2's streaming surface."""
    from pyspark.sql import functions as F

    from sketchmlflink_spark.sources.tables import load_table
    from sketchmlflink_spark.streaming.pipelines import events_stream, run_to_batch

    batch = load_table(spark, SF_SMALL, "events")
    assert batch.schema["ts"].dataType.typeName() == "timestamp"

    stream = events_stream(spark, SF_SMALL)
    assert stream.schema["ts"].dataType.typeName() == "timestamp"

    got = run_to_batch(
        stream.groupBy().agg(
            F.count(F.lit(1)).alias("n"),
            F.min("ts").alias("ts_min"),
            F.max("ts").alias("ts_max"),
        )
    ).first()
    want = batch.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.min("ts").alias("ts_min"),
        F.max("ts").alias("ts_max"),
    ).first()
    assert (got.n, got.ts_min, got.ts_max) == (want.n, want.ts_min, want.ts_max)
