"""Fixture-schema contract for ``sources.tables.load_table``.

The round-3 regression (21/50 driver checks erroring) was a silent
assumption about the events table's physical ``ts`` encoding: the
fixture switched between int64 TIMESTAMP(NANOS) and µs TIMESTAMP and the
loader only handled one. ``load_table`` now adapts on the actual file
schema; this test pins the contract for all three encodings the loader
handles — any loader regression fails here before it can hit the
correctness gate.
"""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from redpanda_ais_demo_spark.sources import load_table

# Wall-clock instants with sub-second precision; whole microseconds so
# every encoding can represent them exactly.
_TS = [
    datetime.datetime(2024, 5, 1, 12, 34, 56, 789123),
    datetime.datetime(2024, 5, 2, 0, 0, 0, 1),
    datetime.datetime(2024, 5, 3, 23, 59, 59, 999999),
]


def _write_events(dir_path: str, arrow_type: pa.DataType) -> None:
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(_TS, arrow_type),
        }
    )
    # version 2.6 preserves TIMESTAMP(NANOS); older writer versions would
    # silently coerce to µs and mask the nanos read path.
    pq.write_table(table, os.path.join(dir_path, "events.parquet"), version="2.6")


@pytest.mark.parametrize(
    "label,arrow_type",
    [
        ("int64-nanos", pa.timestamp("ns")),
        ("micros-utc", pa.timestamp("us", tz="UTC")),
        ("micros-ntz", pa.timestamp("us")),
    ],
)
def test_load_table_normalizes_every_ts_encoding(spark, tmp_path, label, arrow_type):
    sf_dir = str(tmp_path / label)
    os.makedirs(sf_dir)
    _write_events(sf_dir, arrow_type)

    df = load_table(spark, sf_dir, "events")
    # contract: whatever the physical encoding, ts loads as µs TimestampType
    assert isinstance(df.schema["ts"].dataType, T.TimestampType), (
        f"{label}: expected TimestampType, got {df.schema['ts'].dataType}"
    )
    # and the wall-clock values survive the normalization exactly
    got = [r.ts for r in df.orderBy("event_id").collect()]
    assert got == _TS, f"{label}: {got} != {_TS}"


# Canonical driver-fixture schemas the whole query surface assumes.
# The r3 gate collapse came from ONE silent physical-type change; this
# sweep turns any future fixture drift (renamed column, widened type,
# new encoding) into a single obvious local failure instead of 20+
# opaque driver errors. Columns the loader normalizes (events.ts) are
# asserted post-normalization.
_EXPECTED_SCHEMAS = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint", "c_name": "string", "c_nationkey": "int",
        "c_acctbal": "double", "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint", "s_name": "string", "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint", "p_name": "string", "p_brand": "string",
        "p_type": "string", "p_size": "int", "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint", "o_custkey": "bigint", "o_orderstatus": "string",
        "o_totalprice": "double", "o_orderdate": "timestamp_ntz",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint", "l_partkey": "bigint", "l_suppkey": "bigint",
        "l_linenumber": "int", "l_quantity": "double", "l_extendedprice": "double",
        "l_discount": "double", "l_tax": "double", "l_returnflag": "string",
        "l_linestatus": "string", "l_shipdate": "timestamp_ntz",
    },
    "events": {
        "event_id": "bigint", "ts": "timestamp", "user_id": "bigint",
        "event_type": "string", "value": "double", "props": "string",
    },
    "documents": {
        "doc_id": "bigint", "text": "string", "lang": "string",
        "source": "string", "n_chars": "bigint",
    },
    "embeddings": {"vec_id": "bigint", "embedding": "array<float>", "label": "int"},
}


def test_driver_fixture_schemas_match_contract(spark):
    from redpanda_ais_demo_spark.sources import TABLES, load_table

    from .conftest import SF_SMOKE

    assert set(_EXPECTED_SCHEMAS) == set(TABLES)
    for name in TABLES:
        got = {
            f.name: f.dataType.simpleString()
            for f in load_table(spark, SF_SMOKE, name).schema.fields
        }
        assert got == _EXPECTED_SCHEMAS[name], f"{name} fixture schema drifted"


def test_load_table_truncates_sub_microsecond_nanos(spark, tmp_path):
    # nanos → µs is a floor division; pin it so a future rounding change
    # (which would shift values against the DuckDB oracle) is visible
    sf_dir = str(tmp_path / "nanos-frac")
    os.makedirs(sf_dir)
    base = 1_714_567_890_123_456_789  # ...789 ns past the µs boundary
    table = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array([base], pa.timestamp("ns")),
        }
    )
    pq.write_table(table, os.path.join(sf_dir, "events.parquet"), version="2.6")
    got = load_table(spark, sf_dir, "events").collect()[0].ts
    expected = datetime.datetime.utcfromtimestamp(0) + datetime.timedelta(
        microseconds=base // 1000
    )
    assert got == expected
