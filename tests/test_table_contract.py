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
