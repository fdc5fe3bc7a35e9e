"""Timestamp-encoding robustness for the events loader.

The driver's testdata generator has shipped ``events.ts`` under two
different parquet encodings across rounds:

- parquet TIMESTAMP(NANOS) — Spark's vectorized reader rejects it; the
  loader reads nanos-as-long and rebuilds a microsecond timestamp.
- ``timestamp[us]`` with ``isAdjustedToUTC=false`` (what pyarrow/pandas
  write by default) — Spark ≥3.4 would infer TIMESTAMP_NTZ, which
  ``unix_micros``/``window``/numeric casts all reject.

These tests pin that BOTH encodings come out of ``load_table`` as a plain
``timestamp`` whose epoch-µs values are bit-identical to DuckDB's
``epoch_us(ts)`` over the same file — the invariant every time-typed
oracle comparison (sessionize, tumbling windows, as-of join, rollup)
rests on.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datasheet_etl_spark.io import load_table

# Wall-clock instants chosen so a wrong timezone interpretation could not
# coincide with the right one: mid-year (DST territory in most zones),
# sub-second precision, and a pre-1970 value for sign handling.
WALL = [
    dt.datetime(2024, 1, 1, 0, 0, 7, 179575),
    dt.datetime(2024, 6, 15, 23, 59, 59, 123456),
    dt.datetime(1969, 12, 31, 23, 59, 59, 500000),
]
# NTZ wall-clock read under a UTC session == the naive-UTC epoch:
EPOCH_US = [int(w.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000) for w in WALL]


def _write_events(tmp_path, ts_array: pa.Array) -> str:
    """Write a minimal events.parquet with the given ts encoding."""
    table = pa.table(
        {
            "event_id": pa.array(range(len(WALL)), pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([1] * len(WALL), pa.int64()),
            "event_type": pa.array(["click"] * len(WALL)),
            "value": pa.array([1.0] * len(WALL)),
            "props": pa.array(["{}"] * len(WALL)),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"), version="2.6")
    return str(tmp_path)


def _loaded_epochs(spark, sf_dir: str) -> list[int]:
    from pyspark.sql import functions as F

    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp", dict(df.dtypes)["ts"]
    rows = df.orderBy("event_id").select(F.unix_micros("ts").alias("us")).collect()
    return [r["us"] for r in rows]


def _duckdb_epochs(sf_dir: str) -> list[int]:
    import duckdb

    return [
        r[0]
        for r in duckdb.sql(
            f"select epoch_us(ts) from '{sf_dir}/events.parquet' order by event_id"
        ).fetchall()
    ]


def test_ntz_micros_encoding(spark, tmp_path):
    """pyarrow default: timestamp[us], isAdjustedToUTC=false → would infer
    TIMESTAMP_NTZ without the loader's normalization."""
    sf_dir = _write_events(tmp_path, pa.array(WALL, pa.timestamp("us")))
    meta = pq.read_schema(str(tmp_path / "events.parquet")).field("ts").type
    assert meta == pa.timestamp("us") and meta.tz is None
    got = _loaded_epochs(spark, sf_dir)
    assert got == EPOCH_US
    assert got == _duckdb_epochs(sf_dir)


def test_nanos_encoding(spark, tmp_path):
    """parquet TIMESTAMP(NANOS) (the original testdata encoding) → read
    nanos-as-long and rebuilt; truncation to µs matches DuckDB."""
    sf_dir = _write_events(tmp_path, pa.array(WALL, pa.timestamp("ns")))
    meta = pq.read_schema(str(tmp_path / "events.parquet")).field("ts").type
    assert meta == pa.timestamp("ns")
    got = _loaded_epochs(spark, sf_dir)
    assert got == EPOCH_US
    assert got == _duckdb_epochs(sf_dir)


def test_bigint_epoch_resolution_heuristic(spark, tmp_path):
    """A future generator could ship ts as a raw bigint in any epoch
    resolution; the loader classifies by magnitude (resolutions sit ~3
    decimal orders apart) and normalizes all of them to the same µs."""
    base = EPOCH_US[0]
    cases = {
        "ns": base * 1000,
        "us": base,
        "ms": base // 1000,
        "s": base // 1_000_000,
    }
    for unit, raw in cases.items():
        sf_dir = _write_events(tmp_path, pa.array([raw] * len(WALL), pa.int64()))
        got = _loaded_epochs(spark, sf_dir)
        expect = (base // 1_000_000) * 1_000_000 if unit == "s" else (
            (base // 1000) * 1000 if unit == "ms" else base
        )
        assert got == [expect] * len(WALL), unit


def test_time_ops_resolve_on_ntz_source(spark, tmp_path):
    """The operators that broke on the NTZ drift (cast-to-double,
    unix_micros, window) must all analyze against a loader-normalized
    NTZ-encoded source."""
    from pyspark.sql import functions as F

    sf_dir = _write_events(tmp_path, pa.array(WALL, pa.timestamp("us")))
    df = load_table(spark, sf_dir, "events")
    out = df.select(
        F.col("ts").cast("double").alias("sec"),
        F.unix_micros("ts").alias("us"),
        F.window("ts", "1 hour").start.cast("long").alias("win"),
    ).orderBy("us")
    rows = out.collect()
    assert [r["us"] for r in rows] == sorted(EPOCH_US)
    top = max(EPOCH_US)
    assert rows[-1]["sec"] == pytest.approx(top / 1e6)
    assert rows[-1]["win"] == (top // 1_000_000) // 3600 * 3600
