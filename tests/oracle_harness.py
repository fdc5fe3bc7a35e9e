"""Local mirror of the driver's DuckDB-oracle compare.

Runs a Spark query and its oracle SQL side by side and checks row count,
column names, and order-insensitive values with floats rounded to 6
places — the same contract CORRECTNESS_r{N}.json records.
"""

from __future__ import annotations

import math

import duckdb

from datasheet_etl_spark.io import TABLES

FLOAT_DECIMALS = 6


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir.rstrip('/')}/{name}.parquet'"
        )
    return con


def _canon_value(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, FLOAT_DECIMALS)
        return 0.0 if r == 0 else r  # -0.0 → 0.0
    if isinstance(v, int):
        return v
    return str(v)


def _canon_rows(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon_value(row[i]) for i in order) for row in rows]
    return sorted(out, key=repr)


def compare(spark_df, oracle_sql: str, sf_dir: str) -> tuple[bool, str]:
    """Returns (ok, message)."""
    ok, msg, _ = compare_counted(spark_df, oracle_sql, sf_dir)
    return ok, msg


def compare_counted(
    spark_df, oracle_sql: str, sf_dir: str
) -> tuple[bool, str, int]:
    """``compare`` plus the Spark row count from the SAME execution —
    for callers (the sweep artifact) that would otherwise re-run the
    whole plan, side effects included, just to count rows."""
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)

    con = duckdb_conn(sf_dir)
    try:
        res = con.execute(oracle_sql)
        d_cols = [d[0] for d in res.description]
        d_rows = res.fetchall()
    finally:
        con.close()

    if sorted(s_cols) != sorted(d_cols):
        return (
            False,
            f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}",
            len(s_rows),
        )
    if len(s_rows) != len(d_rows):
        return (
            False,
            f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}",
            len(s_rows),
        )

    cs = _canon_rows(s_rows, s_cols)
    cd = _canon_rows(d_rows, d_cols)
    if cs != cd:
        diffs = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
        return (
            False,
            f"value mismatch, first diffs (spark vs duckdb): {diffs}",
            len(s_rows),
        )
    return True, "ok", len(s_rows)


def oracle_arrow_types(oracle_sql: str, sf_dir: str) -> list[tuple[str, str]]:
    """(column, arrow type) of an oracle's DuckDB result via the TYPED
    fetch path (``.arrow()``, LIMIT 0 so aggregates never execute).

    The r14 t131 driver hash mismatch lived exactly here: DuckDB's
    ``sum(BIGINT)`` is HUGEINT — a plain Python int through
    ``fetchall()`` (so the tuple-path compare above passes) but
    decimal128(38,0) through ``.arrow()`` and float64 through
    ``.df()``, which a typed-path canonicalizer hashes differently
    from Spark's int64. Oracles must CAST such aggregates so EVERY
    fetch path agrees; tests/test_oracle.py pins the invariant
    registry-wide with this helper."""
    con = duckdb_conn(sf_dir)
    try:
        tbl = con.execute(
            f"SELECT * FROM ({oracle_sql}) AS _q LIMIT 0"
        ).arrow()
    finally:
        con.close()
    return [(f.name, str(f.type)) for f in tbl.schema]
