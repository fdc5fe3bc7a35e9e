"""Python DataSource seam (sources/pyds.py, t112): partition planning,
slice arithmetic, and option validation."""

from __future__ import annotations

import pytest


def _read(spark, **opts):
    from datasheet_etl_spark.sources.pyds import register_synth_events

    register_synth_events(spark)
    r = spark.read.format("synth_events")
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_pyds_partitions_become_tasks_and_rows_are_exact(spark):
    df = _read(spark, numRows=103, numPartitions=8)
    # 8 InputPartitions -> 8 planner tasks; ceil-div slices cover 103
    # rows exactly once with a short last slice
    assert df.rdd.getNumPartitions() == 8
    rows = df.collect()
    assert len(rows) == 103
    assert {r["event_id"] for r in rows} == set(range(103))
    assert all(r["bucket"] == r["event_id"] % 10 for r in rows)
    assert all(r["value"] == (r["event_id"] % 97) / 4.0 for r in rows)


def test_pyds_empty_and_oversplit(spark):
    assert _read(spark, numRows=0, numPartitions=4).count() == 0
    # more partitions than rows: empty slices are never planned
    df = _read(spark, numRows=3, numPartitions=16)
    assert df.count() == 3


def test_pyds_option_validation(spark):
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception, match="numRows|numPartitions"):
        try:
            _read(spark, numRows=-1).count()
        except Py4JJavaError as e:  # surfaced through the JVM bridge
            raise ValueError(str(e.java_exception)[:500]) from e
