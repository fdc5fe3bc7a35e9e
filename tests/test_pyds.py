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


def test_pyds_stream_offsets_and_replay(spark, tmp_path):
    """The streaming seam's exactly-once mechanics, driven directly:
    read() advances {'pos'} by at most batchSize and stops at the
    bounded end; readBetweenOffsets re-derives exactly the committed
    slice (replay determinism — the whole guarantee); a fresh query
    against a checkpoint that already drained part of the feed resumes
    from the committed offset, never re-emitting rows."""
    from datasheet_etl_spark.sources.pyds import (
        SyntheticFeedStreamReader,
        register_synth_feed,
    )

    r = SyntheticFeedStreamReader({"numRows": "70", "batchSize": "30"})
    assert r.initialOffset() == {"pos": 0}
    rows1, o1 = r.read({"pos": 0})
    assert o1 == {"pos": 30} and len(list(rows1)) == 30
    rows3, o3 = r.read({"pos": 60})
    assert o3 == {"pos": 70} and len(list(rows3)) == 10  # short tail
    empty, o4 = r.read({"pos": 70})
    assert o4 == {"pos": 70} and list(empty) == []
    # replay: committed slice re-derived bit-identically
    assert list(r.readBetweenOffsets({"pos": 30}, {"pos": 60})) == [
        (i, i % 7) for i in range(30, 60)
    ]
    with pytest.raises(ValueError, match="batchSize"):
        SyntheticFeedStreamReader({"batchSize": "0"})

    # end-to-end: two availableNow drains on ONE checkpoint cover the
    # feed exactly once
    register_synth_feed(spark)
    out_p, ckpt = str(tmp_path / "rows"), str(tmp_path / "ck")
    for _ in range(2):
        q = (
            spark.readStream.format("synth_feed")
            .option("numRows", "70").option("batchSize", "40").load()
            .writeStream.format("parquet")
            .option("path", out_p)
            .option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()
    got = spark.read.parquet(out_p)
    assert got.count() == 70
    assert {r["event_id"] for r in got.collect()} == set(range(70))


def test_pyds_pushdown_narrows_generation(spark):
    """t114's pruning made observable: pushed id-range bounds narrow
    the generation span BEFORE partition planning, so the tail slice
    [100, 103) plans 3 one-row partitions instead of 8 over 103 rows
    — pruned rows are never produced. The residual bucket filter is
    applied by Spark post-scan, and the plain (no-pushdown) reader
    keeps working with the conf untouched."""
    prev = spark.conf.get("spark.sql.python.filterPushdown.enabled", None)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        df = (
            _read(spark, numRows=103, numPartitions=8, pushdown="true")
            .filter("event_id >= 100")
        )
        assert df.rdd.getNumPartitions() == 3
        assert {r["event_id"] for r in df.collect()} == {100, 101, 102}
        # residual predicate on a non-pushable column still correct
        res = (
            _read(spark, numRows=103, numPartitions=8, pushdown="true")
            .filter("event_id >= 100 AND bucket = 0")
            .collect()
        )
        assert [r["event_id"] for r in res] == [100]
        # contradictory bounds: empty, no error
        assert (
            _read(spark, numRows=103, pushdown="true")
            .filter("event_id >= 50 AND event_id < 10")
            .count()
            == 0
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.python.filterPushdown.enabled")
        else:
            spark.conf.set("spark.sql.python.filterPushdown.enabled", prev)


def test_pyds_writer_two_phase_commit_and_abort(spark, tmp_path):
    """The writer seam's transactional story: a successful job
    publishes a _MANIFEST naming exactly the committed files (readers
    resolve it — staged orphans are invisible); a job with a planted
    task failure never publishes a manifest, so the committed read
    sees nothing — even though failed attempts may leave partial
    staged files behind."""
    from datasheet_etl_spark.sources.pyds import (
        read_jsonl_manifest,
        register_jsonl_manifest,
        register_synth_events,
    )

    register_synth_events(spark)
    register_jsonl_manifest(spark)
    src = (
        spark.read.format("synth_events")
        .option("numRows", "50")
        .option("numPartitions", "4")
        .load()
    )
    out = str(tmp_path / "sink")
    src.write.format("jsonl_manifest").option("path", out).mode(
        "append"
    ).save()
    got = read_jsonl_manifest(spark, out)
    assert got.count() == 50
    assert {r["event_id"] for r in got.collect()} == set(range(50))

    # planted task failure: no manifest, committed read sees nothing
    out2 = str(tmp_path / "sink2")
    import pytest as _pytest

    with _pytest.raises(Exception, match="planted task failure|aborted"):
        src.write.format("jsonl_manifest").option("path", out2).option(
            "failOnValue", "17"
        ).mode("append").save()
    assert read_jsonl_manifest(spark, out2) is None


def test_pyds_writer_append_merges_overwrite_replaces(spark, tmp_path):
    """Review-found r11: a second append must MERGE with the committed
    view (not silently unreference the first job's files); overwrite
    replaces the manifest and deletes the old generation's files; an
    empty commit comes back with the WRITTEN schema, not inference's
    zero columns."""
    from datasheet_etl_spark.sources.pyds import (
        read_jsonl_manifest,
        register_jsonl_manifest,
        register_synth_events,
    )
    import os

    register_synth_events(spark)
    register_jsonl_manifest(spark)

    def feed(n):
        return (
            spark.read.format("synth_events")
            .option("numRows", str(n)).option("numPartitions", "2").load()
        )

    out = str(tmp_path / "sink")
    feed(10).write.format("jsonl_manifest").option("path", out).mode(
        "append").save()
    feed(10).selectExpr(
        "event_id + 100 as event_id", "bucket", "value"
    ).write.format("jsonl_manifest").option("path", out).mode("append").save()
    got = read_jsonl_manifest(spark, out)
    assert got.count() == 20
    ids = {r["event_id"] for r in got.collect()}
    assert ids == set(range(10)) | set(range(100, 110))

    n_files_before = len(
        [f for f in os.listdir(out) if f.startswith("part-")]
    )
    feed(5).write.format("jsonl_manifest").option("path", out).mode(
        "overwrite").save()
    got = read_jsonl_manifest(spark, out)
    assert {r["event_id"] for r in got.collect()} == set(range(5))
    # old generation's files deleted, only the new job's stagings remain
    n_files_after = len(
        [f for f in os.listdir(out) if f.startswith("part-")]
    )
    assert n_files_after < n_files_before

    # empty commit: written schema survives, no inference collapse
    empty_out = str(tmp_path / "empty_sink")
    feed(0).write.format("jsonl_manifest").option("path", empty_out).mode(
        "append").save()
    e = read_jsonl_manifest(spark, empty_out)
    assert e.count() == 0
    assert set(e.columns) == {"event_id", "bucket", "value"}
    assert e.groupBy("bucket").count().count() == 0


def test_pyds_writer_schema_guards(spark, tmp_path):
    """ADVICE r11: (a) append with a drifted column set must REFUSE at
    commit — the manifest records ONE schema for every referenced
    file, so merging a different schema would silently re-type earlier
    committed rows on read; (b) non-JSON-native column types
    (timestamp/decimal/binary/...) refuse at PLAN time with a clear
    message instead of a mid-task json.dumps TypeError after staged
    files exist."""
    import pytest as _pytest

    from datasheet_etl_spark.sources.pyds import (
        read_jsonl_manifest,
        register_jsonl_manifest,
        register_synth_events,
    )

    register_synth_events(spark)
    register_jsonl_manifest(spark)
    feed = (
        spark.read.format("synth_events")
        .option("numRows", "6").option("numPartitions", "2").load()
    )
    out = str(tmp_path / "sink")
    feed.write.format("jsonl_manifest").option("path", out).mode(
        "append").save()

    # (a) drifted append refused; the committed view is untouched
    with _pytest.raises(Exception, match="append schema differs"):
        feed.selectExpr(
            "event_id", "value"
        ).write.format("jsonl_manifest").option("path", out).mode(
            "append").save()
    got = read_jsonl_manifest(spark, out)
    assert got.count() == 6
    assert set(got.columns) == {"event_id", "bucket", "value"}

    # (b) JSON-unrepresentable types refuse at plan time, naming the
    # offending column:type pairs
    for expr, label in [
        ("timestamp'2026-01-01' as ts", "ts:timestamp"),
        ("cast(1.5 as decimal(5,2)) as d", "d:decimal(5,2)"),
        ("cast('ab' as binary) as b", "b:binary"),
    ]:
        with _pytest.raises(Exception, match="JSON-native"):
            feed.selectExpr("event_id", expr).write.format(
                "jsonl_manifest"
            ).option("path", str(tmp_path / "bad")).mode("append").save()
    import os

    assert not os.path.exists(str(tmp_path / "bad"))

    # arrays of atomics ARE native and round-trip
    arr_out = str(tmp_path / "arr")
    feed.selectExpr(
        "event_id", "array(value, value + 1.0) as vals"
    ).write.format("jsonl_manifest").option("path", arr_out).mode(
        "append").save()
    arr = read_jsonl_manifest(spark, arr_out)
    assert arr.count() == 6
    r = {x["event_id"]: x["vals"] for x in arr.collect()}
    assert len(r[0]) == 2 and abs(r[0][1] - r[0][0] - 1.0) < 1e-9


def test_pyds_stream_crash_replay_through_checkpoint(spark, tmp_path):
    """VERDICT r11 #5: plant the mid-batch crash window (offsets/<n>
    recorded, commits/<n> missing — the state a kill between offset
    write and commit leaves) and pin that the restarted query replays
    exactly batch n through readBetweenOffsets with IDENTICAL rows:
    the t99/t105 crash-replay discipline applied to the Python
    DataSource seam. Per-batch rows are captured by a foreachBatch
    observer, so the replayed batch is compared row-for-row against
    the original run's batch, not just by end-state counts."""
    import json as _json
    import os
    import uuid as _uuid

    from datasheet_etl_spark.sources.pyds import register_synth_feed

    register_synth_feed(spark)
    capture = tmp_path / "capture"
    capture.mkdir()
    ckpt = str(tmp_path / "ck")

    def observer(batch_df, batch_id):
        rows = sorted(tuple(r) for r in batch_df.collect())
        (capture / f"b{batch_id}_{_uuid.uuid4().hex}.json").write_text(
            _json.dumps(rows)
        )

    def drain():
        q = (
            spark.readStream.format("synth_feed")
            .option("numRows", "70").option("batchSize", "30").load()
            .writeStream.foreachBatch(observer)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    # Python stream sources fall back to single-batch execution under
    # availableNow (Spark's own WARN), so each drain advances one
    # batch: 70 rows / 30 per batch -> three drains, batches 0,1,2
    for _ in range(3):
        drain()
    by_batch: dict[str, list] = {}
    for f in os.listdir(capture):
        by_batch.setdefault(f.split("_")[0], []).append(f)
    # every batch captured exactly once
    assert all(len(v) == 1 for v in by_batch.values()), by_batch
    all_rows = sorted(
        t
        for fs in by_batch.values()
        for t in _json.loads((capture / fs[0]).read_text())
    )
    assert [r[0] for r in all_rows] == list(range(70))

    # plant the crash: the LAST batch's commit record vanishes while
    # its offset survives — to the restarted query, batch n is
    # in-flight and must be re-executed from the checkpointed offsets
    commits = sorted(
        int(f) for f in os.listdir(f"{ckpt}/commits") if not f.startswith(".")
    )
    n = commits[-1]
    os.remove(f"{ckpt}/commits/{n}")
    crc = f"{ckpt}/commits/.{n}.crc"
    if os.path.exists(crc):
        # drop the checksum sidecar too — a stale CRC next to the
        # recreated commit record reads as a concurrent writer
        os.remove(crc)
    first_run = dict(by_batch)

    drain()
    by_batch2: dict[str, list] = {}
    for f in os.listdir(capture):
        by_batch2.setdefault(f.split("_")[0], []).append(f)
    # exactly the in-flight batch replayed, nothing else re-emitted
    assert len(by_batch2[f"b{n}"]) == 2
    for b, fs in by_batch2.items():
        if b != f"b{n}":
            assert fs == first_run[b], f"batch {b} unexpectedly re-ran"
    a, b = (
        _json.loads((capture / f).read_text()) for f in by_batch2[f"b{n}"]
    )
    # the whole guarantee: same offsets => same rows, bit-identical
    assert a == b and a, (a, b)
    # and the replay re-committed: the checkpoint's commit record is back
    assert os.path.exists(f"{ckpt}/commits/{n}")


def test_pyds_writer_append_tolerates_nullability_drift(spark, tmp_path):
    """Review-found (r12): the append-schema guard must compare
    (name, type) shape, not raw schema JSON — Spark flips nullability
    freely across plans (literals, filters, aggregation), and
    appending non-nullable data into a nullable column cannot re-type
    anything."""
    from datasheet_etl_spark.sources.pyds import (
        read_jsonl_manifest,
        register_jsonl_manifest,
    )

    register_jsonl_manifest(spark)
    out = str(tmp_path / "sink")
    # nullable value column first
    spark.createDataFrame(
        [(1, 1.0), (2, None)], "event_id bigint, value double"
    ).write.format("jsonl_manifest").option("path", out).mode(
        "append").save()
    # non-nullable shape for the same columns (selectExpr literals)
    spark.range(3, 5).selectExpr(
        "id as event_id", "cast(id as double) as value"
    ).write.format("jsonl_manifest").option("path", out).mode(
        "append").save()
    got = read_jsonl_manifest(spark, out)
    assert got.count() == 4
    assert {r["event_id"] for r in got.collect()} == {1, 2, 3, 4}
    # the recorded schema stays TRUE for every referenced file: the
    # first append committed a NULL, so 'value' must remain nullable
    # even though the LATEST writer's frame was non-nullable
    # (review-found r12, second pass)
    import json as _json
    import os as _os

    manifest = _json.loads(open(_os.path.join(out, "_MANIFEST")).read())
    from pyspark.sql.types import StructType

    st = StructType.fromJson(_json.loads(manifest["schema"]))
    assert {f.name: f.nullable for f in st.fields}["value"] is True
    assert sum(1 for r in got.collect() if r["value"] is None) == 1

    # array ELEMENT nullability unions too (review-found r12, third
    # pass): a NULL element appended into a containsNull=false array
    # column must flip the recorded containsNull
    arr_out = str(tmp_path / "arr_sink")
    spark.sql(
        "SELECT 1L AS event_id, array(1L, 2L) AS xs"
    ).write.format("jsonl_manifest").option("path", arr_out).mode(
        "append").save()
    spark.createDataFrame(
        [(2, [3, None])], "event_id bigint, xs array<bigint>"
    ).write.format("jsonl_manifest").option("path", arr_out).mode(
        "append").save()
    m2 = _json.loads(open(_os.path.join(arr_out, "_MANIFEST")).read())
    st2 = StructType.fromJson(_json.loads(m2["schema"]))
    assert {f.name: f.dataType.containsNull for f in st2.fields
            if f.name == "xs"}["xs"] is True
    arr_got = read_jsonl_manifest(spark, arr_out)
    assert sorted(
        (r["event_id"], tuple(r["xs"])) for r in arr_got.collect()
    ) == [(1, (1, 2)), (2, (3, None))]


def test_pyds_stream_sink_per_batch_manifests_and_exactly_once(
    spark, tmp_path
):
    """t143's sink discipline: a streamed write commits one atomic
    manifest per micro-batch; the committed read returns every input
    row exactly once; a RETRIED batch replaces its own manifest and
    the superseded attempt's files become invisible (batch-id
    idempotence = exactly-once at rest)."""
    import glob
    import json
    import os

    from datasheet_etl_spark.sources.pyds import (
        JsonLinesStreamWriter,
        read_jsonl_manifests_stream,
        register_jsonl_manifest,
        register_synth_feed,
    )

    register_synth_feed(spark)
    register_jsonl_manifest(spark)
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    # two availableNow drains on ONE checkpoint (the feed grows between
    # them): each drain commits its own batch, so the sink must hold
    # two per-batch manifests covering the feed exactly once
    for n in ("12", "30"):
        q = (
            spark.readStream.format("synth_feed")
            .option("numRows", n)
            .load()
            .writeStream.format("jsonl_manifest")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    manifests = sorted(glob.glob(os.path.join(sink, "_MANIFEST_b*")))
    assert len(manifests) >= 2, manifests  # genuinely multi-batch
    back = read_jsonl_manifests_stream(spark, sink)
    got = sorted(r["event_id"] for r in back.collect())
    assert got == sorted(set(got))  # exactly once
    n_before = back.count()

    # retried batch: re-commit batch 0 with a fresh attempt's files —
    # the manifest must swap atomically and the OLD attempt's files
    # must become unreferenced (and be deleted)
    m0 = json.loads(open(manifests[0]).read())
    old_files = set(m0["files"])
    from pyspark.sql.types import StructType

    schema = StructType.fromJson(json.loads(m0["schema"]))
    w = JsonLinesStreamWriter({"path": sink}, schema, True)
    rows = back.limit(3).collect()
    msg = w.write(iter(rows))
    w.commit([msg], batchId=0)
    m0b = json.loads(open(manifests[0]).read())
    assert set(m0b["files"]) == {os.path.basename(msg.path)}
    for f in old_files:
        assert not os.path.exists(os.path.join(sink, f))
    # committed view now reflects the retried batch's content only
    back2 = read_jsonl_manifests_stream(spark, sink)
    assert back2.count() == n_before - m0["rows"] + 3

    # abort path: staged file removed, no manifest touched
    msg2 = w.write(iter(rows))
    assert os.path.exists(msg2.path)
    w.abort([msg2], batchId=99)
    assert not os.path.exists(msg2.path)
    assert not glob.glob(os.path.join(sink, "_MANIFEST_b*000099*"))


def test_pyds_stream_manifests_tolerate_nullability_drift(spark, tmp_path):
    """ADVICE r14 #1: read_jsonl_manifests_stream compared raw
    schema-JSON strings across batch manifests, regressing the r12
    batch-writer lesson — nullability/metadata flip freely across the
    plans of successive drains and cannot re-type rows. Pin the fixed
    contract: shape-identical manifests differing only in nullability
    read fine (nullability unioned), while a genuine type drift still
    refuses loudly."""
    import json
    import os

    from pyspark.sql.types import StructType

    from datasheet_etl_spark.sources.pyds import (
        read_jsonl_manifests_stream,
    )

    sink = str(tmp_path / "sink")
    os.makedirs(sink)

    def manifest(batch, fname, schema_fields):
        fpath = os.path.join(sink, fname)
        with open(fpath, "w") as fh:
            fh.write('{"event_id": 1, "tag": "a"}\n')
        schema = {"type": "struct", "fields": schema_fields}
        with open(os.path.join(sink, f"_MANIFEST_b{batch:020d}"), "w") as fh:
            fh.write(
                json.dumps(
                    {
                        "files": [fname],
                        "rows": 1,
                        "schema": json.dumps(schema),
                    }
                )
            )

    f = lambda name, typ, nullable: {  # noqa: E731
        "name": name,
        "type": typ,
        "nullable": nullable,
        "metadata": {},
    }
    # batch 0: non-nullable event_id; batch 1: nullable — same shape
    manifest(0, "p0.json", [f("event_id", "long", False), f("tag", "string", True)])
    manifest(1, "p1.json", [f("event_id", "long", True), f("tag", "string", True)])
    back = read_jsonl_manifests_stream(spark, sink)
    assert back.count() == 2
    # nullability unioned: the read schema must admit rows from BOTH
    got = StructType.fromJson(json.loads(back.schema.json()))
    assert [fld.nullable for fld in got.fields][0] is True

    # genuine type drift still refuses
    manifest(2, "p2.json", [f("event_id", "string", True), f("tag", "string", True)])
    import pytest as _pytest

    with _pytest.raises(ValueError, match="schema shape"):
        read_jsonl_manifests_stream(spark, sink)


def test_pyds_arrow_reader_yields_batches_and_matches_tuple_source(spark):
    """t149's seam contract: the Arrow-path reader genuinely yields
    pyarrow RecordBatches (not tuples), rows are identical to the
    tuple-yielding source under the same options, and results are
    chunking-independent (ragged batch boundaries included)."""
    import pyarrow as pa

    from datasheet_etl_spark.sources.pyds import (
        ArrowEventsReader,
        _SlicePartition,
        register_synth_events,
        register_synth_events_arrow,
    )

    r = ArrowEventsReader({"numRows": "100", "arrowBatchSize": "7"})
    chunks = list(r.read(_SlicePartition(0, 100)))
    assert all(isinstance(c, pa.RecordBatch) for c in chunks)
    assert len(chunks) == 15 and chunks[-1].num_rows == 100 % 7  # ragged
    assert sum(c.num_rows for c in chunks) == 100

    register_synth_events(spark)
    register_synth_events_arrow(spark)

    def rows(fmt, **opts):
        rd = spark.read.format(fmt).option("numRows", "1000").option(
            "numPartitions", "3"
        )
        for k, v in opts.items():
            rd = rd.option(k, v)
        return sorted(map(tuple, rd.load().collect()))

    base = rows("synth_events")
    assert rows("synth_events_arrow") == base
    assert rows("synth_events_arrow", arrowBatchSize="17") == base

    import pytest as _pytest

    with _pytest.raises(Exception):
        ArrowEventsReader({"numRows": "10", "arrowBatchSize": "0"})
