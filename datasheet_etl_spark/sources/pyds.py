"""Python DataSource API seam (Spark 4, `pyspark.sql.datasource`) —
the U-category extension surface alongside the UDTF (t76) and
GROUPED_AGG UDAF (t79) seams: a custom source the engine can register
and read like any built-in format.

``SyntheticEventsDataSource`` is a deterministic partition-parallel
generator (reference: the S6/S8 "external feed" sources, re-expressed
as a first-class format instead of a driver-side loop): `numRows` rows
split over `numPartitions` planner tasks; every column derives from
the row id by integer arithmetic (value is exact quarters — n/4 is an
IEEE-exact double for any modest integer), so a DuckDB range() oracle
re-derives every row and the source is retry/partitioning-independent
by construction.

Scale shape: each partition generates its own contiguous id slice from
its ``InputPartition`` value alone — no driver-side data, no shared
state, N planner tasks for N partitions; this is the template for
wrapping any external keyed fetch (an API shard, a kafka-less feed)
as a parallel source the optimizer can schedule."""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_SCHEMA = "event_id bigint, bucket int, value double"


class _SlicePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("numRows", 1000))
        self.parts = int(options.get("numPartitions", 4))
        if self.n < 0 or self.parts < 1:
            raise ValueError(
                f"numRows must be >= 0 and numPartitions >= 1, got "
                f"{self.n}/{self.parts}"
            )

    def partitions(self):
        per = -(-self.n // self.parts)  # ceil-div; last slice may be short
        return [
            _SlicePartition(i * per, min((i + 1) * per, self.n))
            for i in range(self.parts)
            if i * per < self.n
        ] or [_SlicePartition(0, 0)]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            yield (i, i % 10, (i % 97) / 4.0)


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls):
        return "synth_events"

    def schema(self):
        return _SCHEMA

    def reader(self, schema):
        return SyntheticEventsReader(self.options)


def register_synth_events(spark) -> None:
    """Idempotent registration of the custom format with a session."""
    spark.dataSource.register(SyntheticEventsDataSource)


_FEED_SCHEMA = "event_id bigint, bucket int"


def _feed_rows(start: int, end: int):
    return iter([(i, i % 7) for i in range(start, end)])


class SyntheticFeedStreamReader(SimpleDataSourceStreamReader):
    """Custom STREAMING source with explicit offset management — the
    exactly-once contract made of three methods: ``read`` advances the
    offset by one batch of at most ``batchSize`` rows, ``
    readBetweenOffsets`` re-derives a committed batch DETERMINISTICALLY
    for crash replay (same offsets ⇒ same rows, the whole guarantee),
    and Spark checkpoints the offsets — so a restarted query resumes
    exactly where the last commit left off. The feed is bounded at
    ``numRows`` (read returns an empty slice at the end, never an
    error)."""

    def __init__(self, options):
        self.total = int(options.get("numRows", 100))
        self.batch = int(options.get("batchSize", 30))
        if self.total < 0 or self.batch < 1:
            raise ValueError(
                f"numRows must be >= 0 and batchSize >= 1, got "
                f"{self.total}/{self.batch}"
            )

    def initialOffset(self):
        return {"pos": 0}

    def read(self, start):
        pos = int(start["pos"])
        end = min(pos + self.batch, self.total)
        return _feed_rows(pos, end), {"pos": end}

    def readBetweenOffsets(self, start, end):
        return _feed_rows(int(start["pos"]), int(end["pos"]))


class SyntheticFeedDataSource(DataSource):
    @classmethod
    def name(cls):
        return "synth_feed"

    def schema(self):
        return _FEED_SCHEMA

    def simpleStreamReader(self, schema):
        return SyntheticFeedStreamReader(self.options)


def register_synth_feed(spark) -> None:
    """Idempotent registration of the streaming format."""
    spark.dataSource.register(SyntheticFeedDataSource)
