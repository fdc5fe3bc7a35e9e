"""U7 progress callback: task-level reporting during an action."""

from __future__ import annotations

import time


def test_progress_reporter_sees_task_progress(spark):
    from pyspark.sql import functions as F

    from datasheet_etl_spark.progress import ProgressReporter

    calls: list[tuple[int, int, str]] = []

    @F.udf("long")
    def slow(x):
        time.sleep(0.15)
        return x

    df = spark.range(16, numPartitions=16).select(slow("id").alias("v"))
    with ProgressReporter(spark, lambda c, t, n: calls.append((c, t, n)), 0.05):
        df.write.format("noop").mode("overwrite").save()

    assert calls, "poller never observed the running job"
    done = [c for c, _, _ in calls]
    assert done == sorted(done), "progress must be monotonic"
    assert all(t >= 16 for _, t, _ in calls)
    assert all(c <= t for c, t, _ in calls)


def test_progress_callback_errors_do_not_kill_the_job(spark):
    from datasheet_etl_spark.progress import ProgressReporter

    def bad_cb(c, t, n):
        raise RuntimeError("hook blew up")

    with ProgressReporter(spark, bad_cb, 0.05):
        assert spark.range(1000).count() == 1000  # job completes anyway
