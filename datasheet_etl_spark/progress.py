"""U7: progress callback — the reference's ``on_progress(cur, total,
name)`` hook (batch_export.py BatchProcessor; cli.py:75) re-expressed
for a distributed engine.

A per-document Python callback cannot exist inside one distributed job
(executors do not call back into the driver mid-stage), so the honest
Spark-native equivalent reports TASK progress: a daemon thread polls
``SparkContext.statusTracker()`` while an action runs and invokes the
callback with (completed_tasks, total_tasks, stage_label). For a batch
of N documents partitioned N-ways this is exactly per-document progress;
for everything else it is the truthful unit of work the engine has.

Zero instrumentation cost on the job itself: the poller reads the
driver-side status cache, touching no executor."""

from __future__ import annotations

import threading
import time
from collections.abc import Callable

from pyspark.sql import SparkSession

OnProgress = Callable[[int, int, str], None]


class ProgressReporter:
    """Context manager: poll task progress during the enclosed action(s).

    >>> with ProgressReporter(spark, lambda c, t, n: print(f"[{c}/{t}] {n}")):
    ...     df.write.format("noop").mode("overwrite").save()

    The callback fires at most once per poll interval and once more on
    exit with the final counts. Monotonic per stage-set; never raises
    into the job (callback errors are swallowed after the first report).
    """

    def __init__(
        self,
        spark: SparkSession,
        on_progress: OnProgress,
        poll_interval_s: float = 0.2,
    ):
        self._sc = spark.sparkContext
        self._cb = on_progress
        self._interval = poll_interval_s
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._last: tuple[int, int] | None = None

    def _snapshot(self) -> tuple[int, int, str] | None:
        tracker = self._sc.statusTracker()
        stage_ids = sorted(
            {s for j in tracker.getActiveJobsIds() for s in (tracker.getJobInfo(j).stageIds if tracker.getJobInfo(j) else [])}
        )
        done = total = 0
        active = []
        for sid in stage_ids:
            info = tracker.getStageInfo(sid)
            if info is None:
                continue
            total += info.numTasks
            done += info.numCompletedTasks
            if info.numCompletedTasks < info.numTasks:
                active.append(sid)
        if total == 0:
            return None
        label = f"stage {active[0]}" if active else "finishing"
        return done, total, label

    def _emit(self, snap: tuple[int, int, str]) -> None:
        done, total, label = snap
        if self._last == (done, total):
            return
        self._last = (done, total)
        try:
            self._cb(done, total, label)
        except Exception:
            pass  # a progress hook must never kill the job

    def _run(self) -> None:
        while not self._stop.wait(self._interval):
            snap = self._snapshot()
            if snap is not None:
                self._emit(snap)

    def __enter__(self) -> "ProgressReporter":
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2.0)
        snap = self._snapshot()
        if snap is not None:
            self._emit(snap)
        return None


def progress_printer(prefix: str = "") -> OnProgress:
    """The reference CLI's ``[cur/tot] name`` line as a callback."""

    def cb(cur: int, total: int, name: str) -> None:
        print(f"{prefix}[{cur}/{total}] {name}")

    return cb
