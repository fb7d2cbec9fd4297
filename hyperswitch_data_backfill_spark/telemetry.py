"""Job progress & telemetry — parity with the reference's progress bars.

The reference renders indicatif progress bars per merchant batch and per
entity dump (``lib.rs:9-13`` template, ``main.rs:171-186,225-260``
wiring) because its driver loop IS the execution. On Spark the
executors run the job, so progress parity means two things:

1. **Labeling** — every action carries a job group + description so the
   Spark UI / history server (the cluster's native progress surface)
   attributes stages to the entity pipeline that spawned them
   (``job_group`` context manager).
2. **Polling** — a driver-side tracker that samples
   ``SparkContext.statusTracker()`` while an action runs and reports
   active/completed task counts (``poll_progress``), the moral
   equivalent of ``{pos}/{len}`` without any listener jars or UI
   scraping. It is read-only and safe to call from any thread.

Nothing here touches the data plane: no accumulators in hot paths, no
per-row callbacks — at 100 TB, telemetry must cost O(stages), not
O(rows).
"""

from __future__ import annotations

import sys
import threading
import time
from contextlib import contextmanager

from pyspark.sql import SparkSession


@contextmanager
def job_group(spark: SparkSession, group_id: str, description: str):
    """Label every action in the block for the Spark UI (and cancellation).

    ≙ the per-entity progress bar message (``main.rs:184-186``): the
    Spark UI's job table becomes the multi-bar — one labeled row per
    entity, task counts as the bar.
    """
    sc = spark.sparkContext
    sc.setJobGroup(group_id, description, interruptOnCancel=False)
    try:
        yield
    finally:
        # clear instead of leaking the label onto unrelated later actions
        sc.setJobGroup("", "")


def snapshot_progress(spark: SparkSession) -> dict:
    """One sample of cluster-wide task progress: {active_jobs, active_tasks,
    completed_tasks, total_tasks} across all active stages."""
    st = spark.sparkContext.statusTracker()
    active_tasks = completed = total = 0
    for sid in st.getActiveStageIds():
        info = st.getStageInfo(sid)
        if info is None:
            continue
        active_tasks += info.numActiveTasks
        completed += info.numCompletedTasks
        total += info.numTasks
    return {
        "active_jobs": len(st.getActiveJobsIds()),
        "active_tasks": active_tasks,
        "completed_tasks": completed,
        "total_tasks": total,
    }


class ProgressReporter:
    """Background sampler printing ``{pos}/{len}``-style lines while actions run.

    Usage::

        with ProgressReporter(spark, interval=5.0, prefix="orders-events"):
            frame.write.format("kafka").save()

    Prints at most one line per interval and only while tasks are
    actually running — silent for sub-interval actions. Driver-side
    polling only; zero executor overhead.
    """

    def __init__(self, spark: SparkSession, interval: float = 5.0,
                 prefix: str = "", out=sys.stderr):
        self.spark = spark
        self.interval = interval
        self.prefix = prefix
        self.out = out
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.samples: list[dict] = []  # retained for tests / post-hoc stats

    def _run(self) -> None:
        while not self._stop.wait(self.interval):
            snap = snapshot_progress(self.spark)
            if snap["total_tasks"]:
                self.samples.append(snap)
                print(
                    f" {self.prefix} {snap['completed_tasks']}/{snap['total_tasks']} "
                    f"tasks ({snap['active_jobs']} jobs active)",
                    file=self.out,
                )

    def __enter__(self) -> "ProgressReporter":
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=self.interval + 1)
