"""Progress/telemetry parity (lib.rs:9-13, main.rs:171-186): job-group
labeling for the Spark UI and driver-side statusTracker polling."""

from __future__ import annotations

import io

from hyperswitch_data_backfill_spark.telemetry import (
    ProgressReporter,
    job_group,
    snapshot_progress,
)


def test_job_group_labels_and_clears(spark):
    sc = spark.sparkContext
    with job_group(spark, "entity-orders", "backfill orders-events"):
        assert sc.getLocalProperty("spark.jobGroup.id") == "entity-orders"
        assert sc.getLocalProperty("spark.job.description") == "backfill orders-events"
        spark.range(10).count()
    assert sc.getLocalProperty("spark.jobGroup.id") in ("", None)


def test_snapshot_progress_shape(spark):
    snap = snapshot_progress(spark)
    assert set(snap) == {"active_jobs", "active_tasks", "completed_tasks", "total_tasks"}
    assert all(isinstance(v, int) for v in snap.values())


def test_progress_reporter_samples_long_action(spark):
    import pyspark.sql.functions as F

    buf = io.StringIO()
    # an action long enough to straddle a few sampling intervals
    with ProgressReporter(spark, interval=0.2, prefix="test-job", out=buf) as rep:
        (
            spark.range(0, 2_000_000, 1, 16)
            .select(F.sha2(F.col("id").cast("string"), 256).alias("h"))
            .groupBy(F.substring("h", 1, 2))
            .count()
            .count()
        )
    # at least one sample observed live tasks, and the line format held
    assert rep.samples, "reporter never sampled a running stage"
    line = buf.getvalue().splitlines()[0]
    assert "test-job" in line and "/" in line and "tasks" in line
