"""Structured Streaming twin: file-source bounded replay of the events
table through the watermarked tumbling window must equal the batch
``win_tumbling``-style aggregation on the same data."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from hyperswitch_data_backfill_spark.catalog import load_table
from hyperswitch_data_backfill_spark.streaming.pipeline import (
    read_parquet_stream,
    stream_to_kafka_records,
    tumbling_event_counts,
    write_memory_sink,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def event_stream_dir(spark):
    """Materialize the (nanos-fixed) events table as a streamable dir."""
    d = tempfile.mkdtemp(prefix="evstream-")
    load_table(spark, SF_DIR, "events").repartition(4).write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_streaming_tumbling_equals_batch(spark, event_stream_dir):
    batch_events = spark.read.parquet(event_stream_dir)
    expected = {
        (r["bucket_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in (
            batch_events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
            )
            .select(F.col("w.start").alias("bucket_start"), "event_type", "n", "total_value")
            .collect()
        )
    }

    stream = read_parquet_stream(spark, event_stream_dir, batch_events.schema, max_files_per_trigger=2)
    assert stream.isStreaming
    agg = tumbling_event_counts(stream)
    q = write_memory_sink(agg, "tumbling_test", complete=True)
    q.awaitTermination(120)
    got = {
        (r["bucket_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.sql("SELECT * FROM tumbling_test").collect()
    }
    assert got == expected


def test_stream_event_projection_shape(spark, event_stream_dir):
    batch_events = spark.read.parquet(event_stream_dir)
    stream = read_parquet_stream(spark, event_stream_dir, batch_events.schema)
    records = stream_to_kafka_records(stream, ["user_id", "event_id"], "events-topic")
    assert records.isStreaming
    assert records.columns == ["key", "value", "topic"]
    q = write_memory_sink(records, "stream_records", complete=False)
    q.awaitTermination(120)
    n = spark.sql("SELECT count(*) AS n FROM stream_records").first()["n"]
    assert n == batch_events.count()
