"""Structured Streaming variant — SURVEY §2.10 / §7 phase 6 (post-parity).

The reference is a bounded batch job (Kafka is sink-only, producer built
``main.rs:146-153`` and never consumed). The idiomatic "continuous
backfill" is the same pipeline shape compiled to a stream:

    readStream (CDC/Kafka/file source) → withWatermark → window agg /
    event projection → writeStream (Kafka sink)

This module compiles the exact transformations the batch engine uses
(same event projection as sinks/kafka.py, same tumbling window as
``win_tumbling``) onto streaming DataFrames, so batch and streaming
share one semantic definition. Tested with a file source over fixture
parquet + availableNow trigger (bounded replay of a stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_parquet_stream(
    spark: SparkSession, path: str, schema: StructType, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-based stream source (stands in for CDC/Kafka in tests)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(path)
    )


def tumbling_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    watermark: str = "2 hours",
    window_size: str = "1 hour",
) -> DataFrame:
    """Streaming twin of the batch ``win_tumbling`` query.

    Watermark bounds state: buckets older than (max event time −
    watermark) are finalized and evicted, so state is O(active windows),
    not O(stream length) — the property that lets this run forever on a
    100 TB/day stream.
    """
    # Watermarks require TIMESTAMP (not NTZ); under the engine's pinned
    # UTC session timezone the ntz↔ltz casts are identity, and we cast
    # the bucket back to ntz so batch and streaming schemas agree.
    return (
        events.withColumn("_evt", F.col(ts_col).cast("timestamp"))
        .withWatermark("_evt", watermark)
        .groupBy(F.window("_evt", window_size).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("bucket_start"),
            "event_type", "n", "total_value",
        )
    )


def stream_to_kafka_records(
    events: DataFrame, key_cols: list[str], topic: str, tenant_id: str = "default"
) -> DataFrame:
    """Event projection for writeStream.format('kafka') — same shape as batch S4."""
    from hyperswitch_data_backfill_spark.sinks.kafka import event_frame

    return event_frame(events, key_cols, topic, tenant_id)


def write_memory_sink(df: DataFrame, name: str, complete: bool = True):
    """Test harness sink: availableNow → in-memory table (bounded replay)."""
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if complete else "append")
        .trigger(availableNow=True)
        .start()
    )
