"""Kafka event sink — SURVEY §2.1 S4, §2.8 X3.

The reference produces one JSON message per row to a per-entity topic,
tenant-tagged (``log_payment_intent`` etc., ``payment_intent.rs:102-105``;
topics ``development.toml:660-673``). Spark-first re-expression: the
whole produce loop is ONE expression —

    df.select(key, to_json(struct(...)) AS value, topic)
      .write.format("kafka")

Executors produce in parallel straight to the brokers; there is no
driver loop and no per-row client call from Python.

Delivery semantics: Spark's Kafka batch sink is at-least-once — same
envelope as the reference (a rerun re-publishes; downstream ClickHouse
dedups via ReplacingMergeTree [dep]). We emit deterministic keys
``merchant_id:entity_id`` so downstream dedup/compaction is possible
(SURVEY §4.2.1).

Tenancy: the TenantID the reference stamps per event (``main.rs:129,135``)
becomes a literal/metadata column; multi-tenant fan-out is a `topic`
column computed per row — one job writes every tenant's topic.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hyperswitch_data_backfill_spark.catalog import load_table
from hyperswitch_data_backfill_spark.registry import register


@dataclass(frozen=True)
class KafkaSinkConfig:
    """Mirror of the reference's [events.kafka] block (development.toml:657-673)."""

    bootstrap_servers: str
    topics: dict[str, str] = field(default_factory=dict)  # entity → topic
    consolidated_topic: str | None = None
    tenant_id: str = "default"
    extra_options: dict[str, str] = field(default_factory=dict)


def event_frame(
    df: DataFrame,
    key_cols: list[str],
    topic: str,
    tenant_id: str = "default",
    payload_cols: list[Column] | None = None,
) -> DataFrame:
    """Project any DataFrame into the Kafka record shape (key/value/topic).

    value = to_json(struct(payload..., tenant_id)); key = ':'-joined key
    columns (deterministic, so downstream consumers can dedup replays).
    """
    payload = payload_cols if payload_cols is not None else [F.col(c) for c in df.columns]
    return df.select(
        F.concat_ws(":", *[F.col(c).cast("string") for c in key_cols]).alias("key"),
        F.to_json(F.struct(*payload, F.lit(tenant_id).alias("tenant_id"))).alias("value"),
        F.lit(topic).alias("topic"),
    )


def write_kafka(records: DataFrame, cfg: KafkaSinkConfig) -> None:
    """Batch-produce a key/value/topic DataFrame to Kafka (S4).

    Requires the spark-sql-kafka package on the cluster; not exercised in
    the fixture harness (no broker) — payload shape is oracle-checked via
    ``kafka_payload_shape`` instead.
    """
    writer = (
        records.write.format("kafka")
        .option("kafka.bootstrap.servers", cfg.bootstrap_servers)
    )
    for k, v in cfg.extra_options.items():
        writer = writer.option(k, v)
    writer.save()


def write_kafka_stream(
    records: DataFrame,
    cfg: KafkaSinkConfig,
    checkpoint_dir: str,
    batch_sink=None,
):
    """Streaming produce of a key/value/topic frame (S4, streaming leg).

    Default path: ``writeStream.format("kafka")`` — executors produce
    each micro-batch straight to the brokers, exactly-once *per batch id*
    on retry (at-least-once overall, the reference's envelope).

    ``batch_sink(batch_df, batch_id)`` reroutes every micro-batch through
    ``foreachBatch`` instead — the dead-letter/test seam: the identical
    records frame executes as a real sink action with no broker or
    connector jar present. The production and test paths share every
    plan node up to the sink.
    """
    if batch_sink is not None:
        return (
            records.writeStream.foreachBatch(batch_sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
    writer = (
        records.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", cfg.bootstrap_servers)
        .option("checkpointLocation", checkpoint_dir)
    )
    for k, v in cfg.extra_options.items():
        writer = writer.option(k, v)
    return writer.trigger(availableNow=True).start()


def _intent_payload_frame(
    spark: SparkSession, sf_dir: str, where: str | None = None
) -> DataFrame:
    """orders ≙ payment_intent: the flagship event projection.

    Timestamps are pre-formatted and money is emitted as integer minor
    units so the JSON bytes are engine-neutral (engines disagree on
    double/decimal trailing-zero formatting; integers and strings they
    agree on). Minor-unit amounts are also the Hyperswitch convention
    [dep] (SURVEY §1.2). ``where`` (a SQL predicate string) lets callers
    carve a deterministic subset — used by ``kafka_wire_roundtrip`` to
    bound what goes through the loopback socket.
    """
    orders = load_table(spark, sf_dir, "orders")
    if where is not None:
        orders = orders.where(where)
    payload = [
        F.col("o_orderkey"),
        F.col("o_custkey"),
        F.col("o_orderstatus"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("amount_minor"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("created_at"),
    ]
    return event_frame(
        orders, ["o_custkey", "o_orderkey"], "orders-events", "default", payload
    )


@register(
    "kafka_payload_shape",
    oracle="""
    SELECT CAST(o_custkey AS VARCHAR) || ':' || CAST(o_orderkey AS VARCHAR) AS key,
           to_json(struct_pack(
               o_orderkey := o_orderkey,
               o_custkey := o_custkey,
               o_orderstatus := o_orderstatus,
               amount_minor := CAST(ROUND(o_totalprice * 100) AS BIGINT),
               created_at := strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'),
               tenant_id := 'default'
           )) AS value,
           'orders-events' AS topic
    FROM orders
    """,
    doc="S4/X3: the exact Kafka record projection (key, JSON value, topic) — "
        "byte-compared against the oracle's JSON serialization.",
)
def kafka_payload_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _intent_payload_frame(spark, sf_dir)


@register(
    "json_serialize",
    oracle="""
    SELECT o_orderkey,
           to_json(struct_pack(
               id := o_orderkey,
               status := o_orderstatus,
               priority := o_orderpriority
           )) AS event_json
    FROM orders
    """,
    doc="X3: plain to_json(struct(...)) of typed columns.",
)
def json_serialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.to_json(
            F.struct(
                F.col("o_orderkey").alias("id"),
                F.col("o_orderstatus").alias("status"),
                F.col("o_orderpriority").alias("priority"),
            )
        ).alias("event_json"),
    )
