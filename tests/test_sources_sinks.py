"""JDBC source builder, Kafka sink projection, pipeline spec compilation."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from hyperswitch_data_backfill_spark.catalog import load_table
from hyperswitch_data_backfill_spark.plans.spec import BackfillSpec, EntitySpec, compile_entity
from hyperswitch_data_backfill_spark.sinks.kafka import KafkaSinkConfig, event_frame
from hyperswitch_data_backfill_spark.sources.jdbc import (
    JdbcSourceConfig,
    merchant_predicates,
)
from tests.conftest import SF_DIR


def test_merchant_predicates_single():
    preds = merchant_predicates("merchant_id", ["m1", "m2"])
    assert preds == ["merchant_id IN ('m1')", "merchant_id IN ('m2')"]


def test_merchant_predicates_grouped_with_window():
    preds = merchant_predicates(
        "merchant_id", [1, 2, 3], time_col="created_at",
        start="2024-01-01", end="2024-02-01", group_size=2,
    )
    assert preds == [
        "merchant_id IN (1, 2) AND created_at BETWEEN '2024-01-01' AND '2024-02-01'",
        "merchant_id IN (3) AND created_at BETWEEN '2024-01-01' AND '2024-02-01'",
    ]


def test_merchant_predicates_escapes_quotes():
    preds = merchant_predicates("m", ["o'brien"])
    assert preds == ["m IN ('o''brien')"]


def test_jdbc_config_defaults():
    cfg = JdbcSourceConfig(url="jdbc:postgresql://h/db", table="payment_intent")
    assert cfg.fetchsize == 10_000  # ≙ reference --batch_size default (main.rs:43-44)


def test_event_frame_shape_and_key(spark):
    orders = load_table(spark, SF_DIR, "orders").limit(5)
    out = event_frame(orders, ["o_custkey", "o_orderkey"], "t1", tenant_id="tenantA")
    rows = out.collect()
    assert out.columns == ["key", "value", "topic"]
    for r in rows:
        ck, ok = r["key"].split(":")
        payload = json.loads(r["value"])
        assert payload["o_custkey"] == int(ck) and payload["o_orderkey"] == int(ok)
        assert payload["tenant_id"] == "tenantA"
        assert r["topic"] == "t1"


def test_kafka_sink_config_mirrors_reference_topics():
    cfg = KafkaSinkConfig(
        bootstrap_servers="localhost:9092",
        topics={
            "payment_intent": "hyperswitch-payment-intent-events",
            "payment_attempt": "hyperswitch-payment-attempt-events",
            "refund": "hyperswitch-refund-events",
            "dispute": "hyperswitch-dispute-events",
        },
        consolidated_topic="hyperswitch-consolidated-events",
    )
    assert len(cfg.topics) == 4


def test_compile_entity_full_pipeline(spark):
    orders = load_table(spark, SF_DIR, "orders")
    cust = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", F.col("c_name").alias("merchant_name")
    )
    spec = EntitySpec(
        table="orders", merchant_col="o_custkey", time_col="o_orderdate",
        key_cols=("o_custkey", "o_orderkey"), topic="orders-events",
        remap={"o_orderkey": "payment_id", "merchant_name": "merchant_name"},
    )
    job = BackfillSpec(
        entities=(spec,), start="1995-01-01 00:00:00", end="1996-12-31 23:59:59",
        merchant_ids=(7, 13), tenant_id="tenantX",
    )
    out = compile_entity(orders, spec, job, key_dim=cust, key_dim_col="c_custkey")
    rows = out.collect()
    assert rows, "windowed + allow-listed pipeline yielded no rows"
    for r in rows:
        payload = json.loads(r["value"])
        assert set(payload) == {"payment_id", "merchant_name", "tenant_id"}
        assert payload["tenant_id"] == "tenantX"
        assert int(r["key"].split(":")[0]) in (7, 13)


def test_compile_entity_open_bounds(spark):
    orders = load_table(spark, SF_DIR, "orders")
    spec = EntitySpec(
        table="orders", merchant_col="o_custkey", time_col="o_orderdate",
        key_cols=("o_orderkey",), topic="t",
    )
    job = BackfillSpec(entities=(spec,))  # default-open window (F5)
    assert compile_entity(orders, spec, job).count() == orders.count()
