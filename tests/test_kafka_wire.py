"""Executed proof for the S4 wire leg (sinks/kafka_wire.py): the codec,
the executor-side foreachPartition producer, the broker double's CRC
verification, the transient-error retry path, and the exhausted-retries
failure path — the tests the module docstring promises (r8 verdict
item 3; reference produce loop: main.rs:146-153).
"""

from __future__ import annotations

import zlib

import pytest
from pyspark.sql import functions as F

from hyperswitch_data_backfill_spark.sinks.kafka_wire import (
    WireBroker,
    encode_message_v0,
    encode_produce_request_v0,
    kafka_wire_roundtrip,
    parse_produce_request_v0,
    produce_rows,
    write_kafka_wire,
)
from tests.conftest import SF_DIR, assert_oracle_match


# ------------------------------------------------------------------ codec

def test_codec_roundtrip_preserves_records_and_crc():
    batches = {
        "t-a": [(b"k1", b"v1"), (None, b"only-value"), (b"only-key", None)],
        "t-b": [(b"k2", "émoji ✓".encode("utf-8"))],
    }
    frame = encode_produce_request_v0(7, batches, acks=1, timeout_ms=1234)
    # strip the int32 size prefix the broker's framing layer consumes
    req = parse_produce_request_v0(frame[4:])
    assert req.correlation_id == 7
    assert req.acks == 1 and req.timeout_ms == 1234
    assert req.records == {t: {0: msgs} for t, msgs in batches.items()}


def test_corrupted_byte_fails_crc_check():
    frame = bytearray(encode_produce_request_v0(1, {"t": [(b"k", b"v")]}))
    frame[-1] ^= 0xFF  # flip a bit inside the value payload
    with pytest.raises(ValueError, match="CRC"):
        parse_produce_request_v0(bytes(frame[4:]))


def test_message_v0_crc_is_crc32_of_body():
    msg = encode_message_v0(b"k", b"v")
    crc = int.from_bytes(msg[:4], "big")
    assert crc == zlib.crc32(msg[4:]) & 0xFFFFFFFF
    assert msg[4] == 0  # magic 0


# --------------------------------------------- Spark foreachPartition leg

def test_write_kafka_wire_multipartition_exact_multiset(spark):
    """Parallel executor tasks (4 input partitions) each open a real TCP
    connection; the broker-decoded multiset equals the input exactly."""
    df = (
        spark.range(0, 200)
        .select(
            F.concat(F.lit("key-"), F.col("id")).alias("key"),
            F.concat(F.lit("value-"), F.col("id")).alias("value"),
            F.when(F.col("id") % 2 == 0, F.lit("topic-even"))
            .otherwise(F.lit("topic-odd"))
            .alias("topic"),
        )
        .repartition(4)
    )
    with WireBroker() as broker:
        write_kafka_wire(df, "127.0.0.1", broker.port, batch_size=32)
        got = {
            topic: sorted(broker.records(topic))
            for topic in broker.topics()
        }
        connections = broker.connections
    assert sorted(got) == ["topic-even", "topic-odd"]
    for parity, topic in ((0, "topic-even"), (1, "topic-odd")):
        expected = sorted(
            (f"key-{i}".encode(), f"value-{i}".encode())
            for i in range(parity, 200, 2)
        )
        assert got[topic] == expected
    # one connection per non-empty task; 200 rows over 4 round-robin
    # partitions → all 4 produced
    assert connections == 4


# ------------------------------------------------------------- retry path

def _rows(n=10, topic="retry-topic"):
    return [
        {"key": f"k{i}", "value": f"v{i}", "topic": topic} for i in range(n)
    ]


def test_transient_error_retries_to_exactly_one_copy():
    """fail_requests=1: the first Produce gets error_code 2 + drop; the
    reconnect-retry succeeds and the log holds exactly ONE copy."""
    with WireBroker(fail_requests=1) as broker:
        sent = produce_rows(
            iter(_rows()), "127.0.0.1", broker.port, max_retries=2
        )
        records = broker.records("retry-topic")
        connections = broker.connections
    assert sent == 10
    assert records == [(f"k{i}".encode(), f"v{i}".encode()) for i in range(10)]
    assert connections == 2  # failed-and-dropped + successful retry


def test_exhausted_retries_raise():
    """More injected failures than retry budget → produce_rows raises
    (Spark would then retry the task: at-least-once, never silent loss)."""
    with WireBroker(fail_requests=10) as broker:
        with pytest.raises(IOError, match="failed after 3 attempts"):
            produce_rows(iter(_rows()), "127.0.0.1", broker.port, max_retries=2)
        assert broker.records("retry-topic") == []


# ------------------------------------------------------ fixture key oracle

def test_kafka_wire_roundtrip_matches_oracle(spark, duck):
    """The driver-hashed fixture: wire-produced bytes, decoded off the
    broker log, must byte-match the DuckDB JSON oracle."""
    from hyperswitch_data_backfill_spark.registry import REGISTRY, _load_all_operator_modules

    _load_all_operator_modules()
    q = REGISTRY["kafka_wire_roundtrip"]
    df = kafka_wire_roundtrip(spark, SF_DIR)
    assert df.count() > 0
    assert_oracle_match(df, duck, q.oracle, name="kafka_wire_roundtrip")
