"""X1 unit + property tests mirroring the reference's parser cases
(/root/reference/src/utility.rs:8-28): subsecond, second, date-only →
midnight, and hard failure (→ NULL in our engine, documented deviation)."""

from __future__ import annotations

from datetime import datetime

import pytest
from hypothesis import given, settings, strategies as st

from hyperswitch_data_backfill_spark.functions.datetime_parse import parse_datetime_multi


def _parse(spark, strings: list[str]):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(s,) for s in strings], "raw string")
    return [r["parsed"] for r in df.select(parse_datetime_multi(F.col("raw")).alias("parsed")).collect()]


def test_reference_cases(spark):
    got = _parse(
        spark,
        ["2024-06-26 02:06:05.123456", "2024-06-26 02:06:05", "2024-06-26"],
    )
    assert got == [
        datetime(2024, 6, 26, 2, 6, 5, 123456),
        datetime(2024, 6, 26, 2, 6, 5),
        datetime(2024, 6, 26, 0, 0, 0),
    ]


def test_invalid_yields_null(spark):
    got = _parse(spark, ["not-a-timestamp", "2024-13-45", "", "2024/06/26"])
    assert got == [None, None, None, None]


@settings(max_examples=20, deadline=None)
@given(
    st.datetimes(
        min_value=datetime(1900, 1, 1), max_value=datetime(2099, 12, 31)
    ).map(lambda d: d.replace(microsecond=0))
)
def test_roundtrip_seconds_format(spark, dt):
    s = dt.strftime("%Y-%m-%d %H:%M:%S")
    assert _parse(spark, [s]) == [dt]


@settings(max_examples=10, deadline=None)
@given(st.datetimes(min_value=datetime(1900, 1, 1), max_value=datetime(2099, 12, 31)))
def test_roundtrip_micros_format(spark, dt):
    s = dt.strftime("%Y-%m-%d %H:%M:%S.%f")
    assert _parse(spark, [s]) == [dt]
