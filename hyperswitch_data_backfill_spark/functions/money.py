"""Money math — SURVEY §2.8 X5.

Hyperswitch amounts are i64 *minor units* [dep] (SURVEY §1.2); float
money is forbidden. The fixture's double prices are first converted to
exact minor units (round-half-even at 2 decimals like the source data),
then all arithmetic is integer/decimal; the major-unit view is a single
double division at the end (deterministic: one op on exact inputs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hyperswitch_data_backfill_spark.catalog import load_table
from hyperswitch_data_backfill_spark.registry import register


def to_minor_units(col: Column) -> Column:
    """double major units → exact i64 minor units (cents)."""
    return F.round(col * 100).cast("bigint")


def to_major_units(minor: Column) -> Column:
    """i64 minor units → double major units (exact inputs, one division)."""
    return minor.cast("double") / 100.0


@register(
    "math_money",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS amount_minor,
           CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS DOUBLE) / 100.0 AS amount_major,
           CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS net_minor
    FROM lineitem
    """,
    doc="X5: minor↔major unit conversion + discounted net amount, all exact "
        "until the final double division.",
)
def math_money(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    minor = to_minor_units(F.col("l_extendedprice"))
    net = to_minor_units(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        minor.alias("amount_minor"),
        to_major_units(minor).alias("amount_major"),
        net.alias("net_minor"),
    )


@register(
    "date_trunc_bucket",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="X6: date bucketing for analytics — to_date + grouped decimal-exact sum.",
)
def date_trunc_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
    )
