"""Multi-format timestamp parsing — SURVEY §2.8 X1.

Re-expresses ``/root/reference/src/utility.rs:6-30``: try
``%Y-%m-%d %H:%M:%S.%f``, then ``%Y-%m-%d %H:%M:%S``, then date-only
``%Y-%m-%d`` (midnight); anything else is a parse failure. Pure
expression — ``coalesce(try_to_timestamp …)`` stays inside whole-stage
codegen, no UDF, so it runs at scan speed on 100 TB of string columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hyperswitch_data_backfill_spark.catalog import load_table
from hyperswitch_data_backfill_spark.registry import register

FORMATS = ("yyyy-MM-dd HH:mm:ss.SSSSSS", "yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd")


# Nominal (4-digit-year) string length of each format: a row of that
# length can only match that format, so one gated attempt replaces the
# try-every-format cascade for the overwhelmingly common shapes.
_NOMINAL_LEN = {
    "yyyy-MM-dd HH:mm:ss.SSSSSS": 26,
    "yyyy-MM-dd HH:mm:ss": 19,
    "yyyy-MM-dd": 10,
}


def parse_datetime_multi(col: Column) -> Column:
    """The engine's multi-format parser: first matching format wins, NULL if none.

    NULL-on-failure (vs the reference's hard error, utility.rs:28) lets a
    100 TB job quarantine bad rows instead of dying on row 3 billion; pair
    with ``.filter(parsed.isNull())`` to collect rejects.

    Fast path (r16, guide §1.2 per-task work): a failed
    ``try_to_timestamp`` attempt costs a thrown-and-caught
    DateTimeParseException inside the JVM, so the original
    try-formats-in-order cascade paid up to ``len(FORMATS)-1`` exceptions
    per well-formed row. The string length picks the only format a
    4-digit-year row can match, so the common shapes parse in exactly one
    attempt. The full cascade stays as the coalesce tail, which keeps the
    result PROVABLY identical for every input: rows outside the nominal
    lengths (e.g. ``+12345-01-02 …`` signed wide years, which Spark's
    strict parser accepts) fall through to the original attempt order,
    and a nominal-length row that fails its gated format would also have
    failed it first in the cascade (the shorter formats cannot consume 26
    chars; the longer cannot match 10) — first-match-wins is unchanged.
    """
    length = F.length(col)
    gated = [
        F.when(length == _NOMINAL_LEN[fmt], F.try_to_timestamp(col, F.lit(fmt)))
        for fmt in FORMATS
    ]
    cascade = [F.try_to_timestamp(col, F.lit(fmt)) for fmt in FORMATS]
    return F.coalesce(*gated, *cascade).cast("timestamp_ntz")


@register(
    "parse_datetime_multi",
    oracle="""
    SELECT o_orderkey, raw_ts,
           COALESCE(
               try_strptime(raw_ts, '%Y-%m-%d %H:%M:%S.%f'),
               try_strptime(raw_ts, '%Y-%m-%d %H:%M:%S'),
               try_strptime(raw_ts, '%Y-%m-%d')
           ) AS parsed
    FROM (
        SELECT o_orderkey,
               CASE CAST(o_orderkey % 4 AS INTEGER)
                   WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%d %H:%M:%S.%f')
                   WHEN 1 THEN strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
                   WHEN 2 THEN strftime(o_orderdate, '%Y-%m-%d')
                   ELSE 'not-a-timestamp'
               END AS raw_ts
        FROM orders
    ) t
    """,
    doc="X1: the three accepted formats of utility.rs:8-27 plus a failing "
        "variant (parses to NULL); strings derived deterministically from "
        "o_orderdate so Spark and the oracle see identical inputs.",
)
def parse_datetime_multi_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    raw = (
        F.when(F.col("o_orderkey") % 4 == 0, F.date_format("o_orderdate", FORMATS[0]))
        .when(F.col("o_orderkey") % 4 == 1, F.date_format("o_orderdate", FORMATS[1]))
        .when(F.col("o_orderkey") % 4 == 2, F.date_format("o_orderdate", FORMATS[2]))
        .otherwise(F.lit("not-a-timestamp"))
    )
    return (
        orders.select("o_orderkey", raw.alias("raw_ts"))
        .withColumn("parsed", parse_datetime_multi(F.col("raw_ts")))
    )
