"""Aggregations — SURVEY §2.4 (A1-A4).

The reference runs COUNT(*) once per merchant in a driver loop
(``main.rs:190-313`` × ``payment_intent.rs:36-43``) — N round-trips. One
``groupBy("merchant_id").count()`` replaces all of them with a single
shuffle whose map side pre-aggregates (partial_count), so bytes shuffled
are O(groups), not O(rows). That map-side combine is what makes these
viable at 100 TB.

Float determinism: SUM/AVG over doubles is order-dependent, and Spark
and DuckDB reduce in different orders. Every money/quantity aggregate
here is computed over ``DECIMAL(18,4)`` casts — exact, associative,
engine-neutral — then cast back to double for a stable comparison
schema. This mirrors the reference's [dep] stance of i64 minor-unit
amounts (never float money, SURVEY §1.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hyperswitch_data_backfill_spark.catalog import load_table
from hyperswitch_data_backfill_spark.registry import register


def _dec(col: str):
    return F.col(col).cast("decimal(18,4)")


@register(
    "agg_group_count",
    oracle="SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey",
    doc="A2: per-merchant counts — one shuffle replaces the reference's "
        "per-merchant COUNT loop (main.rs:190-313).",
)
def agg_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "agg_stats",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           COUNT(*) AS cnt
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="A3: grouped sum/avg/min/max (TPC-H Q1 shape) — downstream-analytics "
        "parity for the ClickHouse dashboards the Kafka events feed [dep]. "
        "Decimal-exact sums; avg derived as sum/count in double.",
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sum_qty = F.sum(_dec("l_quantity")).cast("double")
    sum_price = F.sum(_dec("l_extendedprice")).cast("double")
    cnt = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        sum_qty.alias("sum_qty"),
        sum_price.alias("sum_price"),
        (sum_qty / cnt).alias("avg_qty"),
        (sum_price / cnt).alias("avg_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        cnt.alias("cnt"),
    )


@register(
    "agg_distinct",
    oracle="""
    SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_merchants
    FROM orders GROUP BY o_orderstatus
    """,
    doc="A3b: exact distinct count per group — expands to a two-phase "
        "aggregate (partial distinct then merge); for 100 TB cardinality "
        "estimation prefer agg_approx_distinct (HLL, constant memory).",
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count_distinct("o_custkey").alias("n_merchants"))
    )


@register(
    "agg_approx_distinct",
    oracle=None,  # approximate by construction → rows-only check
    doc="A3c: HyperLogLog++ distinct estimate (rsd=0.01). The 100 TB default: "
        "constant memory per group vs the unbounded hash set of exact distinct.",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.approx_count_distinct("o_custkey", rsd=0.01).alias("n_merchants_approx"))
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT o_orderstatus, CAST(year(o_orderdate) AS INTEGER) AS o_year, COUNT(*) AS n
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, CAST(year(o_orderdate) AS INTEGER))
    """,
    doc="A4: rollup over the tenant→merchant→day-style hierarchy "
        "(status→year here): grand total + per-status + per-(status,year) in "
        "one pass; Spark expands grouping sets before the shuffle so it is "
        "still a single map-side-combined aggregation.",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.withColumn("o_year", F.year("o_orderdate").cast("int"))
        .rollup("o_orderstatus", "o_year")
        .agg(F.count(F.lit(1)).alias("n"))
    )
