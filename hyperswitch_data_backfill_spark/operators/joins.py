"""Joins — SURVEY §2.3 (J1-J3).

The reference's only join is executed by hand: each fact row is combined
with its merchant's (small) key store fetched once per merchant
(``main.rs:219-249`` feeding ``payment_intent.rs:94-101``). In Spark
that is a broadcast hash join — the dimension ships to every executor
once, the 100 TB fact side streams through map-side with NO shuffle.

J3 (header×child) is the classic big×big equi-join: shuffle-partitioned
sort-merge on the join key. At scale both sides hash-partition on
l_orderkey/o_orderkey; AQE handles skewed keys (skewJoin splits oversized
partitions). If the tables were bucketed on the key at write time the
shuffle disappears entirely — sources/parquet.py exposes bucketed writes
for exactly this.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hyperswitch_data_backfill_spark.catalog import load_table
from hyperswitch_data_backfill_spark.registry import register


@register(
    "join_broadcast",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice,
           c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    doc="J1: broadcast equi-join fact×dimension — the per-merchant key-store "
        "lookup (main.rs:219-249) as one map-side join; dimension broadcast, "
        "zero shuffle of the fact table.",
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "inner").select(
        "o_orderkey", "o_custkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@register(
    "join_semi",
    oracle="""
    SELECT * FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 1000.0)
    """,
    doc="J2: left-semi join (merchant allow-list, main.rs:49-50,191-206) — "
        "broadcast the small allow-list; fact side never shuffles.",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    allow = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 1000.0)
    return orders.join(
        F.broadcast(allow), orders.o_custkey == allow.c_custkey, "left_semi"
    )


@register(
    "join_smj",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus,
           l.l_linenumber, l.l_quantity, l.l_extendedprice
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    """,
    doc="J3: header×child equi-join (payment_intent×payment_attempt on "
        "payment_id — present in the data model, payment_intent.rs:6 / "
        "payment_attempt.rs:3, though the tool never joins them). Big×big → "
        "shuffle sort-merge; AQE skew-split at scale.",
)
def join_smj(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return orders.join(li, orders.o_orderkey == li.l_orderkey, "inner").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        "l_linenumber", "l_quantity", "l_extendedprice",
    )


@register(
    "join_left",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    """,
    doc="J3b: left outer dimension×fact — customers with no orders survive "
        "with NULL order columns.",
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                                AND TIMESTAMP '1995-06-30 23:59:59'
    )
    """,
    doc="J3c: left-anti join — merchants with no activity in a window "
        "(every fixture customer has *some* order, so the unwindowed anti "
        "set is empty; the windowed variant keeps the check non-trivial). "
        "The filter sits on the right side *before* the anti join, so it "
        "prunes the build input.",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1995-01-01 00:00:00").cast("timestamp_ntz"),
            F.lit("1995-06-30 23:59:59").cast("timestamp_ntz"),
        )
    )
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")
