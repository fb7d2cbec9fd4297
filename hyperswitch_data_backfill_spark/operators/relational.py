"""Scans, filters, projections, validation — SURVEY §2.1-2.2 (S1-S3, F1-F6).

Reference shape being re-expressed (``payment_intent.rs:62-68`` and the
three sibling pipelines): full-row scans with an equality predicate on
the partition key (``merchant_id = :m``), an inclusive time window
(``created_at BETWEEN :s AND :e``), ordered by primary key, paginated.
Fixture role mapping (FIXTURES.md §B): orders≙payment_intent with
o_custkey≙merchant_id, o_orderdate≙created_at, o_orderkey≙payment_id.

Scale design: every filter here is a Catalyst-pushable predicate — at
100 TB these reach the parquet row-group / JDBC WHERE clause, so a scan
touches only matching partitions. No collect, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hyperswitch_data_backfill_spark.catalog import load_table
from hyperswitch_data_backfill_spark.registry import register

# Canonical predicate constants shared by Spark and oracle sides.
MERCHANT_KEY = 7
WINDOW_START = "1995-01-01 00:00:00"
WINDOW_END = "1997-12-31 23:59:59"


@register(
    "scan_orders",
    oracle="SELECT * FROM orders",
    doc="S1: full-row table scan (reference: SELECT * via Diesel typed load, payment_intent.rs:62-68).",
)
def scan_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders")


@register(
    "scan_customer_page",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment, rn
    FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY c_custkey) AS rn FROM customer
    ) t WHERE rn BETWEEN 51 AND 100
    """,
    doc="S2: paged dimension scan (merchant key stores, main.rs:208-216) — "
        "keyset-stable row_number pagination instead of LIMIT/OFFSET, using "
        "the distributed global-numbering helper (ordering.py).",
)
def scan_customer_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hyperswitch_data_backfill_spark.operators.ordering import (
        with_global_row_number,
    )

    cust = load_table(spark, sf_dir, "customer")
    return (
        with_global_row_number(cust, ["c_custkey"])
        .filter(F.col("rn").between(51, 100))
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment", "rn")
    )


@register(
    "count_filtered",
    oracle=f"""
    SELECT COUNT(*) AS n FROM orders
    WHERE o_custkey = {MERCHANT_KEY}
      AND o_orderdate BETWEEN TIMESTAMP '{WINDOW_START}' AND TIMESTAMP '{WINDOW_END}'
    """,
    doc="S3/A1: COUNT(*) with merchant+window predicates "
        "(payment_intent.rs:36-43 — the batching pre-count).",
)
def count_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_custkey") == MERCHANT_KEY)
        .filter(F.col("o_orderdate").between(F.lit(WINDOW_START).cast("timestamp_ntz"),
                                             F.lit(WINDOW_END).cast("timestamp_ntz")))
        .groupBy()
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "filter_eq",
    oracle=f"SELECT * FROM orders WHERE o_custkey = {MERCHANT_KEY}",
    doc="F1: equality predicate on the partition key (merchant_id = :m, payment_intent.rs:38).",
)
def filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") == MERCHANT_KEY)


@register(
    "filter_between",
    oracle=f"""
    SELECT * FROM orders
    WHERE o_orderdate BETWEEN TIMESTAMP '{WINDOW_START}' AND TIMESTAMP '{WINDOW_END}'
    """,
    doc="F2: inclusive time-range predicate (created_at BETWEEN, payment_intent.rs:39).",
)
def filter_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit(WINDOW_START).cast("timestamp_ntz"),
            F.lit(WINDOW_END).cast("timestamp_ntz"),
        )
    )


@register(
    "filter_conj",
    oracle=f"""
    SELECT * FROM orders
    WHERE o_custkey = {MERCHANT_KEY}
      AND o_orderdate BETWEEN TIMESTAMP '{WINDOW_START}' AND TIMESTAMP '{WINDOW_END}'
      AND o_orderstatus <> 'X'
    """,
    doc="F3: conjunction of predicates (chained .filter = AND, payment_intent.rs:38-39).",
)
def filter_conj(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") == MERCHANT_KEY)
        .filter(
            F.col("o_orderdate").between(
                F.lit(WINDOW_START).cast("timestamp_ntz"),
                F.lit(WINDOW_END).cast("timestamp_ntz"),
            )
        )
        .filter(F.col("o_orderstatus") != "X")
    )


@register(
    "project_subset",
    oracle="SELECT o_orderkey, o_orderdate, o_totalprice FROM orders",
    doc="F4: explicit column pruning — the reference always SELECT *s; Catalyst "
        "prunes the parquet/JDBC read schema to exactly these columns.",
)
def project_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_totalprice")


@register(
    "validate_ids",
    oracle=r"""
    SELECT o_orderkey, o_custkey,
           CAST(o_orderkey AS VARCHAR) AS id_str
    FROM orders
    WHERE regexp_matches(CAST(o_orderkey AS VARCHAR), '^[0-9]{1,18}$')
      AND o_custkey > 0
    """,
    doc="F6: ID validation predicate (MerchantId::wrap failure, main.rs:198-203) — "
        "as a filter, so malformed ids are quarantined rather than aborting the job.",
)
def validate_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    id_str = F.col("o_orderkey").cast("string")
    return (
        orders.withColumn("id_str", id_str)
        .filter(id_str.rlike(r"^[0-9]{1,18}$") & (F.col("o_custkey") > 0))
        .select("o_orderkey", "o_custkey", "id_str")
    )


@register(
    "remap_columns",
    oracle="""
    SELECT l_orderkey AS payment_id,
           l_linenumber AS attempt_id,
           l_extendedprice AS amount,
           l_returnflag AS status,
           l_shipdate AS created_at
    FROM lineitem
    """,
    doc="U2: pure column remap, storage→domain with no crypto "
        "(DataModelExt::from_storage_model, payment_attempt.rs:69) — a select "
        "expression map, never a UDF.",
)
def remap_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("payment_id"),
        F.col("l_linenumber").alias("attempt_id"),
        F.col("l_extendedprice").alias("amount"),
        F.col("l_returnflag").alias("status"),
        F.col("l_shipdate").alias("created_at"),
    )


@register(
    "exists_subquery",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    """,
    doc="correlated EXISTS subquery — Catalyst decorrelates it to a left "
        "semi join on the correlation key (verified in test_plan_shape), "
        "so the 'per-customer probe' the SQL describes executes as ONE "
        "keyed join, not N subquery evaluations. The declarative twin of "
        "J2's allow-list semi join.",
)
def exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_ex_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_ex_orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM _ex_customer c
        WHERE EXISTS (
            SELECT 1 FROM _ex_orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
        )
        """
    )


@register(
    "scalar_subquery_avg",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > (
        SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
        FROM orders o2 WHERE o2.o_custkey = o.o_custkey
    )
    """,
    doc="correlated SCALAR subquery — orders above their own merchant's "
        "average. Catalyst decorrelates to one grouped aggregate joined "
        "back on the correlation key, so the per-row probe the SQL "
        "describes runs as ONE shuffle + join, not N subqueries. The "
        "threshold is exact-decimal sum / count in double, so both "
        "engines compare bit-identical values (a float AVG would diverge "
        "at the last ulp between reduction orders).",
)
def scalar_subquery_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_sq_orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM _sq_orders o
        WHERE o_totalprice > (
            SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
            FROM _sq_orders o2 WHERE o2.o_custkey = o.o_custkey
        )
        """
    )
