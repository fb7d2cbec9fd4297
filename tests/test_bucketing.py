"""Bucketing: the storage-layout half of the 100 TB join strategy.

A fact×fact join normally shuffles both sides on the key. If both
tables are WRITTEN bucketed (and the bucket counts match), the shuffle
disappears entirely — each task reads bucket i of both sides and joins
in place. This is the co-location strategy ARCHITECTURE.md prescribes
for the orders×lineitem-shaped joins; this test pins that the engine's
session actually produces the Exchange-free plan.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from hyperswitch_data_backfill_spark.catalog import load_table
from tests.conftest import SF_DIR

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    d = tempfile.mkdtemp(prefix="buckets-")
    orders = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    (
        orders.write.bucketBy(N_BUCKETS, "o_orderkey").sortBy("o_orderkey")
        .option("path", f"{d}/b_orders").mode("overwrite").saveAsTable("b_orders")
    )
    (
        li.write.bucketBy(N_BUCKETS, "l_orderkey").sortBy("l_orderkey")
        .option("path", f"{d}/b_lineitem").mode("overwrite").saveAsTable("b_lineitem")
    )
    yield orders, li
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    shutil.rmtree(d, ignore_errors=True)


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables):
    orders, li = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("b_orders").join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        # co-located result must equal the plain (shuffled) join
        assert j.count() == orders.join(li, orders.o_orderkey == li.l_orderkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_scan_engages_in_join(spark, bucketed_tables):
    """Bucketed reads engage only when a downstream operator uses the
    bucketing (Spark disables them otherwise); the join plan's scans
    must report it."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("b_orders").join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
