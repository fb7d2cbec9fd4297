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


def test_cdc_apply_on_bucketed_snapshot_shuffles_changelog_only(spark):
    """lakehouse.cdc_apply_changes docstring claim: 'bucketed snapshot
    storage makes the join Exchange-free on the big side'. With the
    customer snapshot WRITTEN bucketed on the merge key, the full-outer
    merge plan must contain exactly ONE hash Exchange — the collapsed
    changelog side — and the snapshot scan must engage its buckets."""
    import shutil
    import tempfile

    from hyperswitch_data_backfill_spark.operators.lakehouse import (
        apply_latest_changes,
        collapse_changelog,
        orders_changelog,
    )

    d = tempfile.mkdtemp(prefix="buckets-cdc-")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        load_table(spark, SF_DIR, "customer").write.bucketBy(
            N_BUCKETS, "c_custkey"
        ).sortBy("c_custkey").option("path", f"{d}/b_customer").mode(
            "overwrite"
        ).saveAsTable("b_customer")
        latest = collapse_changelog(
            orders_changelog(load_table(spark, SF_DIR, "orders"))
        )
        merged = apply_latest_changes(spark.table("b_customer"), latest)
        plan = merged._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert "Bucketed: true" in plan, plan
        # and the bucketed merge must produce the registered result
        from hyperswitch_data_backfill_spark.registry import REGISTRY, queries

        queries()
        expected = {
            tuple(r) for r in REGISTRY["cdc_apply_changes"].fn(spark, SF_DIR).collect()
        }
        assert {tuple(r) for r in merged.collect()} == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_customer")
        shutil.rmtree(d, ignore_errors=True)
