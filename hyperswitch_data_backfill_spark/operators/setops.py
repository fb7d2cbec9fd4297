"""Set operations — SURVEY §2.6.

Not present in the reference (the four entity pipelines are
independent), but its config proves the need: a consolidated events
topic exists (``development.toml:672``) that merges every entity stream
— that merge is ``unionByName``. Union is shuffle-free (plan-level
concat of children); intersect/except compile to aggregates/joins on
all columns (one shuffle each).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hyperswitch_data_backfill_spark.catalog import load_table
from hyperswitch_data_backfill_spark.registry import register


def _open_orders(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select("o_custkey")
    )


def _finished_orders(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_custkey")
    )


@register(
    "set_union",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    UNION ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="unionByName (bag union) — the consolidated-topic merge of per-entity "
        "event streams (development.toml:672). No shuffle: children are "
        "concatenated in the plan.",
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _open_orders(spark, sf_dir).unionByName(_finished_orders(spark, sf_dir))


@register(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="set intersect (distinct): merchants having both open and finished "
        "orders — compiles to a left-semi join over distinct rows.",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _open_orders(spark, sf_dir).intersect(_finished_orders(spark, sf_dir))


@register(
    "set_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="bag difference (exceptAll ↔ EXCEPT ALL) — multiplicity-aware, unlike "
        "plain EXCEPT; needed when event streams carry legitimate duplicates.",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _open_orders(spark, sf_dir).exceptAll(_finished_orders(spark, sf_dir))


@register(
    "set_intersect_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="bag intersect (intersectAll ↔ INTERSECT ALL) — keeps "
        "min(multiplicity) copies per value, completing the multiset "
        "algebra next to exceptAll; one shuffle on the value, counts "
        "reduced map-side.",
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _open_orders(spark, sf_dir).intersectAll(_finished_orders(spark, sf_dir))
