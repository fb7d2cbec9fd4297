"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``hyperswitch_data_backfill_spark``
package; this module is the thin registry adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship pipeline on /root/testdata/sf0.001: the reference's
    payment-intent dump transposed to fixtures (SURVEY §7 phase 0) —
    scan orders, window + merchant filters, broadcast key-store join,
    remap, Kafka event projection (key/value/topic)."""
    from pyspark.sql import functions as F

    from hyperswitch_data_backfill_spark.catalog import load_table
    from hyperswitch_data_backfill_spark.plans.spec import BackfillSpec, EntitySpec, compile_entity

    sf_dir = "/root/testdata/sf0.001"
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_name").alias("merchant_name")
    )
    spec = EntitySpec(
        table="orders",
        merchant_col="o_custkey",
        time_col="o_orderdate",
        key_cols=("o_custkey", "o_orderkey"),
        topic="orders-events",
        remap={
            "o_orderkey": "payment_id",
            "o_custkey": "merchant_id",
            "o_orderstatus": "status",
            "o_totalprice": "amount",
            "merchant_name": "merchant_name",
        },
    )
    job = BackfillSpec(entities=(spec,), start="1995-01-01 00:00:00", end="1998-12-31 23:59:59")
    return compile_entity(orders, spec, job, key_dim=customer, key_dim_col="c_custkey")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from hyperswitch_data_backfill_spark import registry

    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every SQL-expressible query in ``queries()``."""
    from hyperswitch_data_backfill_spark import registry

    return registry.oracle_sql()
