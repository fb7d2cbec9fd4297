"""The spark.sql surface: every fixture table is queryable as a view
(catalog.register_views), and SQL text produces the same results AND
the same physical plan class as the DataFrame API — Catalyst treats
them as one language, so a SQL-first user of this engine loses nothing.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hyperswitch_data_backfill_spark.catalog import TABLES, load_table, register_views
from tests.conftest import SF_DIR


def test_all_tables_registered_and_queryable(spark):
    register_views(spark, SF_DIR)
    for t in TABLES:
        assert spark.sql(f"SELECT * FROM {t} LIMIT 1").count() in (0, 1)


def test_sql_equals_dataframe_api(spark):
    register_views(spark, SF_DIR)
    via_sql = spark.sql(
        """
        SELECT o.o_orderpriority AS prio, COUNT(*) AS n,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus = 'O'
        GROUP BY o.o_orderpriority
        """
    )
    orders = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    via_df = (
        orders.filter(F.col("o_orderstatus") == "O")
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(F.col("o_orderpriority").alias("prio"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("total"),
        )
    )
    assert {tuple(r) for r in via_sql.collect()} == {
        tuple(r) for r in via_df.collect()
    }
    # same physical strategy: both push the status filter and join
    sql_plan = via_sql._jdf.queryExecution().executedPlan().toString()
    df_plan = via_df._jdf.queryExecution().executedPlan().toString()
    for marker in ("HashAggregate", "Scan parquet"):
        assert marker in sql_plan and marker in df_plan
