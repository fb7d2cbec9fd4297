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


FX_QUOTE_EVERY_DAYS = 5       # quotes are published sparsely (every 5th day)
FX_RATE_BASE = 1_000_000      # identity rate in micro-units
FX_RATE_SPREAD = 250_000
FX_N_CCY = 3


@register(
    "money_convert_asof",
    oracle=f"""
    WITH days AS (
        SELECT qday FROM (
            SELECT DISTINCT date_diff('day', DATE '1970-01-01',
                                      CAST(o_orderdate AS DATE)) AS qday
            FROM orders
        ) WHERE qday % {FX_QUOTE_EVERY_DAYS} = 0
    ), quotes AS (
        SELECT d.qday, c.ccy,
               CAST({FX_RATE_BASE}
                    + (d.qday * 7919 + c.ccy * 104729) % {FX_RATE_SPREAD}
                 AS BIGINT) AS rate_micro
        FROM days d CROSS JOIN (
            SELECT unnest(range({FX_N_CCY})) AS ccy
        ) c
    ), o AS (
        SELECT o_orderkey,
               CAST(o_custkey % {FX_N_CCY} AS BIGINT) AS ccy,
               date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    )
    SELECT o.o_orderkey, o.ccy, o.cents, q.rate_micro,
           CAST((o.cents * q.rate_micro) // {FX_RATE_BASE} AS BIGINT) AS usd_cents
    FROM o ASOF LEFT JOIN quotes q
      ON o.ccy = q.ccy AND q.qday <= o.day
    """,
    doc="X5b: currency normalization via as-of FX rates — THE payments-"
        "analytics operator the reference's downstream feeds on **[dep]** "
        "(every Hyperswitch amount is minor-units + currency; analytics "
        "reports in one settlement currency). Quotes are published "
        "sparsely (every 5th day, deterministic synthetic book), so each "
        "order needs the LATEST quote ≤ its date. Unlike join_asof's "
        "union+carry-forward (right when both sides are big), the quote "
        "book here is tiny and the key (currency) is 3-valued — a "
        "carry-forward window over the FACT table would put a third of "
        "all orders in ONE partition. Instead the as-of resolves once "
        "per (ccy, day) on the calendar×currency frame (a window over "
        "thousands of rows, never the fact), and the dense rate map is "
        "BROADCAST for an O(1) equi-join probe per order — zero "
        "shuffles on the fact side, embarrassingly parallel at 100 TB. "
        "Conversion itself is integer: cents × rate_micro div 1e6, "
        "bit-identical to the oracle's // division.",
)
def money_convert_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the registered key's oracle projects without the helper's `day`
    return fx_convert_orders(spark, load_table(spark, sf_dir, "orders")).drop("day")


def fx_convert_orders(spark: SparkSession, orders: DataFrame) -> DataFrame:
    """Core of money_convert_asof over any orders-shaped frame — split
    out so composed reports (pipeline_settlement_report) can reuse the
    broadcast conversion. Returns one row per order:
    (o_orderkey, ccy, day, cents, rate_micro, usd_cents).

    r16 reshape (guide §1.2 step 1 — fix the algorithm before the
    per-task code): the as-of resolution moved OFF the fact side.
    Through r15 every order ran ``element_at(filter(qs, …), -1)`` over
    its currency's whole sorted quote array — O(|book|) per row AND an
    allocated filtered copy of up to ~|book| structs per row (measured:
    the two money keys were the slowest batch operators in the engine,
    4.1 s / 8.4 s at sf0.1 against ~0.5 s for join_asof on the same
    fact table). The as-of is now resolved once per (ccy, day) on the
    calendar×currency frame — quote values inlined as a grid-gated
    when() and carried forward by a window over 3 currency partitions
    of calendar-bounded size — and the fact side equi-joins the
    resulting dense rate map by broadcast hash: O(1) probe per order,
    zero fact-side shuffles as before, one scan of orders for the
    distinct-days calendar (the orderdate column only). Same values by
    construction: for every order day d the carried-forward rate is the
    latest quote with qday <= d over the observed-and-on-grid days,
    exactly the filter+element_at(-1) answer (NULL before the first
    quote, because last(ignorenulls) has nothing to carry)."""
    from pyspark.sql.window import Window

    day = F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
    days_all = orders.select(day.alias("day")).distinct()
    ccys = spark.range(FX_N_CCY).select(F.col("id").alias("ccy"))
    w = (
        Window.partitionBy("ccy")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # A quote exists at (day, ccy) iff the day is on the publication
    # grid AND appears in the data (the book is derived from observed
    # order days) — and its value is a pure function of (day, ccy), so
    # the quote rows need no separate frame: the grid test inlines as a
    # when() over the calendar×currency rows, sparing a second full
    # scan of orders that a quotes-frame left join would re-plan.
    quote_micro = F.when(
        F.col("day") % FX_QUOTE_EVERY_DAYS == 0,
        (
            F.lit(FX_RATE_BASE)
            + F.pmod(F.col("day") * 7919 + F.col("ccy") * 104729, FX_RATE_SPREAD)
        ).cast("bigint"),
    )
    rate_map = (
        days_all.crossJoin(ccys)
        .select(
            "ccy", "day",
            F.last(quote_micro, ignorenulls=True).over(w).alias("rate_micro"),
        )
    )
    o = orders.select(
        "o_orderkey",
        (F.col("o_custkey") % FX_N_CCY).cast("bigint").alias("ccy"),
        day.alias("day"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    joined = o.join(F.broadcast(rate_map), ["ccy", "day"], "left")
    return joined.select(
        "o_orderkey",
        "ccy",
        "day",
        "cents",
        "rate_micro",
        F.expr(f"CAST((cents * rate_micro) div {FX_RATE_BASE} AS BIGINT)").alias(
            "usd_cents"
        ),
    )


@register(
    "pipeline_settlement_report",
    oracle=f"""
    WITH days AS (
        SELECT qday FROM (
            SELECT DISTINCT date_diff('day', DATE '1970-01-01',
                                      CAST(o_orderdate AS DATE)) AS qday
            FROM orders
        ) WHERE qday % {FX_QUOTE_EVERY_DAYS} = 0
    ), quotes AS (
        SELECT d.qday, c.ccy,
               CAST({FX_RATE_BASE}
                    + (d.qday * 7919 + c.ccy * 104729) % {FX_RATE_SPREAD}
                 AS BIGINT) AS rate_micro
        FROM days d CROSS JOIN (
            SELECT unnest(range({FX_N_CCY})) AS ccy
        ) c
    ), o AS (
        SELECT o_orderkey,
               CAST(o_custkey % {FX_N_CCY} AS BIGINT) AS ccy,
               date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ), conv AS (
        SELECT o.day, o.ccy, o.cents,
               CAST((o.cents * q.rate_micro) // {FX_RATE_BASE} AS BIGINT) AS usd_cents
        FROM o ASOF LEFT JOIN quotes q
          ON o.ccy = q.ccy AND q.qday <= o.day
    ), daily AS (
        SELECT day, ccy,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(cents) AS BIGINT) AS gross_cents,
               CAST(SUM(usd_cents) AS BIGINT) AS usd_cents
        FROM conv WHERE usd_cents IS NOT NULL
        GROUP BY day, ccy
    )
    SELECT day, ccy, n_orders, gross_cents, usd_cents,
           CAST(usd_cents - LAG(usd_cents) OVER (
               PARTITION BY ccy ORDER BY day
           ) AS BIGINT) AS dod_delta_cents
    FROM daily
    """,
    doc="Flagship payments composition — the daily settlement report "
        "the reference's downstream dashboards compute from its Kafka "
        "events **[dep]**: per (day, currency) order counts, gross "
        "native-minor-unit volume, USD-normalized volume via the as-of "
        "FX conversion (fx_convert_orders — broadcast quote book, zero "
        "fact-side shuffles), and day-over-day settlement delta (LAG "
        "per currency). One fact scan → broadcast conversion → one "
        "(day,ccy) shuffle; the delta window runs on the daily rollup "
        "(calendar-sized, 3 partitions of days — NOT the fact table). "
        "All integer arithmetic; pre-first-quote orders (NULL rate) "
        "are excluded like any unsettleable row.",
)
def pipeline_settlement_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    conv = fx_convert_orders(spark, load_table(spark, sf_dir, "orders"))
    daily = (
        conv.filter(F.col("usd_cents").isNotNull())
        .groupBy("day", "ccy")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").cast("bigint").alias("gross_cents"),
            F.sum("usd_cents").cast("bigint").alias("usd_cents"),
        )
    )
    w = Window.partitionBy("ccy").orderBy("day")
    return daily.withColumn(
        "dod_delta_cents",
        (F.col("usd_cents") - F.lag("usd_cents").over(w)).cast("bigint"),
    )
