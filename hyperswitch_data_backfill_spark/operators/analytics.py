"""Behavioral & statistical analytics — event-log and measure-matrix ops.

Product-analytics queries every event pipeline grows (activity islands,
conversion funnel, cohort retention) plus exact distributed statistics
(co-moments from decimal sums) and measure unpivoting. All integer/
decimal arithmetic until the final projection so the DuckDB oracles are
value-exact; timestamps ride as epoch-microsecond BIGINTs (the engine's
micros canon, see catalog.py).

Scale notes per query are in the docstrings; the shared shape is one
shuffle keyed on the entity (user_id / group key) and map-side-combined
aggregates — no windows over unpartitioned data, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hyperswitch_data_backfill_spark.catalog import load_table
from hyperswitch_data_backfill_spark.operators.windows import SESSION_GAP_MIN
from hyperswitch_data_backfill_spark.registry import register

_EPOCH = "1970-01-01"


def _day(ts_col: str = "ts"):
    """Epoch-day integer from the engine-canonical timestamp_ntz."""
    return F.datediff(F.to_date(F.col(ts_col)), F.lit(_EPOCH).cast("date"))


@register(
    "win_gap_islands",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
        FROM events
    ), r AS (
        SELECT user_id, d,
               d - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS grp
        FROM days
    )
    SELECT user_id,
           CAST(MIN(d) AS BIGINT) AS island_start_day,
           CAST(MAX(d) AS BIGINT) AS island_end_day,
           CAST(COUNT(*) AS BIGINT) AS n_days
    FROM r GROUP BY user_id, grp
    """,
    doc="Gaps-and-islands: maximal runs of consecutive active days per "
        "user via the classic day-minus-row_number grouping key. Two "
        "staged shuffles, both over the map-side-deduped (user, day) "
        "pairs (bounded by users × days, a tiny fraction of raw events): "
        "(user_id, d) for distinct, then user_id for the window; the "
        "final island aggregate reuses the window's partitioning with no "
        "third Exchange (verified in the plan).",
)
def win_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", _day().alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    return (
        days.withColumn("grp", F.col("d") - F.row_number().over(w))
        .groupBy("user_id", "grp")
        .agg(
            F.min("d").cast("bigint").alias("island_start_day"),
            F.max("d").cast("bigint").alias("island_end_day"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .drop("grp")
    )


FUNNEL_STEPS = ("signup", "click", "purchase")


@register(
    "funnel_steps",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_type, epoch_us(ts) AS us FROM events
    ), s1 AS (
        SELECT user_id, MIN(us) AS t1 FROM e
        WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id
    ), s2 AS (
        SELECT e.user_id, MIN(us) AS t2 FROM e JOIN s1 USING (user_id)
        WHERE event_type = '{FUNNEL_STEPS[1]}' AND us >= t1 GROUP BY e.user_id
    ), s3 AS (
        SELECT e.user_id, MIN(us) AS t3 FROM e JOIN s2 USING (user_id)
        WHERE event_type = '{FUNNEL_STEPS[2]}' AND us >= t2 GROUP BY e.user_id
    )
    SELECT s1.user_id, t1 AS t1_us, t2 AS t2_us, t3 AS t3_us,
           CAST(1 + CASE WHEN t2 IS NULL THEN 0 ELSE 1 END
                  + CASE WHEN t3 IS NULL THEN 0 ELSE 1 END AS BIGINT) AS stage
    FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
    """,
    doc="Ordered conversion funnel (signup → click → purchase): per user, "
        "the earliest step-k event at-or-after the step-(k-1) time — "
        "strictly ordered, so a purchase before signup does not convert. "
        "Three per-user min-aggregates chained by equi-joins on user_id: "
        "every stage shuffles on the same key, so the plan is one "
        "partitioning reused end-to-end; state per user is one timestamp "
        "per step. Timestamps emitted as epoch-micros BIGINT (micros "
        "canon).",
)
def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id", "event_type", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )
    s1 = (
        e.where(F.col("event_type") == FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("us").alias("t1_us"))
    )
    s2 = (
        e.where(F.col("event_type") == FUNNEL_STEPS[1])
        .join(s1, "user_id")
        .where(F.col("us") >= F.col("t1_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t2_us"))
    )
    s3 = (
        e.where(F.col("event_type") == FUNNEL_STEPS[2])
        .join(s2, "user_id")
        .where(F.col("us") >= F.col("t2_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t3_us"))
    )
    stage = (
        F.lit(1)
        + F.col("t2_us").isNotNull().cast("int")
        + F.col("t3_us").isNotNull().cast("int")
    ).cast("bigint")
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select("user_id", "t1_us", "t2_us", "t3_us", stage.alias("stage"))
    )


@register(
    "retention_cohort",
    oracle="""
    WITH uw AS (
        SELECT DISTINCT user_id,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS w
        FROM events
    ), cohort AS (
        SELECT user_id, MIN(w) AS cohort_week FROM uw GROUP BY user_id
    )
    SELECT CAST(cohort_week AS BIGINT) AS cohort_week,
           CAST(w - cohort_week AS BIGINT) AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM uw JOIN cohort USING (user_id)
    GROUP BY cohort_week, week_offset
    """,
    doc="Cohort retention matrix: users bucketed by first-active epoch-"
        "week, counted per week offset. Epoch-aligned integer weeks "
        "(day // 7) on both engines — no date_trunc('week') start-of-week "
        "convention to diverge on. Distinct (user, week) pairs + per-user "
        "min + re-join all shuffle on user_id, then one small final agg; "
        "uw rows are bounded by users × weeks, a tiny fraction of raw "
        "events.",
)
def retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    uw = ev.select("user_id", (_day() / 7).cast("bigint").alias("w")).distinct()
    cohort = uw.groupBy("user_id").agg(F.min("w").alias("cohort_week"))
    return (
        uw.join(cohort, "user_id")
        .groupBy("cohort_week", (F.col("w") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "agg_corr_moments",
    oracle="""
    WITH sc AS (
        -- ×100 scaled integers: exact for 2-decimal money doubles;
        -- HUGEINT sums never overflow (Spark twin: decimal(38,0))
        SELECT l_returnflag,
               CAST(round(l_quantity * 100) AS HUGEINT) AS xi,
               CAST(round(l_extendedprice * 100) AS HUGEINT) AS yi
        FROM lineitem
    ), m AS (
        SELECT l_returnflag, COUNT(*) AS n,
               CAST(SUM(xi) AS DOUBLE) / 100.0 AS sx,
               CAST(SUM(yi) AS DOUBLE) / 100.0 AS sy,
               CAST(SUM(xi * yi) AS DOUBLE) / 10000.0 AS sxy,
               CAST(SUM(xi * xi) AS DOUBLE) / 10000.0 AS sxx,
               CAST(SUM(yi * yi) AS DOUBLE) / 10000.0 AS syy
        FROM sc GROUP BY l_returnflag
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
                 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)), 6) AS covar_samp,
           ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
                 / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                        * (CAST(n AS DOUBLE) * syy - sy * sy)), 6) AS corr_qty_price,
           ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
                 / (CAST(n AS DOUBLE) * sxx - sx * sx), 6) AS regr_slope,
           ROUND(sy / CAST(n AS DOUBLE)
                 - (CAST(n AS DOUBLE) * sxy - sx * sy)
                   / (CAST(n AS DOUBLE) * sxx - sx * sx)
                   * sx / CAST(n AS DOUBLE), 6) AS regr_intercept
    FROM m
    """,
    doc="Exact distributed statistics: per-group covariance, Pearson "
        "correlation, and OLS slope/intercept computed from DECIMAL "
        "co-moment sums (n, Σx, Σy, Σxy, Σx², Σy²) — the mergeable-"
        "moments pattern. Unlike engine-native corr()/covar_samp() "
        "(Welford merge order ⇒ float drift between engines), decimal "
        "sums are exact and associative, so one map-side-combined shuffle "
        "yields bit-identical results on any partitioning — the property "
        "that makes the answer stable on 10 executors or 1000. Final "
        "double arithmetic is the same expression on both engines.",
)
def agg_corr_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_quantity") * 100).cast("decimal(19,0)")
    y = F.round(F.col("l_extendedprice") * 100).cast("decimal(19,0)")
    m = li.select("l_returnflag", x.alias("xi"), y.alias("yi")).groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xi").alias("sxi"),
        F.sum("yi").alias("syi"),
        F.sum(F.col("xi") * F.col("yi")).alias("sxyi"),
        F.sum(F.col("xi") * F.col("xi")).alias("sxxi"),
        F.sum(F.col("yi") * F.col("yi")).alias("syyi"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sxi").cast("double") / 100.0
    sy = F.col("syi").cast("double") / 100.0
    sxy = F.col("sxyi").cast("double") / 10000.0
    sxx = F.col("sxxi").cast("double") / 10000.0
    syy = F.col("syyi").cast("double") / 10000.0
    cov_num = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    slope = cov_num / var_x
    return m.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n"),
        F.round(cov_num / (n * (n - F.lit(1.0))), 6).alias("covar_samp"),
        F.round(cov_num / F.sqrt(var_x * var_y), 6).alias("corr_qty_price"),
        F.round(slope, 6).alias("regr_slope"),
        F.round(sy / n - slope * sx / n, 6).alias("regr_intercept"),
    )


_UNPIVOT_MEASURES = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@register(
    "agg_unpivot",
    oracle=" UNION ALL ".join(
        f"""
        SELECT l_returnflag, '{c}' AS measure,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST({c} AS DECIMAL(18,4))) AS DOUBLE) AS total,
               ROUND(CAST(SUM(CAST({c} AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6) AS avg_val
        FROM lineitem GROUP BY l_returnflag
        """
        for c in _UNPIVOT_MEASURES
    ),
    doc="Wide→long unpivot (melt) of the lineitem measure columns, then "
        "per-(group, measure) decimal-exact totals. Spark's unpivot is a "
        "zero-shuffle Expand node (each input row emits one row per "
        "measure map-side), feeding a single map-side-combined aggregate "
        "— the declarative replacement for per-measure query loops. "
        "Oracle is the equivalent UNION ALL of per-measure aggregates.",
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=["l_returnflag"],
        values=list(_UNPIVOT_MEASURES),
        variableColumnName="measure",
        valueColumnName="val",
    )
    dec = F.col("val").cast("decimal(18,4)")
    return (
        long.groupBy("l_returnflag", "measure")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec).cast("double").alias("total"),
            F.round(F.sum(dec).cast("double") / F.count(F.lit(1)), 6).alias("avg_val"),
        )
    )


_PROFILE_COLS = (
    "o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority",
)


@register(
    "profile_columns",
    oracle="\n    UNION ALL\n".join(
        f"""
    SELECT '{c}' AS col_name,
           COUNT(*) AS n_rows,
           COUNT({c}) AS n_nonnull,
           COUNT(DISTINCT {c}) AS n_distinct,
           CAST(MIN({c}) AS VARCHAR) AS min_val,
           CAST(MAX({c}) AS VARCHAR) AS max_val
    FROM orders
    """
        for c in _PROFILE_COLS
    ),
    doc="Data-profiling: per-column completeness/cardinality/range over "
        "orders — one column-pruned groupBy(value) profile per column, "
        "unioned into the long profile table. r16 reshape (guide §2.2): "
        "the previous single-aggregate form with six count_distincts "
        "planned as an Expand (×7 row duplication) into SortAggregates "
        "keyed on the six-column composite — every expanded row sorted "
        "twice on all columns (measured 3.8-4.2 s at sf0.1). Per-column "
        "groupBy(c).count() feeds a tiny second-level aggregate "
        "(n_rows = Σcnt, n_nonnull = Σcnt over non-null, n_distinct = "
        "non-null group count, min/max over the group keys) — all "
        "codegen HashAggregates with map-side partials, 0.9 s at sf0.1 "
        "with identical output. At 100 TB each pass scans ONE parquet "
        "column (≈ one full-table read across all six, vs ×7 row "
        "expansion), and the exact distinct stays shuffle-bounded by "
        "per-column cardinality; swap groupBy for "
        "approx_count_distinct when exactness isn't required.",
)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    parts = []
    for c in _PROFILE_COLS:
        g = orders.groupBy(c).agg(F.count(F.lit(1)).alias("_cnt"))
        one = g.agg(
            # coalesce to 0 so an EMPTY table profiles as n_rows=0 like
            # the single-aggregate COUNT(*) form did (r16 ADVICE): a
            # sum over zero groups is NULL, a count never is
            F.coalesce(F.sum("_cnt"), F.lit(0)).alias("n_rows"),
            F.coalesce(
                F.sum(F.when(F.col(c).isNotNull(), F.col("_cnt"))), F.lit(0)
            ).alias("n_nonnull"),
            F.count(F.col(c)).alias("n_distinct"),
            F.min(c).cast("string").alias("min_val"),
            F.max(c).cast("string").alias("max_val"),
        ).select(
            F.lit(c).alias("col_name"),
            "n_rows", "n_nonnull", "n_distinct", "min_val", "max_val",
        )
        parts.append(one)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# strictly consecutive funnel: view immediately followed by click then
# purchase — the discriminating MATCH_RECOGNIZE shape (the gaps-allowed
# variant is funnel_steps; at fixture scale this one splits users ~1:2)
_FUNNEL_RE = "(^|>)view>click>purchase(>|$)"


@register(
    "seq_pattern_funnel",
    oracle=f"""
    WITH s AS (
        SELECT user_id,
               string_agg(event_type, '>' ORDER BY epoch_us(ts), event_id) AS seq,
               COUNT(*) AS n_events
        FROM events GROUP BY user_id
    )
    SELECT user_id, n_events, seq,
           regexp_matches(seq, '{_FUNNEL_RE}') AS hit
    FROM s
    """,
    doc="L10f: sequence-pattern detection (MATCH_RECOGNIZE shape without "
        "the MATCH_RECOGNIZE dependency) — each user's event history is "
        "collapsed to one ordered type-string (micros-exact order, "
        "event_id tiebreak — same determinism trick as win_session) and "
        "a view→…→click→…→purchase funnel regex runs over it in codegen. "
        "One shuffle on user_id; the regex is a common Java/RE2 subset "
        "so both engines agree. The 100 TB posture: per-user sequences "
        "are bounded (sessions, not lifetimes) — for unbounded histories "
        "compose with win_session to scope sequences per session first.",
)
def seq_pattern_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    seq = (
        ev.select(
            "user_id",
            F.struct(F.col("ts"), F.col("event_id"), F.col("event_type")).alias("s"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("s")), lambda x: x["event_type"]
                ),
                ">",
            ).alias("seq"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    return seq.select(
        "user_id",
        "n_events",
        "seq",
        F.col("seq").rlike(_FUNNEL_RE).alias("hit"),
    )


@register(
    "seq_pattern_funnel_sessioned",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
    ), o AS (
        SELECT user_id, us, event_id, event_type,
               CASE WHEN LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL
                    OR us - LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
                       > {SESSION_GAP_MIN * 60 * 1_000_000}
               THEN 1 ELSE 0 END AS is_new
        FROM e
    ), s AS (
        SELECT *, CAST(SUM(is_new) OVER (
            PARTITION BY user_id ORDER BY us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS BIGINT) AS session_id
        FROM o
    ), g AS (
        SELECT user_id, session_id,
               string_agg(event_type, '>' ORDER BY us, event_id) AS seq,
               COUNT(*) AS n_events
        FROM s GROUP BY user_id, session_id
    )
    SELECT user_id, session_id, n_events, seq,
           regexp_matches(seq, '{_FUNNEL_RE}') AS hit
    FROM g
    """,
    doc="L10f session-scoped variant: sessionize first (win_session's "
        "240-min gap rule, same lag + running-flag-sum plan), THEN build "
        "the ordered type-string per (user, session) — the per-group "
        "buffered sequence is bounded by session length, never by a "
        "user's 100 TB lifetime history. This is the composition the "
        "lifetime variant's docstring prescribes, made executable. ONE "
        "keyed exchange total: the (user_id, session_id) agg's clustered "
        "distribution is satisfied by the window's hashpartitioning("
        "user_id) — same-key rows are already co-located — so Catalyst "
        "plans no second shuffle (pinned by test_plan_shape).",
)
def seq_pattern_funnel_sessioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessioned_funnel(load_table(spark, sf_dir, "events"))


def sessioned_funnel(ev: DataFrame) -> DataFrame:
    """Core of seq_pattern_funnel_sessioned over any events-shaped frame
    (user_id, event_id, event_type, ts) — split out so pytest can prove
    the bounded-group property on a synthetic whale user."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.lag(us).over(w)
    is_new = F.when(prev_us.isNull() | ((us - prev_us) > gap_us), 1).otherwise(0)
    sess = ev.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    seq = (
        sess.select(
            "user_id",
            "session_id",
            F.struct(F.col("ts"), F.col("event_id"), F.col("event_type")).alias("s"),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("s")), lambda x: x["event_type"]
                ),
                ">",
            ).alias("seq"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    return seq.select(
        "user_id",
        "session_id",
        "n_events",
        "seq",
        F.col("seq").rlike(_FUNNEL_RE).alias("hit"),
    )


@register(
    "win_time_weighted_avg",
    oracle="""
    WITH seq AS (
        SELECT user_id,
               CAST(ROUND(value * 100) AS BIGINT) AS v_cents,
               epoch_us(ts) AS us,
               LEAD(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ) AS next_us
        FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(next_us - us) AS BIGINT) AS held_us,
           CAST(SUM(v_cents * (next_us - us)) // SUM(next_us - us)
                AS BIGINT) AS twa_cents
    FROM seq WHERE next_us IS NOT NULL
    GROUP BY user_id
    HAVING SUM(next_us - us) > 0
    """,
    doc="Time-weighted average (TimescaleDB time_weight / last-"
        "observation-carried-forward integral): each event's value "
        "holds until the user's next event; twa = Σ(value·Δt)/Σ(Δt). "
        "All arithmetic integer (value cents × microsecond holds; the "
        "per-user sum is bounded by max_cents × corpus_time_span_us "
        "≈ 1.6e18 < 2^63 at ANY row count, since spans don't grow "
        "with data volume — a longer-horizon deployment promotes the "
        "sum to decimal(38,0), same plan) and the final division is "
        "integral `div` — bit-identical across engines (DuckDB's "
        "HUGEINT sum `//` matches Spark's bigint div on positive "
        "operands). Plan: one user_id shuffle for the LEAD window, then "
        "the aggregate REUSES that partitioning (no second Exchange — "
        "same keyed-window-then-agg shape as win_gap_islands). The "
        "canonical irregular-time-series → per-entity summary op for "
        "metering/billing pipelines.",
)
def win_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return time_weighted_avg(load_table(spark, sf_dir, "events"))


def time_weighted_avg(ev: DataFrame) -> DataFrame:
    """Core of win_time_weighted_avg over any events-shaped frame —
    split out so the scale rehearsal can drive it on inflated input."""
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy(us.asc(), F.col("event_id").asc())
    seq = ev.select(
        "user_id",
        F.round(F.col("value") * 100).cast("bigint").alias("v_cents"),
        us.alias("us"),
        F.lead(us).over(w).alias("next_us"),
    ).filter(F.col("next_us").isNotNull())
    dt = F.col("next_us") - F.col("us")
    return (
        seq.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dt).cast("bigint").alias("held_us"),
            F.expr("CAST(SUM(v_cents * (next_us - us)) div SUM(next_us - us) AS BIGINT)").alias(
                "twa_cents"
            ),
        )
        .filter(F.col("held_us") > 0)
    )


ATTR_WINDOW_US = 7 * 24 * 3600 * 1_000_000  # 7-day lookback

# shared by attr_last_touch AND its streaming replay key — one oracle,
# two execution engines (batch window vs applyInPandasWithState)
_ATTR_ORACLE = f"""
    WITH seq AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
               LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_id END
                          IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS touch_event_id,
               LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END
                          IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS touch_type,
               LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN epoch_us(ts) END
                          IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS touch_us
        FROM events
    )
    SELECT user_id, event_id AS purchase_event_id,
           CASE WHEN us - touch_us <= {ATTR_WINDOW_US}
                THEN touch_event_id END AS touch_event_id,
           CASE WHEN us - touch_us <= {ATTR_WINDOW_US}
                THEN touch_type ELSE 'direct' END AS touch_type,
           CASE WHEN us - touch_us <= {ATTR_WINDOW_US}
                THEN CAST(us - touch_us AS BIGINT) END AS lag_us
    FROM seq WHERE event_type = 'purchase'
    """


@register(
    "attr_last_touch",
    oracle=_ATTR_ORACLE,
    doc="Last-touch attribution: each purchase is credited to the most "
        "recent preceding non-purchase event by the same user within a "
        "7-day lookback, else 'direct' — the standard marketing-"
        "attribution join. Implemented as ONE pass: last(·, ignorenulls) "
        "over a running frame carries the latest touch alongside every "
        "event (the as-of-join-within-one-table shape join_asof also "
        "uses), so there is exactly one user_id shuffle and no self-"
        "join — at 100 TB the naive events⋈events formulation would "
        "shuffle the table twice and explode on whale users; this "
        "carries O(1) state per row instead.",
)
def attr_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return last_touch_attribution(load_table(spark, sf_dir, "events"))


@register(
    "stream_attribution_replay",
    oracle=_ATTR_ORACLE,
    doc="A REAL Structured Streaming execution, driver-hash-verified: "
        "the events fixture replays through streaming/pipeline.py's "
        "attribute_stream (applyInPandasWithState, one state row per "
        "user) via a file-source stream + availableNow trigger + memory "
        "sink, and the appended result must hash-match the SAME oracle "
        "as the batch attr_last_touch window formulation. This upgrades "
        "the batch≡stream parity pytest to driver evidence for the "
        "stateful-streaming engine itself (not a foreachBatch replay — "
        "the state machine runs inside a live StreamingQuery). "
        "load_stream_table guarantees the stream sees the same "
        "canonical column types as the batch path.",
)
def stream_attribution_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from hyperswitch_data_backfill_spark.catalog import load_stream_table
    from hyperswitch_data_backfill_spark.streaming.pipeline import (
        attribute_stream,
        write_memory_sink,
    )

    name = f"attr_replay_{uuid.uuid4().hex[:8]}"
    stream = load_stream_table(spark, sf_dir, "events")
    q = write_memory_sink(attribute_stream(stream), name, complete=False)
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("stream_attribution_replay did not finish in 300s")
    return spark.table(name)


def last_touch_attribution(ev: DataFrame) -> DataFrame:
    """Core of attr_last_touch over any events-shaped frame — split out
    so the scale rehearsal can drive it on inflated input."""
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us.asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    not_purchase = F.col("event_type") != "purchase"
    seq = ev.select(
        "user_id",
        "event_id",
        "event_type",
        us.alias("us"),
        F.last(F.when(not_purchase, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("touch_event_id"),
        F.last(F.when(not_purchase, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
        F.last(F.when(not_purchase, us), ignorenulls=True).over(w).alias("touch_us"),
    )
    in_window = (F.col("us") - F.col("touch_us")) <= ATTR_WINDOW_US
    return seq.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_event_id"),
        F.when(in_window, F.col("touch_event_id")).alias("touch_event_id"),
        F.when(in_window, F.col("touch_type")).otherwise(F.lit("direct")).alias("touch_type"),
        F.when(in_window, (F.col("us") - F.col("touch_us")).cast("bigint")).alias("lag_us"),
    )


@register(
    "ts_gapfill",
    oracle="""
    WITH actual AS (
        SELECT event_type,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events GROUP BY 1, 2
    ), bounds AS (
        SELECT MIN(day) AS lo, MAX(day) AS hi FROM actual
    ), calendar AS (
        SELECT t.event_type, d.day
        FROM (SELECT DISTINCT event_type FROM actual) t
        CROSS JOIN (
            SELECT unnest(generate_series(
                (SELECT lo FROM bounds), (SELECT hi FROM bounds))) AS day
        ) d
    )
    SELECT c.event_type, CAST(c.day AS BIGINT) AS day,
           a.cents AS actual_cents,
           CAST(LAST_VALUE(a.cents IGNORE NULLS) OVER (
               PARTITION BY c.event_type ORDER BY c.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS filled_cents,
           a.cents IS NULL AS is_gap
    FROM calendar c
    LEFT JOIN actual a ON a.event_type = c.event_type AND a.day = c.day
    """,
    doc="Time-series gap filling with last-observation-carried-forward "
        "(TimescaleDB time_bucket_gapfill + locf): densify each "
        "series onto the full daily calendar, then carry the last "
        "known value across the gaps — the densification every "
        "dashboard and forecasting pipeline needs before resampling. "
        "The calendar is GENERATED (sequence over the 1-row global "
        "bounds broadcast), never materialized from data, so the "
        "row count is series × days — calendar-sized, independent of "
        "event volume; the one data-sized shuffle is the daily "
        "pre-aggregate (map-side combined). LOCF is last(·, "
        "ignorenulls) over the per-series ordering — the join_asof "
        "carry-forward shape on a dense axis. Integer cents "
        "throughout; days before a series' first observation stay "
        "NULL (no back-fill — honest about unknown history).",
)
def ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    actual = ev.groupBy(
        "event_type", _day().alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).cast("bigint").alias("cents"))
    bounds = actual.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    types = actual.select("event_type").distinct()
    calendar = (
        types.crossJoin(F.broadcast(bounds))
        .select("event_type", F.explode(F.sequence("lo", "hi")).alias("day"))
    )
    joined = calendar.join(
        actual.withColumnRenamed("cents", "actual_cents"), ["event_type", "day"], "left"
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_type",
        F.col("day").cast("bigint").alias("day"),
        "actual_cents",
        F.last("actual_cents", ignorenulls=True).over(w).cast("bigint").alias("filled_cents"),
        F.col("actual_cents").isNull().alias("is_gap"),
    )
