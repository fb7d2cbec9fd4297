"""Snapshot compaction / merge — the backfill-core change-data operators.

The reference is a *replay* tool: it re-reads historical entity rows and
re-publishes them to Kafka (``main.rs:190-313``), relying on downstream
ClickHouse ReplacingMergeTree to collapse duplicates by latest version
[dep].  That collapse — and the snapshot maintenance around it — is a
first-class batch operator here, in three standard shapes:

- ``compact_latest``   — latest-row-per-key compaction (what the
  downstream ReplacingMergeTree does at merge time, expressed as one
  keyed window).  Run after any at-least-once replay to restore
  point-in-time semantics.
- ``merge_upsert``     — snapshot ⊕ changeset merge (the MERGE / upsert
  half of an incremental backfill): delta rows win by key, untouched
  base rows carry over.
- ``scd2_intervals``   — change-history construction: each version row
  becomes a validity interval ``[valid_from, valid_to)`` closed by the
  next version's timestamp (SCD-2), the point-in-time join feed for
  ``join_asof``.

Scale notes (100 TB): all three are single-shuffle plans keyed on the
entity key.  ``compact_latest`` is a window degenerating to a per-key
top-1 — map-side partial via AQE is not possible for row_number, but the
shuffle carries only the surviving columns; at extreme scale swap to
``max_by`` aggregates (one partial-aggregating shuffle).  The upsert's
anti-join shuffles base and delta on the same key — with both sides
bucketed by key on storage it is Exchange-free; a small delta broadcasts.
Timestamps compare at microseconds on both engine and oracle sides
(events.ts is parquet TIMESTAMP(NANOS); see catalog.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hyperswitch_data_backfill_spark.catalog import load_table
from hyperswitch_data_backfill_spark.registry import register

_MERGE_CUTOFF = "1997-06-01"
_MERGE_COLS = ("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")


@register(
    "compact_latest",
    oracle="""
    SELECT user_id, event_id, ts_us, event_type, value
    FROM (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_us(ts) DESC, event_id DESC
               ) AS rn
        FROM events
    ) t WHERE rn = 1
    """,
    doc="latest-row-per-key compaction: the batch twin of ClickHouse "
        "ReplacingMergeTree's merge-time collapse that the reference's "
        "at-least-once replay depends on [dep]. One shuffle on the key; "
        "deterministic tiebreak (event_id) for equal timestamps; "
        "micros-exact ordering on both sides.",
)
def compact_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts_us").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts_us", "event_type", "value")
    )


@register(
    "merge_upsert",
    oracle=f"""
    WITH base AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, 'base' AS src
        FROM orders WHERE o_orderstatus = 'F'
    ), delta AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, 'delta' AS src
        FROM orders WHERE o_orderdate >= TIMESTAMP '{_MERGE_CUTOFF}'
    )
    SELECT * FROM delta
    UNION ALL
    SELECT * FROM base
    WHERE o_orderkey NOT IN (SELECT o_orderkey FROM delta)
    """,
    doc="snapshot-merge upsert (MERGE WHEN MATCHED → delta wins, ELSE keep "
        "base): delta ∪ (base ⟕anti delta) — the incremental-backfill "
        "write path without a table format. Both legs shuffle on the same "
        "key, so bucketed-by-key storage makes the anti-join Exchange-free "
        "and a small changeset broadcasts.",
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    base = (
        orders.filter(F.col("o_orderstatus") == "F")
        .select(*_MERGE_COLS)
        .withColumn("src", F.lit("base"))
    )
    delta = (
        orders.filter(F.col("o_orderdate") >= F.lit(_MERGE_CUTOFF).cast("timestamp"))
        .select(*_MERGE_COLS)
        .withColumn("src", F.lit("delta"))
    )
    survivors = base.join(delta.select("o_orderkey"), "o_orderkey", "left_anti")
    return delta.unionByName(survivors)


@register(
    "scd2_intervals",
    oracle="""
    SELECT user_id, event_id, event_type,
           epoch_us(ts) AS valid_from_us,
           LEAD(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
           ) AS valid_to_us
    FROM events
    """,
    doc="SCD-2 history build: each version row becomes a validity interval "
        "closed by the next version's timestamp (open current row → NULL). "
        "One keyed window — the producer side of the as-of join "
        "(operators/joins.py join_asof consumes exactly this shape).",
)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.col("us").alias("valid_from_us"),
        F.lead("us").over(w).alias("valid_to_us"),
    )


@register(
    "scd2_apply",
    oracle="""
    SELECT user_id, event_id, event_type,
           epoch_us(ts) AS valid_from_us,
           LEAD(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
           ) AS valid_to_us
    FROM events
    """,
    doc="Incremental SCD-2 maintenance — apply a CDC delta to an existing "
        "history WITHOUT rebuilding it: the delta's key set is isolated "
        "(distinct + broadcast semi-join), only those keys' interval rows "
        "are re-opened, unioned with the delta, and re-windowed; every "
        "untouched key's rows pass through an anti-join untouched. "
        "Correctness contract, enforced by the oracle: applying the "
        "odd-event_id half as a delta onto the snapshot built from the "
        "even half must be INDISTINGUISHABLE from building the history "
        "from the full log. At 100 TB the rewrite cost is O(affected "
        "keys), not O(history) — deltas are small, so the semi/anti "
        "probes broadcast and the only shuffle is the re-window of the "
        "affected slice.",
)
def scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    versioned = ev.select("user_id", "event_id", "event_type", "us")
    base_rows = versioned.filter(F.col("event_id") % 2 == 0)
    delta = versioned.filter(F.col("event_id") % 2 == 1)

    # the pre-existing SCD2 snapshot (what a real caller would read back
    # from the lake): intervals built over the base half
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    snapshot = base_rows.select(
        "user_id", "event_id", "event_type",
        F.col("us").alias("valid_from_us"),
        F.lead("us").over(w).alias("valid_to_us"),
    )

    # apply: touch ONLY keys present in the delta
    delta_keys = delta.select("user_id").distinct()
    touched = snapshot.join(F.broadcast(delta_keys), "user_id", "left_semi")
    untouched = snapshot.join(F.broadcast(delta_keys), "user_id", "left_anti")
    rebuilt = (
        touched.select(
            "user_id", "event_id", "event_type",
            F.col("valid_from_us").alias("us"),
        )
        .unionByName(delta)
        .select(
            "user_id", "event_id", "event_type",
            F.col("us").alias("valid_from_us"),
            F.lead("us").over(w.orderBy("us", "event_id")).alias("valid_to_us"),
        )
    )
    return untouched.unionByName(rebuilt)


@register(
    "cdc_snapshot_diff",
    oracle=f"""
    WITH old AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 10 <> 0
    ), new AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1.0
                    ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % 7 <> 0
    )
    SELECT COALESCE(n.o_orderkey, o.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                WHEN n.o_orderkey IS NULL THEN 'delete'
                ELSE 'update' END AS op,
           n.o_orderstatus AS new_status, n.o_totalprice AS new_price,
           o.o_orderstatus AS old_status, o.o_totalprice AS old_price
    FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
       OR o.o_totalprice  IS DISTINCT FROM n.o_totalprice
    """,
    doc="C5: snapshot differencing — derive a CDC changelog "
        "(insert/update/delete + before/after images) from two full "
        "snapshots that share no change-tracking metadata. This is the "
        "inverse of merge_upsert: the reference replays FROM a changelog "
        "(main.rs:190-313); when upstream can only hand you nightly "
        "snapshots, this operator manufactures that changelog. One "
        "full-outer shuffle join keyed on the entity key with null-safe "
        "column comparison; unchanged rows (the overwhelming majority of "
        "a 100 TB snapshot pair) are dropped BEFORE any downstream work. "
        "With both snapshots bucketed by key at write time the join is "
        "Exchange-free, making daily diffs O(changed-rows) in shuffle "
        "traffic.",
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 10 != 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new = orders.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") + 1.0)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    o, n = old.alias("o"), new.alias("n")
    joined = o.join(n, F.col("o.o_orderkey") == F.col("n.o_orderkey"), "full_outer")
    changed = (
        F.col("o.o_orderkey").isNull()
        | F.col("n.o_orderkey").isNull()
        | ~F.col("o.o_orderstatus").eqNullSafe(F.col("n.o_orderstatus"))
        | ~F.col("o.o_totalprice").eqNullSafe(F.col("n.o_totalprice"))
    )
    op = (
        F.when(F.col("o.o_orderkey").isNull(), "insert")
        .when(F.col("n.o_orderkey").isNull(), "delete")
        .otherwise("update")
    )
    return joined.filter(changed).select(
        F.coalesce(F.col("n.o_orderkey"), F.col("o.o_orderkey")).alias("o_orderkey"),
        op.alias("op"),
        F.col("n.o_orderstatus").alias("new_status"),
        F.col("n.o_totalprice").alias("new_price"),
        F.col("o.o_orderstatus").alias("old_status"),
        F.col("o.o_totalprice").alias("old_price"),
    )
