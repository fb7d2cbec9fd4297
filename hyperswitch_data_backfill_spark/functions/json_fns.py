"""JSON extraction — SURVEY §2.8 X4.

The Hyperswitch entities carry ``serde_json::Value`` metadata columns
[dep] that downstream ClickHouse consumers parse; the fixture analogue
is ``events.props`` (a JSON string). Extraction is a codegen'd path
expression (``get_json_object``) — no UDF, no shuffle; at 100 TB the
only cost is reading the string column (column-pruned to just ``props``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hyperswitch_data_backfill_spark.catalog import load_table
from hyperswitch_data_backfill_spark.registry import register


@register(
    "json_extract",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events
    """,
    doc="X4: JSON path extraction from a metadata column + typed cast.",
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
    )


@register(
    "json_extract_agg",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
    doc="X4b: extract-then-aggregate — the ClickHouse-dashboard shape "
        "(sum of a JSON metric per event type); integer-exact.",
)
def json_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_type", F.get_json_object("props", "$.k").cast("bigint").alias("k"))
        .groupBy("event_type")
        .agg(F.sum("k").cast("bigint").alias("k_sum"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "map_props_stats",
    oracle="""
    WITH kv AS (
        SELECT unnest(json_keys(props)) AS k, props FROM events
    ), ex AS (
        SELECT k, CAST(json_extract(props, '$."' || k || '"') AS BIGINT) AS v
        FROM kv
    )
    -- CAST on SUM: DuckDB SUM(BIGINT) -> HUGEINT -> pandas float64,
    -- which hash-mismatches Spark's int64 despite equal values.
    SELECT k, COUNT(*) AS n, MIN(v) AS vmin, MAX(v) AS vmax,
           CAST(SUM(v) AS BIGINT) AS vsum
    FROM ex GROUP BY k
    """,
    doc="X4c: MAP-typed column ops — parse the JSON props object into a real "
        "map<string,bigint> (typed, not string re-extraction), explode to "
        "(key, value) pairs, aggregate per key. The map stays a Tungsten "
        "UnsafeMapData end-to-end (from_json + explode are codegen); per-key "
        "stats are integer-exact. At 100 TB this is the schema-on-read path "
        "for heterogenous event properties — no schema migration to add a "
        "key, and the per-key groupBy is a plain hash shuffle on a "
        "low-cardinality key space.",
)
def map_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    kv = ev.select(
        F.explode(F.from_json("props", "map<string,bigint>")).alias("k", "v")
    )
    return kv.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
        F.sum("v").alias("vsum"),
    )


@register(
    "json_variant_extract",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           CAST(NULL AS BIGINT) AS missing_val,
           json_extract_string(props, '$.k') IS NOT NULL AS has_k
    FROM events
    """,
    doc="X4d: Spark 4 VARIANT path — parse_json once into the binary "
        "semi-structured VARIANT type, then typed variant_get extraction "
        "(no per-access string re-parse, unlike get_json_object chains) "
        "and try_variant_get for absent paths (NULL, not error). At "
        "100 TB VARIANT is the schema-on-read format of choice: the "
        "parse cost is paid once per row, extractions are byte-offset "
        "lookups, and Parquet VARIANT shredding lets the scan prune to "
        "the accessed paths. Oracle replays the same typed extraction "
        "with DuckDB's JSON functions.",
)
def json_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = ev.select("event_id", "event_type", F.parse_json("props").alias("v"))
    return v.select(
        "event_id",
        "event_type",
        F.variant_get("v", "$.k", "bigint").alias("k_val"),
        F.try_variant_get("v", "$.missing", "bigint").alias("missing_val"),
        F.variant_get("v", "$.k", "bigint").isNotNull().alias("has_k"),
    )
