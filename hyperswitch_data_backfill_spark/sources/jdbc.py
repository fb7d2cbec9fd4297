"""Partitioned JDBC source — SURVEY §2.1 S1/S2, §4.2.2.

The reference reads Postgres with hand-rolled LIMIT/OFFSET batches of
10 000 rows (``payment_intent.rs:61-68``, ``main.rs:43-44``) — O(n²)
server work, one round-trip per batch, unstable under concurrent
writes. The Spark-native replacement reads every partition exactly once
with range or per-merchant predicates:

- ``range`` mode: ``partitionColumn/lowerBound/upperBound/numPartitions``
  — each executor gets a key range (keyset semantics).
- ``predicates`` mode: one WHERE-fragment per partition, used to mirror
  the reference's merchant isolation (one partition per merchant or per
  merchant-group) and to dodge skew: a whale merchant gets its own
  predicate split by time range.

Both push the job's filters down (``pushDownPredicate`` defaults true),
so Postgres scans only matching rows. ``fetchsize`` plays the role of
the reference's batch_size — rows per network round trip, not rows per
query.

Tested end-to-end against an embedded Derby database (Derby ships in
Spark's jars/): range- and predicate-partitioned reads, partition
counts, and filter pushdown — see tests/test_sources_sinks.py.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, DataFrameReader, SparkSession

# plain dotted identifier, or a double-quoted one (no embedded quotes)
_IDENTIFIER_RE = re.compile(r'[A-Za-z_][A-Za-z0-9_.]*|"[^"]+"')


@dataclass(frozen=True)
class JdbcSourceConfig:
    """Mirror of the reference's [replica_database] block (development.toml:31-38)."""

    url: str  # jdbc:postgresql://host:port/db
    table: str
    user: str = ""
    password: str = ""
    fetchsize: int = 10_000  # ≙ --batch_size rows per round-trip (main.rs:43-44)
    options: dict[str, str] = field(default_factory=dict)


def merchant_predicates(
    merchant_col: str,
    merchant_ids: list[str | int],
    time_col: str | None = None,
    start: str | None = None,
    end: str | None = None,
    group_size: int = 1,
) -> list[str]:
    """One JDBC predicate per merchant (group) — §4.2.2 engine code.

    Mirrors the reference's merchant-isolated reads (main.rs:190-216)
    without N separate queries: Spark issues all partitions concurrently
    through the connection pool. ``group_size > 1`` coalesces small
    merchants into one partition to cap partition count at scale.
    """

    def fmt(v: str | int) -> str:
        return str(v) if isinstance(v, int) else "'" + str(v).replace("'", "''") + "'"

    if not _IDENTIFIER_RE.fullmatch(merchant_col):
        raise ValueError(f"merchant_col is not a plain identifier: {merchant_col!r}")
    window = ""
    if time_col and start and end:
        # These fragments are interpolated into SQL pushed to the source
        # database: quote-escape the window values like the merchant ids,
        # and hold the column name to identifier characters so an
        # untrusted value can't break out of the predicate.
        if not _IDENTIFIER_RE.fullmatch(time_col):
            raise ValueError(f"time_col is not a plain identifier: {time_col!r}")
        window = f" AND {time_col} BETWEEN {fmt(str(start))} AND {fmt(str(end))}"
    preds = []
    for i in range(0, len(merchant_ids), group_size):
        group = merchant_ids[i : i + group_size]
        in_list = ", ".join(fmt(m) for m in group)
        preds.append(f"{merchant_col} IN ({in_list}){window}")
    return preds


def _base_reader(spark: SparkSession, cfg: JdbcSourceConfig) -> DataFrameReader:
    reader = (
        spark.read.format("jdbc")
        .option("url", cfg.url)
        .option("dbtable", cfg.table)
        .option("fetchsize", str(cfg.fetchsize))
        .option("pushDownPredicate", "true")
    )
    if cfg.user:
        reader = reader.option("user", cfg.user).option("password", cfg.password)
    for k, v in cfg.options.items():
        reader = reader.option(k, v)
    return reader


def read_jdbc_range(
    spark: SparkSession,
    cfg: JdbcSourceConfig,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int,
) -> DataFrame:
    """Range-partitioned scan — each partition reads [lo, hi) exactly once."""
    return (
        _base_reader(spark, cfg)
        .option("partitionColumn", partition_column)
        .option("lowerBound", str(lower_bound))
        .option("upperBound", str(upper_bound))
        .option("numPartitions", str(num_partitions))
        .load()
    )


def read_jdbc_bounded(
    spark: SparkSession,
    cfg: JdbcSourceConfig,
    partition_column: str,
    num_partitions: int,
) -> DataFrame:
    """Range-partitioned scan with DISCOVERED bounds — the no-allow-list path.

    Runs one tiny JDBC query (``SELECT MIN(col), MAX(col)``) to find the
    key range, then range-partitions the real scan over it. Falls back to
    an unpartitioned read when the column isn't integral (e.g. varchar
    merchant ids — Spark's partitionColumn must be numeric/date/timestamp)
    or the table is empty, rather than crashing or hardcoding bounds that
    silently funnel out-of-range keys into one partition.
    """
    if not _IDENTIFIER_RE.fullmatch(partition_column):
        raise ValueError(f"partition_column is not a plain identifier: {partition_column!r}")
    import numbers

    probe_cfg = JdbcSourceConfig(
        url=cfg.url,
        table=f"(SELECT MIN({partition_column}) AS lo, MAX({partition_column}) AS hi "
        f"FROM {cfg.table}) bounds_probe",
        user=cfg.user,
        password=cfg.password,
        fetchsize=cfg.fetchsize,
        options=cfg.options,
    )
    # positional access: engines disagree on unquoted-alias case folding
    row = _base_reader(spark, probe_cfg).load().first()
    lo, hi = (row[0], row[1]) if row is not None else (None, None)
    if (
        lo is None
        or not isinstance(lo, numbers.Integral)
        or not isinstance(hi, numbers.Integral)
    ):
        return _base_reader(spark, cfg).load()
    return read_jdbc_range(
        spark, cfg, partition_column, int(lo), int(hi) + 1, num_partitions
    )


def read_jdbc_predicates(
    spark: SparkSession, cfg: JdbcSourceConfig, predicates: list[str]
) -> DataFrame:
    """Predicate-partitioned scan (one partition per WHERE fragment)."""
    props = {"fetchsize": str(cfg.fetchsize), **cfg.options}
    if cfg.user:
        props["user"] = cfg.user
        props["password"] = cfg.password
    return spark.read.jdbc(cfg.url, cfg.table, predicates=predicates, properties=props)
