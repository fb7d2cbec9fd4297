"""JDBC table sink — the write-back leg of the JDBC surface.

The reference only reads Postgres and writes Kafka (main.rs:146-153),
but a backfill engine in practice also writes relational state back:
reconciliation tables, watermark/checkpoint rows, repaired entities.
Spark-first shape: ``df.write.format("jdbc")`` — executors write in
parallel, one connection per partition, batched inserts.

Scale controls (the knobs that matter at 100 TB → OLTP):

- ``num_partitions`` caps concurrent connections (a 1000-executor job
  must NOT open 1000 writers against one primary — coalesce first);
- ``batchsize`` amortizes the per-round-trip cost (executemany);
- ``isolationLevel=READ_COMMITTED`` by default — bulk loads shouldn't
  hold long transactions;
- overwrite uses ``truncate=true`` where supported so the table's
  grants/indexes survive (fall back to drop+recreate otherwise).

Delivery semantics are the same at-least-once envelope as the Kafka
sink: a retried task re-inserts its partition's batch. For
effectively-once, route through ``streaming.pipeline.
idempotent_parquet_batch_writer``'s pattern (batch_id as the write
unit) or a staging-table + MERGE on the database side — documented
here, same stance as the reference's ReplacingMergeTree dependency
[dep]. Integration-tested against embedded Derby (tests/
test_sources_sinks.py), like the read path.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class JdbcSinkConfig:
    """Declarative JDBC sink spec (write twin of JdbcSourceConfig)."""

    url: str
    table: str
    mode: str = "append"  # append | overwrite | errorifexists | ignore
    user: str | None = None
    password: str | None = None
    batchsize: int = 10_000
    num_partitions: int | None = None  # cap concurrent connections
    isolation_level: str = "READ_COMMITTED"
    truncate: bool = True  # overwrite keeps table DDL where supported
    options: dict[str, str] = field(default_factory=dict)


def write_jdbc(df: DataFrame, cfg: JdbcSinkConfig) -> None:
    """Batched parallel JDBC write; partition count == connection count."""
    out = df
    if cfg.num_partitions is not None and df.rdd.getNumPartitions() > cfg.num_partitions:
        # coalesce, not repartition: capping connections must not add a shuffle
        out = df.coalesce(cfg.num_partitions)
    writer = (
        out.write.format("jdbc")
        .option("url", cfg.url)
        .option("dbtable", cfg.table)
        .option("batchsize", str(cfg.batchsize))
        .option("isolationLevel", cfg.isolation_level)
        .option("truncate", "true" if cfg.truncate else "false")
    )
    if cfg.user:
        writer = writer.option("user", cfg.user)
        if cfg.password is not None:
            writer = writer.option("password", cfg.password)
        else:
            # fail loudly at config time: a None passed through .option()
            # reaches the JVM writer as null and errors opaquely (or
            # silently sends no credential, depending on the driver)
            raise ValueError(
                f"JdbcSinkConfig: user {cfg.user!r} set without a password; "
                "set password (resolve secrets via config.py) or drop user "
                "for trusted-auth URLs"
            )
    for k, v in cfg.options.items():
        writer = writer.option(k, v)
    writer.mode(cfg.mode).save()
