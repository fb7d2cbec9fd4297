"""Table sink — partitioned / sorted / bucketed columnar output.

The reference's only sink is Kafka; a standalone engine also needs to
land results as TABLES (the snapshot side of every backfill: compacted
entities, cleaned corpora, dedup survivors). This is where the 100 TB
read-path wins are *created*:

- ``partition_by`` → directory partitioning: downstream filters on the
  partition columns become partition PRUNING (directories never listed),
  the single biggest scan saver for time-sliced reads.
- ``sort_by`` → ``sortWithinPartitions`` before the write: parquet
  min/max page stats become selective, so point lookups skip row
  groups even within a partition.
- ``bucket_by`` → hash-bucketed layout (``bucketBy().saveAsTable``):
  joins/aggregations on the bucket key skip their Exchange entirely
  (proved Exchange-free in tests/test_bucketing.py).
- ``files_per_partition`` → pre-write ``repartition(n, partition_by)``:
  the small-files control. Without it, every task writes a file into
  every partition directory it touches — T×P files; with it, each
  partition directory gets ~n files regardless of input parallelism.

Layout is declared once here; every reader gets the benefits from
Catalyst with no code changes.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class TableSinkConfig:
    """Declarative output-table layout."""

    path: str
    format: str = "parquet"
    mode: str = "error"  # error | overwrite | append
    partition_by: tuple[str, ...] = ()
    sort_by: tuple[str, ...] = ()
    bucket_by: tuple[int, tuple[str, ...]] | None = None  # (n_buckets, cols)
    table_name: str | None = None  # required for bucket_by (metastore layout)
    files_per_partition: int | None = None
    options: dict[str, str] = field(default_factory=dict)


def write_table(df: DataFrame, cfg: TableSinkConfig) -> None:
    """Write ``df`` with the declared layout (one action, no collect)."""
    if cfg.files_per_partition:
        if cfg.partition_by:
            df = df.repartition(cfg.files_per_partition, *cfg.partition_by)
        else:
            df = df.repartition(cfg.files_per_partition)
    if cfg.sort_by:
        df = df.sortWithinPartitions(*cfg.sort_by)
    writer = df.write.format(cfg.format).mode(cfg.mode).options(**cfg.options)
    if cfg.partition_by:
        writer = writer.partitionBy(*cfg.partition_by)
    if cfg.bucket_by is not None:
        if not cfg.table_name:
            raise ValueError("bucket_by requires table_name (bucketed saveAsTable)")
        n, cols = cfg.bucket_by
        writer = writer.bucketBy(n, *cols)
        if cfg.sort_by:
            writer = writer.sortBy(*cfg.sort_by)
        writer.option("path", cfg.path).saveAsTable(cfg.table_name)
        return
    writer.save(cfg.path)
