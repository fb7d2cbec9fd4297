"""Custom Python DataSource (Spark 4 DataSource API) — SURVEY §2.1 S7.

The reference's only input is Postgres; its file-dump twin here already
covers CSV/JSONL/parquet (sources/files.py). This module adds the
EXTENSIBILITY surface a 100 TB platform needs: a first-class custom
source registered through ``spark.dataSource.register`` and consumed as
``spark.read.format("oplog")`` — no JVM code, yet fully partitioned and
filter-prunable.

The concrete source is a change-log ("oplog") directory reader: each
file is JSONL of ``{op, seq, entity_id, amount, shard}`` records — the
shape a CDC drain or backfill journal produces. Design points, mapped to
the API:

- ``partitions()`` → one ``InputPartition`` per oplog file: Spark
  schedules one task per file, so a 10k-file journal reads with 10k-way
  parallelism and per-file retry granularity.
- ``pushFilters()`` (Spark 4.1) → equality/IN filters on the ``shard``
  column prune whole FILES on the driver (files are named
  ``shard=<n>-*.jsonl``), before any executor reads a byte — the Python
  analogue of partition pruning. ALL filters (shard ones included) are
  returned to Spark as residual and re-applied row-level, so pruning is
  purely an optimization: dead-letter rows and rows from
  unparseable-name files still honor the predicate (pytest covers both
  over- and under-pruning).
- ``read()`` runs in the Python worker per partition and yields tuples;
  Arrow batches them back to the JVM. Malformed lines follow the same
  dead-letter contract as sources/files.py: they surface as rows with
  NULL fields + the raw line in ``_corrupt_record``, never a task
  failure.

The source has both legs: a partitioned BATCH reader (``OplogReader``)
and a streaming CDC tail (``OplogStreamReader``,
``SimpleDataSourceStreamReader``) with a file-watermark offset model.
Reference parity: the reference has no pluggable-source layer at all
(main.rs wires Postgres directly); this is north-star surface.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

OPLOG_SCHEMA_DDL = (
    "op string, seq bigint, entity_id bigint, amount bigint, "
    "shard int, _corrupt_record string"
)

_SHARD_RE = re.compile(r"shard=(\d+)-")


class OplogFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class OplogReader(DataSourceReader):
    def __init__(self, options):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("oplog source requires .option('path', <dir>) or load(<dir>)")
        self.shard_filter: set[int] | None = None

    def pushFilters(self, filters):
        """Use shard = <n> equality/IN filters for whole-file pruning, but
        return EVERY filter (shard ones included) as residual.

        Keeping the shard filters in the residual set means Spark
        re-applies them row-level after the scan, which matters for two
        row classes the filename prune cannot see: dead-letter rows
        (shard NULL from corrupt lines inside a kept file) and rows from
        files whose names don't parse (kept conservatively by _files).
        Consuming the filters instead would under-filter exactly those
        rows — the inverse of the over-pruning bug class."""
        from pyspark.sql.datasource import EqualTo, In

        for f in filters:
            if isinstance(f, EqualTo) and tuple(f.attribute) == ("shard",):
                vals = {int(f.value)}
            elif isinstance(f, In) and tuple(f.attribute) == ("shard",):
                vals = {int(v) for v in f.value}
            else:
                continue
            self.shard_filter = (
                vals if self.shard_filter is None else self.shard_filter & vals
            )
        return iter(filters)

    def _files(self) -> list[str]:
        out = []
        for name in sorted(os.listdir(self.dir)):
            if not name.endswith(".jsonl"):
                continue
            if self.shard_filter is not None:
                m = _SHARD_RE.match(name)
                # unparseable names can't be pruned safely — keep them
                if m and int(m.group(1)) not in self.shard_filter:
                    continue
            out.append(os.path.join(self.dir, name))
        return out

    def partitions(self):
        return [OplogFilePartition(p) for p in self._files()]

    def read(self, partition: OplogFilePartition):
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.rstrip("\n")
                if not line.strip():
                    continue
                try:
                    rec = json.loads(line)
                    yield (
                        str(rec["op"]),
                        int(rec["seq"]),
                        int(rec["entity_id"]),
                        int(rec["amount"]),
                        int(rec["shard"]),
                        None,
                    )
                except (ValueError, KeyError, TypeError):
                    # dead-letter, never a task failure
                    yield (None, None, None, None, None, line)


class OplogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "oplog"

    def schema(self) -> str:
        return OPLOG_SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return OplogReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> "OplogStreamReader":
        return OplogStreamReader(self.options)


def register_oplog_source(spark) -> None:
    """Idempotent registration: spark.read.format('oplog').load(dir).

    Also flips on Python-source filter pushdown (off by default in
    Spark 4.1; a runtime conf, self-applied here the same way
    catalog.load_table applies the nanos conf) — without it Spark
    refuses to initialize a reader that implements pushFilters."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(OplogDataSource)


# ------------------------------------------------- streaming (CDC tail) --


class OplogStreamReader(SimpleDataSourceStreamReader):
    """Streaming leg of the oplog source: tail the directory for NEW
    files — the CDC drain shape (a journal only ever appends files).

    Offset model: ``{"last": "<filename>"}`` — the high-watermark file
    name under lexicographic order (journal files sort by name:
    ``shard=<n>-<seq>.jsonl``). ``read(start)`` returns rows of every
    file past the watermark plus the advanced offset; replay for
    retried batches goes through ``readBetweenOffsets`` with the same
    deterministic file-ordering rule, so a batch always re-reads
    exactly its original slice (Spark's exactly-once-per-batch
    contract for simple stream readers).

    The simple reader runs driver-side and is meant for modest
    per-batch volumes (Spark buffers a batch before distributing);
    journals with huge batches should use the batch reader per
    partition directory instead. Documented trade-off, same stance as
    the reference's single-threaded drainer loop.
    """

    def __init__(self, options):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("oplog stream requires .option('path', <dir>)")

    def _files(self) -> list[str]:
        return sorted(
            n for n in os.listdir(self.dir) if n.endswith(".jsonl")
        )

    def _rows(self, names: list[str]):
        for name in names:
            with open(os.path.join(self.dir, name), encoding="utf-8") as fh:
                for line in fh:
                    line = line.rstrip("\n")
                    if not line.strip():
                        continue
                    try:
                        rec = json.loads(line)
                        yield (
                            str(rec["op"]),
                            int(rec["seq"]),
                            int(rec["entity_id"]),
                            int(rec["amount"]),
                            int(rec["shard"]),
                            None,
                        )
                    except (ValueError, KeyError, TypeError):
                        yield (None, None, None, None, None, line)

    def initialOffset(self) -> dict:
        return {"last": ""}

    def read(self, start: dict):
        names = [n for n in self._files() if n > start.get("last", "")]
        if not names:
            return iter(()), start
        # materialized list, not a generator: Spark's prefetch cache
        # copy.copy()s the iterator for replay, which needs a copyable
        # (list) iterator — fine here, the simple reader is driver-side
        # and per-batch volumes are modest by contract (see docstring)
        return iter(list(self._rows(names))), {"last": names[-1]}

    def readBetweenOffsets(self, start: dict, end: dict):
        lo, hi = start.get("last", ""), end.get("last", "")
        return self._rows([n for n in self._files() if lo < n <= hi])

    def commit(self, end: dict) -> None:
        pass  # no external cursor to advance; files are immutable
