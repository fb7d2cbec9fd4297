"""SparkSession factory + session preparation.

The reference bootstraps config/secrets/telemetry in ``main.rs:59-117``;
our equivalent bootstrap is a SparkSession with the settings every
operator in this engine assumes:

- **AQE on** — runtime re-planning (skew joins, partition coalescing)
  replaces the reference's hand-tuned ``--parallel``/``--batch_size``
  knobs (``main.rs:43-47``) at any scale.
- **Arrow on** — every Python-side transform in this engine is a
  vectorized pandas UDF (the slow per-row path of the reference,
  ``payment_intent.rs:84-107``, has no equivalent here).
- **nanosAsLong** — the fixture ``events`` table carries parquet
  TIMESTAMP(NANOS), which Spark cannot map natively; we read it as long
  and convert with integer division (catalog.py) so values match
  DuckDB's ns→µs truncation bit-for-bit.
- **UTC session timezone** — all fixture timestamps are timezone-naive;
  pinning UTC makes the (rare) ltz↔ntz conversions identity.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable SQL confs applied to *any* session handed to us (the
# verify driver builds its own session for entry()/queries(); we must not
# assume it used our builder).
_RUNTIME_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Pandas-UDF stages (similarity matmuls, codec decoders) are BLAS /
    # byte-level batch work: bigger Arrow batches amortize the per-batch
    # Python round-trip. Measured on sim_topk at sf0.1: 1.08 s -> 0.86 s
    # vs the 10k default; memory per batch stays small (embeddings are
    # ~KB/row). Round 3.
    "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
}


def _shuffle_partitions_for(spark: SparkSession) -> str | None:
    """Local-mode shuffle sizing for sessions that kept Spark's 200 default.

    A vanilla ``local[k]`` session runs every exchange (and every
    explicit ``repartitionByRange``) as 200 tasks — pure scheduler
    overhead at test scale, and AQE does not coalesce user-requested
    repartitions. If the session looks local AND the user left
    ``spark.sql.shuffle.partitions`` at the 200 default, size it to the
    scheduler's actual slot count instead. A deliberately configured
    value (anything != 200) or a cluster master is never overridden —
    on a real cluster partition count is a capacity decision that
    belongs to the job config / AQE.
    """
    try:
        if not spark.sparkContext.master.startswith("local"):
            return None
        if spark.conf.get("spark.sql.shuffle.partitions", "200") != "200":
            return None
        return str(spark.sparkContext.defaultParallelism)
    except Exception:  # pragma: no cover - context already stopped
        return None


def prepare_session(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime-settable confs to an existing session.

    Safe to call repeatedly; ignores confs the session refuses to set at
    runtime (none of ours are static, but be defensive).
    """
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - static conf on some builds
            pass
    sp = _shuffle_partitions_for(spark)
    if sp is not None:
        try:
            spark.conf.set("spark.sql.shuffle.partitions", sp)
        except Exception:  # pragma: no cover
            pass
    return spark


def get_spark(app_name: str = "hyperswitch-data-backfill-spark",
              master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Local-mode defaults come from the environment so the same entry
    points serve tests (local[4]) and bench (local[$SPARK_GRAFT_CPUS]);
    on a real cluster, ``master`` is left to spark-submit.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "4")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
    )
    for k, v in _RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return prepare_session(builder.getOrCreate())
