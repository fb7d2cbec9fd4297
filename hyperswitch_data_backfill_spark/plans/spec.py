"""Declarative pipeline spec — the engine's "query plan" surface.

The reference hard-codes its plan as a loop nest (``main.rs:59-321``:
merchants → entities → batches → rows). Ours is a declarative spec
compiled to ONE DataFrame program per entity; Catalyst plans the
physical execution (pushdown, broadcast, partition count), and a single
Spark job replaces the reference's O(merchants × entities × batches)
round-trips (SURVEY §3.4).

A ``BackfillSpec`` mirrors the reference CLI (``main.rs:33-57``):
time window (default-open bounds, F5), optional merchant allow-list,
per-entity source table + column remap + topic.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hyperswitch_data_backfill_spark.sinks.kafka import event_frame

# Default-open window bounds (F5): the reference defaults start to year 0
# and end to PrimitiveDateTime::MAX (main.rs:52-56); we clamp to the
# timestamp range Spark/parquet/DuckDB all agree on.
DEFAULT_START = "0001-01-01 00:00:00"
DEFAULT_END = "9999-12-31 23:59:59"


@dataclass(frozen=True)
class EntitySpec:
    """One entity pipeline (≙ dump_payment_intents & siblings)."""

    table: str
    merchant_col: str  # ≙ merchant_id
    time_col: str      # ≙ created_at
    key_cols: tuple[str, ...]  # event key (deterministic, for downstream dedup)
    topic: str
    remap: dict[str, str] = field(default_factory=dict)  # source col → event field


@dataclass(frozen=True)
class BackfillSpec:
    """Whole-job spec (≙ the reference CLI, main.rs:33-57)."""

    entities: tuple[EntitySpec, ...]
    start: str = DEFAULT_START
    end: str = DEFAULT_END
    merchant_ids: tuple[int, ...] | None = None  # None → all merchants
    tenant_id: str = "default"


def compile_entity(
    df: DataFrame,
    spec: EntitySpec,
    job: BackfillSpec,
    key_dim: DataFrame | None = None,
    key_dim_col: str | None = None,
) -> DataFrame:
    """Compile one entity pipeline to a Kafka-record DataFrame.

    scan → window filter (F2) → allow-list semi-filter (J2) → broadcast
    key-store join (J1, optional) → remap (U2) → event projection (S4).
    Every predicate lands before the join so Catalyst pushes it into the
    scan; the dimension is broadcast so the fact never shuffles.

    ``df`` may be a STREAMING DataFrame: every stage here (filter,
    stream-static broadcast join, projection) is stream-compatible, so
    the same spec compiles to the continuous-backfill variant — readStream
    (CDC/Kafka) in, ``writeStream.format("kafka")`` out. Proven by
    tests/test_streaming.py::test_compile_entity_on_stream_equals_batch.
    """
    out = df.filter(
        F.col(spec.time_col).between(
            F.lit(job.start).cast("timestamp_ntz"), F.lit(job.end).cast("timestamp_ntz")
        )
    )
    if job.merchant_ids is not None:
        out = out.filter(F.col(spec.merchant_col).isin(list(job.merchant_ids)))
    if key_dim is not None and key_dim_col is not None:
        out = out.join(
            F.broadcast(key_dim), out[spec.merchant_col] == key_dim[key_dim_col], "inner"
        )
    payload: list[Column] = (
        [F.col(src).alias(dst) for src, dst in spec.remap.items()]
        if spec.remap
        else [F.col(c) for c in df.columns]
    )
    return event_frame(out, list(spec.key_cols), spec.topic, job.tenant_id, payload)
