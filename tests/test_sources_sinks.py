"""JDBC source builder, Kafka sink projection, pipeline spec compilation."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from hyperswitch_data_backfill_spark.catalog import load_table
from hyperswitch_data_backfill_spark.plans.spec import BackfillSpec, EntitySpec, compile_entity
from hyperswitch_data_backfill_spark.sinks.kafka import KafkaSinkConfig, event_frame
from hyperswitch_data_backfill_spark.sources.jdbc import (
    JdbcSourceConfig,
    merchant_predicates,
)
from tests.conftest import SF_DIR


def test_merchant_predicates_single():
    preds = merchant_predicates("merchant_id", ["m1", "m2"])
    assert preds == ["merchant_id IN ('m1')", "merchant_id IN ('m2')"]


def test_merchant_predicates_grouped_with_window():
    preds = merchant_predicates(
        "merchant_id", [1, 2, 3], time_col="created_at",
        start="2024-01-01", end="2024-02-01", group_size=2,
    )
    assert preds == [
        "merchant_id IN (1, 2) AND created_at BETWEEN '2024-01-01' AND '2024-02-01'",
        "merchant_id IN (3) AND created_at BETWEEN '2024-01-01' AND '2024-02-01'",
    ]


def test_merchant_predicates_escapes_quotes():
    preds = merchant_predicates("m", ["o'brien"])
    assert preds == ["m IN ('o''brien')"]


def test_jdbc_config_defaults():
    cfg = JdbcSourceConfig(url="jdbc:postgresql://h/db", table="payment_intent")
    assert cfg.fetchsize == 10_000  # ≙ reference --batch_size default (main.rs:43-44)


def test_event_frame_shape_and_key(spark):
    orders = load_table(spark, SF_DIR, "orders").limit(5)
    out = event_frame(orders, ["o_custkey", "o_orderkey"], "t1", tenant_id="tenantA")
    rows = out.collect()
    assert out.columns == ["key", "value", "topic"]
    for r in rows:
        ck, ok = r["key"].split(":")
        payload = json.loads(r["value"])
        assert payload["o_custkey"] == int(ck) and payload["o_orderkey"] == int(ok)
        assert payload["tenant_id"] == "tenantA"
        assert r["topic"] == "t1"


def test_kafka_sink_config_mirrors_reference_topics():
    cfg = KafkaSinkConfig(
        bootstrap_servers="localhost:9092",
        topics={
            "payment_intent": "hyperswitch-payment-intent-events",
            "payment_attempt": "hyperswitch-payment-attempt-events",
            "refund": "hyperswitch-refund-events",
            "dispute": "hyperswitch-dispute-events",
        },
        consolidated_topic="hyperswitch-consolidated-events",
    )
    assert len(cfg.topics) == 4


def test_compile_entity_full_pipeline(spark):
    orders = load_table(spark, SF_DIR, "orders")
    cust = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", F.col("c_name").alias("merchant_name")
    )
    spec = EntitySpec(
        table="orders", merchant_col="o_custkey", time_col="o_orderdate",
        key_cols=("o_custkey", "o_orderkey"), topic="orders-events",
        remap={"o_orderkey": "payment_id", "merchant_name": "merchant_name"},
    )
    job = BackfillSpec(
        entities=(spec,), start="1995-01-01 00:00:00", end="1996-12-31 23:59:59",
        merchant_ids=(7, 13), tenant_id="tenantX",
    )
    out = compile_entity(orders, spec, job, key_dim=cust, key_dim_col="c_custkey")
    rows = out.collect()
    assert rows, "windowed + allow-listed pipeline yielded no rows"
    for r in rows:
        payload = json.loads(r["value"])
        assert set(payload) == {"payment_id", "merchant_name", "tenant_id"}
        assert payload["tenant_id"] == "tenantX"
        assert int(r["key"].split(":")[0]) in (7, 13)


def test_compile_entity_open_bounds(spark):
    orders = load_table(spark, SF_DIR, "orders")
    spec = EntitySpec(
        table="orders", merchant_col="o_custkey", time_col="o_orderdate",
        key_cols=("o_orderkey",), topic="t",
    )
    job = BackfillSpec(entities=(spec,))  # default-open window (F5)
    assert compile_entity(orders, spec, job).count() == orders.count()


# ---------------------------------------------------------------------------
# Embedded-Derby JDBC round trip: the real spark.read.jdbc path (S1/S2),
# range- and predicate-partitioned, against an in-JVM database. Derby ships
# in Spark's jars/ (used by the Hive metastore), so no extra install; in
# local mode executors share the JVM, so the in-memory DB is visible to
# partition reads exactly as a network Postgres would be.
# ---------------------------------------------------------------------------

DERBY_URL = "jdbc:derby:memory:jdbctest"
DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_table(spark):
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(DERBY_URL + ";create=true")
    st = conn.createStatement()
    st.execute(
        'CREATE TABLE payment_intent ("payment_id" INT PRIMARY KEY, '
        '"merchant_id" VARCHAR(32), "amount" BIGINT, "created_at" TIMESTAMP)'
    )
    ps = conn.prepareStatement('INSERT INTO payment_intent VALUES (?, ?, ?, ?)')
    ts = jvm.java.sql.Timestamp
    for i in range(200):
        ps.setInt(1, i)
        ps.setString(2, f"m{i % 4}")
        ps.setLong(3, 100 * i)
        ps.setTimestamp(4, ts.valueOf(f"2024-01-{1 + i % 28:02d} 12:00:00"))
        ps.addBatch()
    ps.executeBatch()
    ps.close()
    st.close()
    conn.close()
    yield "payment_intent"


def _derby_cfg():
    return JdbcSourceConfig(
        url=DERBY_URL, table="payment_intent", options={"driver": DERBY_DRIVER}
    )


def test_jdbc_range_partitioned_roundtrip(spark, derby_table):
    from hyperswitch_data_backfill_spark.sources.jdbc import read_jdbc_range

    df = read_jdbc_range(
        spark, _derby_cfg(), partition_column='"payment_id"',
        lower_bound=0, upper_bound=200, num_partitions=4,
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 200  # every row exactly once across range partitions
    got = {r["payment_id"]: (r["merchant_id"], r["amount"]) for r in df.collect()}
    assert got[7] == ("m3", 700)
    assert len(got) == 200


def test_jdbc_predicate_partitioned_merchant_isolation(spark, derby_table):
    from hyperswitch_data_backfill_spark.sources.jdbc import read_jdbc_predicates

    preds = merchant_predicates('"merchant_id"', ["m0", "m1", "m2"])
    df = read_jdbc_predicates(spark, _derby_cfg(), preds)
    # one partition per merchant predicate, allow-list semantics (J2)
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 150
    assert set(r["merchant_id"] for r in df.collect()) == {"m0", "m1", "m2"}


def test_jdbc_filter_pushdown_to_source(spark, derby_table):
    from hyperswitch_data_backfill_spark.sources.jdbc import read_jdbc_range

    df = read_jdbc_range(
        spark, _derby_cfg(), partition_column='"payment_id"',
        lower_bound=0, upper_bound=200, num_partitions=2,
    ).filter((F.col("merchant_id") == "m1") & (F.col("amount") > 1000))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "merchant_id" in plan.split("PushedFilters")[1][:200]
    assert df.count() == len([i for i in range(200) if i % 4 == 1 and 100 * i > 1000])


def test_jdbc_to_kafka_records_end_to_end(spark, derby_table):
    """The reference's whole job, minus only a live broker: partitioned
    JDBC scan of payment_intent → window filter → remap → keyed JSON
    event records, one per source row (main.rs:190-313 transposed)."""
    from hyperswitch_data_backfill_spark.sources.jdbc import read_jdbc_predicates

    preds = merchant_predicates('"merchant_id"', ["m0", "m1"])
    src = read_jdbc_predicates(spark, _derby_cfg(), preds)
    spec = EntitySpec(
        table="payment_intent", merchant_col="merchant_id", time_col="created_at",
        key_cols=("merchant_id", "payment_id"), topic="hyperswitch-payment-intent-events",
        remap={"payment_id": "payment_id", "merchant_id": "merchant_id", "amount": "amount"},
    )
    job = BackfillSpec(
        entities=(spec,), start="2024-01-01 00:00:00", end="2024-01-10 23:59:59",
        tenant_id="tenant1",
    )
    out = compile_entity(src, spec, job)
    rows = out.collect()
    # days 1-10 of the seeded calendar, merchants m0/m1 only
    expected_ids = [i for i in range(200) if i % 4 in (0, 1) and 1 + i % 28 <= 10]
    assert len(rows) == len(expected_ids)
    for r in rows:
        m, pid = r["key"].split(":")
        payload = json.loads(r["value"])
        assert payload["merchant_id"] == m and payload["payment_id"] == int(pid)
        assert payload["amount"] == 100 * int(pid)
        assert payload["tenant_id"] == "tenant1"
        assert r["topic"] == "hyperswitch-payment-intent-events"


def test_merchant_predicates_escape_and_validate():
    """Window values are quote-escaped and column names must be identifiers
    — an untrusted value can't break out of the pushed-down predicate."""
    import pytest

    from hyperswitch_data_backfill_spark.sources.jdbc import merchant_predicates

    preds = merchant_predicates(
        "merchant_id", ["m'1"], "created_at",
        "2024-01-01' OR '1'='1", "2024-12-31",
    )
    assert preds == [
        "merchant_id IN ('m''1') AND created_at BETWEEN "
        "'2024-01-01'' OR ''1''=''1' AND '2024-12-31'"
    ]
    with pytest.raises(ValueError):
        merchant_predicates("m; DROP TABLE x", [1])
    with pytest.raises(ValueError):
        merchant_predicates("merchant_id", [1], "ts) OR (1=1", "a", "b")


def test_jdbc_bounded_discovers_numeric_bounds(spark, derby_table):
    """read_jdbc_bounded probes MIN/MAX of the key and range-partitions the
    scan — the no-allow-list CLI path with nothing hardcoded."""
    from hyperswitch_data_backfill_spark.sources.jdbc import read_jdbc_bounded

    df = read_jdbc_bounded(spark, _derby_cfg(), '"payment_id"', 4)
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 200
    # every partition non-degenerate: bounds 0..199 split evenly-ish
    sizes = df.rdd.glom().map(len).collect()
    assert all(s > 0 for s in sizes), sizes


def test_jdbc_bounded_falls_back_for_varchar_key(spark, derby_table):
    """A varchar partition column can't range-partition — must fall back to
    an unpartitioned read, not crash."""
    from hyperswitch_data_backfill_spark.sources.jdbc import read_jdbc_bounded

    df = read_jdbc_bounded(spark, _derby_cfg(), '"merchant_id"', 4)
    assert df.count() == 200


# ---------------------------------------------------------------- files


def _files_schema():
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    return StructType([StructField("id", LongType()), StructField("name", StringType())])


def test_csv_source_schema_enforced_and_quarantine(spark, tmp_path):
    from hyperswitch_data_backfill_spark.sources.files import (
        CORRUPT_COL,
        FileSourceConfig,
        read_file_source,
        split_corrupt,
    )

    p = tmp_path / "dump.csv"
    p.write_text("1,alice\n2,bob\nnot_a_number,carol\n")
    df = read_file_source(
        spark, FileSourceConfig(path=str(p), format="csv", schema=_files_schema())
    )
    assert df.schema[CORRUPT_COL].dataType.typeName() == "string"
    clean, bad = split_corrupt(df)
    assert {(r.id, r.name) for r in clean.collect()} == {(1, "alice"), (2, "bob")}
    bad_rows = bad.collect()
    assert len(bad_rows) == 1 and "not_a_number" in bad_rows[0][CORRUPT_COL]


def test_json_source_quarantines_broken_lines(spark, tmp_path):
    from hyperswitch_data_backfill_spark.sources.files import (
        FileSourceConfig,
        read_file_source,
        split_corrupt,
    )

    p = tmp_path / "dump.jsonl"
    p.write_text('{"id": 1, "name": "alice"}\n{broken\n{"id": 2, "name": "bob"}\n')
    df = read_file_source(
        spark, FileSourceConfig(path=str(p), format="json", schema=_files_schema())
    )
    clean, bad = split_corrupt(df)
    assert clean.count() == 2
    assert bad.count() == 1


def test_file_source_requires_schema_and_known_format(spark):
    import pytest

    from hyperswitch_data_backfill_spark.sources.files import (
        FileSourceConfig,
        read_file_source,
    )

    with pytest.raises(ValueError, match="explicit schema"):
        read_file_source(spark, FileSourceConfig(path="/x", format="csv"))
    with pytest.raises(ValueError, match="unsupported"):
        read_file_source(spark, FileSourceConfig(path="/x", format="sequencefile"))


def test_parquet_file_source_reads_fixture(spark):
    from hyperswitch_data_backfill_spark.sources.files import (
        FileSourceConfig,
        read_file_source,
        split_corrupt,
    )

    df = read_file_source(
        spark,
        FileSourceConfig(path=f"{SF_DIR}/customer.parquet", format="parquet"),
    )
    clean, bad = split_corrupt(df)
    assert clean.count() > 0 and bad.count() == 0


# ---------------------------------------------------------------- tables


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    """write_table(partition_by=status): reading one status must show
    partition pruning in the plan, not a filter over the full scan."""
    from hyperswitch_data_backfill_spark.sinks.tables import TableSinkConfig, write_table

    orders = load_table(spark, SF_DIR, "orders")
    out = str(tmp_path / "orders_by_status")
    write_table(
        orders,
        TableSinkConfig(
            path=out, mode="overwrite", partition_by=("o_orderstatus",),
            files_per_partition=2,
        ),
    )
    back = spark.read.parquet(out).filter(F.col("o_orderstatus") == "F")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "o_orderstatus" in plan.split(
        "PartitionFilters", 1
    )[1].split("]", 1)[0]
    assert back.count() == orders.filter(F.col("o_orderstatus") == "F").count()
    # small-files control: each partition dir holds <= files_per_partition files
    import glob

    for d in glob.glob(f"{out}/o_orderstatus=*"):
        assert len(glob.glob(f"{d}/*.parquet")) <= 2, d


def test_sorted_write_orders_rows_within_files(spark, tmp_path):
    from hyperswitch_data_backfill_spark.sinks.tables import TableSinkConfig, write_table

    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    out = str(tmp_path / "orders_sorted")
    write_table(
        orders,
        TableSinkConfig(
            path=out, mode="overwrite", sort_by=("o_orderkey",), files_per_partition=4
        ),
    )
    import glob

    files = glob.glob(f"{out}/*.parquet")
    assert 1 <= len(files) <= 4
    for f in files:
        keys = [r.o_orderkey for r in spark.read.parquet(f).collect()]
        assert keys == sorted(keys), f"rows not sorted within {f}"


def test_bucketed_write_requires_table_name(spark, tmp_path):
    from hyperswitch_data_backfill_spark.sinks.tables import TableSinkConfig, write_table

    with pytest.raises(ValueError, match="table_name"):
        write_table(
            load_table(spark, SF_DIR, "orders"),
            TableSinkConfig(path=str(tmp_path), bucket_by=(4, ("o_orderkey",))),
        )


# ---------------------------------------------------------------- S7: Python DataSource


def _write_oplog(dirpath, shard, n, corrupt=False):
    import json as _json
    import os as _os

    _os.makedirs(dirpath, exist_ok=True)
    p = f"{dirpath}/shard={shard}-part0.jsonl"
    with open(p, "w", encoding="utf-8") as fh:
        for i in range(n):
            fh.write(
                _json.dumps(
                    {
                        "op": "insert" if i % 3 else "update",
                        "seq": shard * 10_000 + i,
                        "entity_id": i,
                        "amount": i * 100,
                        "shard": shard,
                    }
                )
                + "\n"
            )
        if corrupt:
            fh.write("{not json at all\n")
    return p


def test_python_datasource_oplog_reads_all_shards(spark, tmp_path):
    from hyperswitch_data_backfill_spark.sources.pydatasource import (
        register_oplog_source,
    )

    d = str(tmp_path / "oplog")
    for s in range(3):
        _write_oplog(d, s, 10)
    _write_oplog(d, 3, 5, corrupt=True)
    register_oplog_source(spark)
    df = spark.read.format("oplog").option("path", d).load()
    rows = df.collect()
    clean = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(clean) == 35 and len(bad) == 1
    assert bad[0]["_corrupt_record"].startswith("{not json")
    assert {r["shard"] for r in clean} == {0, 1, 2, 3}
    # one task per file
    assert df.rdd.getNumPartitions() == 4


def test_python_datasource_filter_pushdown_prunes_files(spark, tmp_path):
    """Driver-side unit contract of pushFilters + partitions: a shard
    equality filter must prune non-matching FILES, yet EVERY filter
    (shard ones included) comes back as residual so Spark re-applies it
    row-level — the guard against under-filtering dead-letter rows and
    unparseable-name files."""
    from pyspark.sql.datasource import EqualTo, GreaterThan, In

    from hyperswitch_data_backfill_spark.sources.pydatasource import OplogReader

    d = str(tmp_path / "oplog")
    for s in range(4):
        _write_oplog(d, s, 4)
    reader = OplogReader({"path": d})
    pushed = [EqualTo(("shard",), 2), GreaterThan(("amount",), 100)]
    residual = list(reader.pushFilters(pushed))
    assert residual == pushed, "all filters must be returned as residual"
    parts = reader.partitions()
    assert len(parts) == 1 and "shard=2-" in parts[0].path

    r2 = OplogReader({"path": d})
    list(r2.pushFilters([In(("shard",), (1, 3))]))
    assert sorted(p.path.split("/")[-1][:8] for p in r2.partitions()) == [
        "shard=1-",
        "shard=3-",
    ]


def test_python_datasource_end_to_end_filter_correctness(spark, tmp_path):
    """Whatever the engine decides to push, the answer must equal the
    unfiltered read filtered in Spark (no over-pruning)."""
    from hyperswitch_data_backfill_spark.sources.pydatasource import (
        register_oplog_source,
    )

    d = str(tmp_path / "oplog")
    for s in range(4):
        _write_oplog(d, s, 8)
    register_oplog_source(spark)
    base = spark.read.format("oplog").option("path", d).load()
    got = base.filter("shard = 1 AND amount >= 200").collect()
    assert len(got) == 6  # i in 2..7 → amount 200..700
    assert all(r["shard"] == 1 and r["amount"] >= 200 for r in got)


def test_python_datasource_no_under_filtering(spark, tmp_path):
    """The inverse bug class of over-pruning: with a shard predicate
    active, rows the FILENAME prune cannot classify — dead-letter rows
    (shard NULL from a corrupt line inside a kept file) and rows from
    files with unparseable names — must still honor the predicate,
    because the shard filters are returned as residual and re-applied
    row-level by Spark."""
    import json as _json

    from hyperswitch_data_backfill_spark.sources.pydatasource import (
        register_oplog_source,
    )

    d = str(tmp_path / "oplog")
    _write_oplog(d, 1, 4, corrupt=True)  # kept file with a dead-letter line
    _write_oplog(d, 2, 4)  # prunable non-matching file
    # unparseable name → never pruned; contains shard-3 rows only
    with open(f"{d}/legacy-dump.jsonl", "w", encoding="utf-8") as fh:
        for i in range(3):
            fh.write(
                _json.dumps(
                    {"op": "insert", "seq": i, "entity_id": i, "amount": i, "shard": 3}
                )
                + "\n"
            )
    register_oplog_source(spark)
    base = spark.read.format("oplog").option("path", d).load()
    got = base.filter("shard = 1").collect()
    assert len(got) == 4 and all(r["shard"] == 1 for r in got), (
        "residual re-apply must drop NULL-shard dead-letter rows and "
        "unparseable-name files' rows from a shard-filtered read"
    )
    # and without a predicate the dead-letter + legacy rows still surface
    allrows = base.collect()
    assert sum(r["_corrupt_record"] is not None for r in allrows) == 1
    assert sum(r["shard"] == 3 for r in allrows if r["shard"] is not None) == 3


def test_python_datasource_stream_reader_offsets(tmp_path):
    """Offset contract unit test: read() advances the file watermark,
    readBetweenOffsets() replays exactly the original slice, and an
    empty poll leaves the offset unchanged."""
    from hyperswitch_data_backfill_spark.sources.pydatasource import (
        OplogStreamReader,
    )

    d = str(tmp_path / "oplog")
    _write_oplog(d, 0, 3)
    r = OplogStreamReader({"path": d})
    start = r.initialOffset()
    rows1, off1 = r.read(start)
    rows1 = list(rows1)
    assert len(rows1) == 3 and off1["last"].startswith("shard=0-")

    # no new files → empty batch, offset unchanged
    rows_empty, off_same = r.read(off1)
    assert list(rows_empty) == [] and off_same == off1

    _write_oplog(d, 1, 4)
    rows2, off2 = r.read(off1)
    assert len(list(rows2)) == 4 and off2["last"].startswith("shard=1-")

    # replay: each batch re-reads exactly its slice
    assert len(list(r.readBetweenOffsets(start, off1))) == 3
    assert len(list(r.readBetweenOffsets(off1, off2))) == 4
    assert len(list(r.readBetweenOffsets(start, off2))) == 7


def test_python_datasource_streaming_end_to_end(spark, tmp_path):
    """readStream through the registered oplog source: availableNow
    replay must surface every clean row plus dead-letter lines."""
    from hyperswitch_data_backfill_spark.sources.pydatasource import (
        register_oplog_source,
    )

    d = str(tmp_path / "oplog")
    for s in range(3):
        _write_oplog(d, s, 5)
    _write_oplog(d, 3, 2, corrupt=True)
    register_oplog_source(spark)
    stream = spark.readStream.format("oplog").option("path", d).load()
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("oplog_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM oplog_stream_test").collect()
    clean = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(clean) == 17 and len(bad) == 1
    assert {r["shard"] for r in clean} == {0, 1, 2, 3}


def test_jdbc_write_roundtrip_and_overwrite(spark, derby_table):
    """S8/JDBC write leg: parallel batched write to Derby, read back
    exactly; overwrite replaces content; connection cap coalesces."""
    from pyspark.sql import functions as F

    from hyperswitch_data_backfill_spark.sinks.jdbc import (
        JdbcSinkConfig,
        write_jdbc,
    )
    from hyperswitch_data_backfill_spark.sources.jdbc import read_jdbc_range

    df = spark.range(100).select(
        F.col("id").cast("int").alias("payment_id"),
        F.concat(F.lit("m"), (F.col("id") % 3).cast("string")).alias("merchant_id"),
        (F.col("id") * 7).alias("amount"),
    ).repartition(8)

    cfg = JdbcSinkConfig(
        url=DERBY_URL,
        table="recon_out",
        mode="overwrite",
        truncate=False,  # Derby can't TRUNCATE via the connector — recreate
        num_partitions=2,
        options={"driver": DERBY_DRIVER},
    )
    write_jdbc(df, cfg)

    src_cfg = JdbcSourceConfig(
        url=DERBY_URL, table="recon_out", options={"driver": DERBY_DRIVER}
    )
    back = read_jdbc_range(
        spark, src_cfg, partition_column='"payment_id"',
        lower_bound=0, upper_bound=100, num_partitions=4,
    )
    got = {(r["payment_id"], r["merchant_id"], r["amount"]) for r in back.collect()}
    want = {(r["payment_id"], r["merchant_id"], r["amount"]) for r in df.collect()}
    assert got == want

    # overwrite replaces, never appends
    write_jdbc(df.filter("payment_id < 10"), cfg)
    assert (
        read_jdbc_range(
            spark, src_cfg, partition_column='"payment_id"',
            lower_bound=0, upper_bound=100, num_partitions=2,
        ).count()
        == 10
    )


def test_postgres_end_to_end_backfill_roundtrip(spark):
    """Opt-in integration twin of the reference's full pipeline shape
    (Postgres replica scan -> event projection; main.rs:190-313): set
    SPARK_GRAFT_PG_URL (jdbc:postgresql://host:port/db, plus optional
    SPARK_GRAFT_PG_USER/SPARK_GRAFT_PG_PASSWORD) on a cluster with the
    postgres JDBC driver jar. Skips cleanly otherwise; the same
    read/write surface is Derby-integration-tested in-container above.

    Writes a small entities table, reads it back range-partitioned with
    a pushed merchant predicate, projects the Kafka event frame, and
    checks exact row parity."""
    import os

    url = os.environ.get("SPARK_GRAFT_PG_URL")
    if not url:
        pytest.skip("no Postgres: set SPARK_GRAFT_PG_URL=jdbc:postgresql://...")
    try:
        spark._jvm.java.lang.Class.forName("org.postgresql.Driver")
    except Exception:
        pytest.skip("postgres JDBC driver jar not on the classpath")

    from hyperswitch_data_backfill_spark.sinks.jdbc import JdbcSinkConfig, write_jdbc
    from hyperswitch_data_backfill_spark.sinks.kafka import event_frame
    from hyperswitch_data_backfill_spark.sources.jdbc import (
        JdbcSourceConfig,
        read_jdbc_range,
    )

    user = os.environ.get("SPARK_GRAFT_PG_USER", "")
    password = os.environ.get("SPARK_GRAFT_PG_PASSWORD", "")
    table = "it_backfill_entities"
    src = spark.createDataFrame(
        [(i, f"m{i % 3}", i * 100) for i in range(1, 61)],
        "entity_id long, merchant_id string, amount long",
    )
    write_jdbc(
        src,
        JdbcSinkConfig(
            url=url, table=table, mode="overwrite",
            user=user or None, password=password or None, truncate=False,
        ),
    )
    cfg = JdbcSourceConfig(url=url, table=table, user=user, password=password)
    back = read_jdbc_range(
        spark, cfg, partition_column="entity_id",
        lower_bound=1, upper_bound=61, num_partitions=4,
    ).filter("merchant_id = 'm1'")
    events = event_frame(back, ["merchant_id", "entity_id"], "it-topic", "t1")
    got = {r["key"] for r in events.collect()}
    want = {f"m1:{i}" for i in range(1, 61) if i % 3 == 1}
    assert got == want


def test_orc_source_roundtrip_and_pushdown(spark, tmp_path):
    """ORC completes the self-describing-columnar matrix next to
    parquet: byte-equal round-trip through the declarative file source,
    and predicate pushdown reaches the ORC scan just as it does for
    parquet (searchArgument in the plan)."""
    from hyperswitch_data_backfill_spark.catalog import load_table
    from hyperswitch_data_backfill_spark.sources.files import (
        FileSourceConfig,
        read_file_source,
    )
    from tests.conftest import SF_DIR

    orders = load_table(spark, SF_DIR, "orders")
    d = str(tmp_path / "orders_orc")
    orders.write.mode("overwrite").orc(d)
    back = read_file_source(spark, FileSourceConfig(path=d, format="orc"))
    assert back.schema == orders.schema
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in orders.collect()}
    filtered = back.filter(F.col("o_orderstatus") == "O").select("o_orderkey")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_orderstatus" in plan.split(
        "PushedFilters: ["
    )[1].split("]")[0]


def test_avro_source_capability_error_without_module(spark, tmp_path):
    """spark-avro is an external module; without it the declarative
    source must raise a clear capability error (and would pass through
    to the reader when the jar is deployed)."""
    from hyperswitch_data_backfill_spark.sources.files import (
        FileSourceConfig,
        read_file_source,
    )

    try:
        df = read_file_source(
            spark, FileSourceConfig(path=str(tmp_path), format="avro")
        )
        # module present: reading an empty dir may fail later, but the
        # format resolved — nothing more to assert portably
        assert df is not None
    except NotImplementedError as e:
        assert "spark-avro" in str(e)


def test_binary_file_source_feeds_multimodal_decode(spark, tmp_path):
    """S7 extension e2e: files on disk -> binaryFile source -> the REAL
    PNG/WAV codecs (operators/codecs.py) via extract_features. The
    content column is the opaque binary payload the L5 multimodal model
    expects; glob filtering prunes non-media files at the listing."""
    import numpy as np

    from hyperswitch_data_backfill_spark.operators import codecs
    from hyperswitch_data_backfill_spark.operators.multimodal import (
        extract_features,
    )
    from hyperswitch_data_backfill_spark.sources.files import read_binary_files

    img = (np.arange(48).reshape(6, 8) * 5 % 256).astype(np.uint8)
    (tmp_path / "a.png").write_bytes(codecs.encode_png(img))
    pcm = (np.sin(np.arange(800) / 10) * 3000).astype(np.int16).reshape(-1, 1)
    (tmp_path / "b.wav").write_bytes(codecs.encode_wav(pcm, rate=8000))
    (tmp_path / "notes.txt").write_text("not media")

    files = read_binary_files(spark, str(tmp_path), glob="*.{png,wav}")
    assert files.count() == 2  # txt pruned by the glob at listing time

    media = files.select(
        F.monotonically_increasing_id().alias("media_id"),
        F.element_at(F.split(F.col("path"), "\\."), -1).alias("kind"),
        F.col("content").alias("payload"),
    )
    feats = {r["kind"]: r for r in extract_features(media, decode_stub=False).collect()}
    assert feats["png"]["feature"].startswith("png:6x8:mean=")
    assert abs(float(feats["png"]["feature"].split("mean=")[1]) - img.mean()) < 1e-3
    assert feats["wav"]["feature"] == "wav:800x1@8000"
    assert feats["png"]["n_bytes"] == (tmp_path / "a.png").stat().st_size


def test_binary_file_source_recursive_lookup(spark, tmp_path):
    from hyperswitch_data_backfill_spark.sources.files import read_binary_files

    (tmp_path / "sub" / "deeper").mkdir(parents=True)
    (tmp_path / "top.bin").write_bytes(b"t")
    (tmp_path / "sub" / "mid.bin").write_bytes(b"m")
    (tmp_path / "sub" / "deeper" / "leaf.bin").write_bytes(b"l")
    flat = read_binary_files(spark, str(tmp_path), glob="*.bin")
    deep = read_binary_files(spark, str(tmp_path), glob="*.bin", recursive=True)
    assert flat.count() == 1 and deep.count() == 3
    got = {bytes(r["content"]) for r in deep.collect()}
    assert got == {b"t", b"m", b"l"}


def test_xml_source_schema_enforced_and_quarantine(spark, tmp_path):
    """S7 extension: XML interchange (ISO 20022-shaped) with the same
    declared-schema + dead-letter contract as csv/json — malformed
    rowTag elements land in _corrupt_record, clean rows parse typed."""
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
    )

    from hyperswitch_data_backfill_spark.sources.files import (
        FileSourceConfig,
        read_file_source,
        split_corrupt,
    )

    (tmp_path / "pain.xml").write_text(
        "<doc>"
        "<tx><id>1</id><ccy>USD</ccy><amt>10.5</amt></tx>"
        "<tx><id>2</id><ccy>EUR</ccy><amt>20.25</amt></tx>"
        "<tx><id>oops</id><ccy>GBP</ccy><amt>not-a-number</amt></tx>"
        "</doc>"
    )
    schema = StructType([
        StructField("id", LongType()),
        StructField("ccy", StringType()),
        StructField("amt", DoubleType()),
    ])
    cfg = FileSourceConfig(
        path=str(tmp_path / "pain.xml"), format="xml", schema=schema,
        options={"rowTag": "tx"},
    )
    clean, bad = split_corrupt(read_file_source(spark, cfg))
    rows = {r["id"]: (r["ccy"], r["amt"]) for r in clean.collect()}
    assert rows == {1: ("USD", 10.5), 2: ("EUR", 20.25)}
    # quarantine queries must project >= 1 data column (Spark's
    # QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction — documented in the
    # xml branch of read_file_source); full-row collect qualifies
    quarantined = bad.collect()
    assert len(quarantined) == 1
    # the raw element is preserved for triage (unlike json, the XML
    # reader nulls ALL typed fields of a failed row rather than keeping
    # the ones that parsed — the raw record is the recovery source)
    assert "not-a-number" in quarantined[0]["_corrupt_record"]
    assert "GBP" in quarantined[0]["_corrupt_record"]

    # contract errors are loud
    import pytest as _pytest

    with _pytest.raises(ValueError, match="rowTag"):
        read_file_source(spark, FileSourceConfig(
            path="x.xml", format="xml", schema=schema))
    with _pytest.raises(ValueError, match="schema"):
        read_file_source(spark, FileSourceConfig(
            path="x.xml", format="xml", options={"rowTag": "tx"}))

    # caller options may legally include the reserved reader keys
    # ('mode', 'columnNameOfCorruptRecord' are valid XML options) —
    # dict-merge must not raise TypeError ("multiple values for keyword
    # argument") the kwargs-expansion form produced
    overridden = FileSourceConfig(
        path=str(tmp_path / "pain.xml"), format="xml", schema=schema,
        options={"rowTag": "tx", "mode": "PERMISSIVE",
                 "columnNameOfCorruptRecord": "_corrupt_record"},
    )
    assert read_file_source(spark, overridden).count() == 3  # no TypeError


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_RUN_JDBC_BENCH") != "1",
    reason="timing bench: set SPARK_GRAFT_RUN_JDBC_BENCH=1 (BENCH_NOTES round-7 records the 1M-row run)",
)
def test_jdbc_parallel_read_beats_single_stream(spark):
    """r6 verdict item 7 (gated mirror of tools/jdbc_bench.py): at 500k
    rows the 8-way range-partitioned read must beat the single-stream
    read ≥1.3× (embedded Derby's lock manager caps the ratio well below
    8× — see BENCH_NOTES; 2.09× measured at 1M rows), and a pushed
    filter must cut transferred rows, not post-filter them."""
    import time

    from hyperswitch_data_backfill_spark.sources.jdbc import read_jdbc_range

    url = "jdbc:derby:memory:jdbcparbench"
    rows = 500_000
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url + ";create=true")
    st = conn.createStatement()
    st.execute(
        'CREATE TABLE payment_intent ("payment_id" INT PRIMARY KEY, '
        '"amount" BIGINT, "status" VARCHAR(8))'
    )
    conn.setAutoCommit(False)
    ps = conn.prepareStatement("INSERT INTO payment_intent VALUES (?, ?, ?)")
    for i in range(rows):
        ps.setInt(1, i)
        ps.setLong(2, i * 3)
        ps.setString(3, "OK" if i % 97 else "FAIL")
        ps.addBatch()
        if (i + 1) % 20_000 == 0:
            ps.executeBatch()
            conn.commit()
    ps.executeBatch()
    conn.commit()
    conn.close()

    cfg = JdbcSourceConfig(
        url=url, table="payment_intent",
        options={"driver": "org.apache.derby.jdbc.EmbeddedDriver"},
    )

    def read(nparts):
        return read_jdbc_range(
            spark, cfg, partition_column='"payment_id"',
            lower_bound=0, upper_bound=rows - 1, num_partitions=nparts,
        )

    def best_of(build, n=3):
        build().count()  # warm-up
        walls = []
        for _ in range(n):
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
        return min(walls)

    t_single = best_of(lambda: read(1))
    t_par = best_of(lambda: read(8))
    assert t_single / t_par >= 1.3, (
        f"8-way partitioned read not faster: single={t_single:.3f}s "
        f"parallel={t_par:.3f}s"
    )

    from pyspark.sql import functions as F

    filtered = read(8).filter(F.col("status") == "FAIL")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "status" in plan, plan[:1500]
    assert filtered.count() == sum(1 for i in range(rows) if i % 97 == 0)
