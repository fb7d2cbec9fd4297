"""Logical-replication CDC source (sources/pgwire_cdc.py).

Two layers, same stance as test_pgwire.py:
- pure-codec units: LSN text form, the pgoutput binary grammar
  (Begin/Commit/Relation/Insert/Update/Delete, TupleData kinds) on
  hand-built bytes — no server;
- end-to-end against a REAL PostgreSQL 15 server in logical WAL mode:
  slot creation over the wire (CREATE_REPLICATION_SLOT), commit-ordered
  streaming under out-of-order commits, kill-and-resume exactly-once on
  LSN offsets, deterministic replay, slot advancement on checkpoint
  commit, and the fixture key vs the DuckDB oracle.
"""

from __future__ import annotations

import struct
import time
from datetime import datetime
from types import SimpleNamespace

import pytest

from hyperswitch_data_backfill_spark.sources.pgwire import (
    PgServer,
    PgServerUnavailable,
)
from hyperswitch_data_backfill_spark.sources.pgwire_cdc import (
    PgCdcStreamReader,
    PgReplicationConnection,
    _parse_tuple_data,
    create_cdc_publication_and_slot,
    int_to_lsn,
    lsn_to_int,
    parse_pgoutput,
)

# ---------------------------------------------------------------- units


class TestLsn:
    def test_roundtrip(self):
        assert lsn_to_int("16/B374D848") == (0x16 << 32) | 0xB374D848
        assert int_to_lsn((0x16 << 32) | 0xB374D848) == "16/B374D848"
        assert lsn_to_int("0/0") == 0 and int_to_lsn(0) == "0/0"

    def test_rejects_non_lsn(self):
        with pytest.raises(ValueError, match="LSN"):
            lsn_to_int("deadbeef")


def _tuple_bytes(*vals) -> bytes:
    out = struct.pack(">h", len(vals))
    for v in vals:
        if v is None:
            out += b"n"
        elif v == "TOAST":
            out += b"u"
        else:
            enc = v.encode()
            out += b"t" + struct.pack(">i", len(enc)) + enc
    return out


class TestPgoutputGrammar:
    def test_begin_commit(self):
        ts = 820_454_400_000_000  # 2025-12-31T00:00:00Z in pg micros
        msg = parse_pgoutput(b"B" + struct.pack(">qqi", 1234, ts, 77))
        assert msg == ("B", 1234, datetime(2025, 12, 31), 77)
        msg = parse_pgoutput(b"C" + struct.pack(">bqqq", 0, 1234, 1300, ts))
        assert msg == ("C", 1234, 1300, datetime(2025, 12, 31))

    def test_relation(self):
        body = (b"R" + struct.pack(">i", 42) + b"public\x00tbl\x00f"
                + struct.pack(">h", 2)
                + b"\x01k\x00" + struct.pack(">ii", 20, -1)
                + b"\x00v\x00" + struct.pack(">ii", 25, -1))
        assert parse_pgoutput(body) == (
            "R", 42, "public", "tbl", [("k", 20, -1), ("v", 25, -1)])

    def test_insert_update_delete(self):
        ins = b"I" + struct.pack(">i", 42) + b"N" + _tuple_bytes("1", "a")
        assert parse_pgoutput(ins) == ("I", 42, ["1", "a"])
        upd = (b"U" + struct.pack(">i", 42)
               + b"O" + _tuple_bytes("1", "a")
               + b"N" + _tuple_bytes("1", "b"))
        assert parse_pgoutput(upd) == ("U", 42, ["1", "a"], ["1", "b"])
        upd_no_old = b"U" + struct.pack(">i", 42) + b"N" + _tuple_bytes("2")
        assert parse_pgoutput(upd_no_old) == ("U", 42, None, ["2"])
        dele = b"D" + struct.pack(">i", 42) + b"K" + _tuple_bytes("1", None)
        assert parse_pgoutput(dele) == ("D", 42, ["1", None])

    def test_tuple_kinds(self):
        vals, _ = _parse_tuple_data(_tuple_bytes("x", None, "TOAST"), 0)
        assert vals == ["x", None, None]  # unchanged TOAST → None

    def test_refuses_unknown_message_and_kind(self):
        from hyperswitch_data_backfill_spark.sources.pgwire import (
            PgProtocolError,
        )

        with pytest.raises(PgProtocolError, match="unknown pgoutput"):
            parse_pgoutput(b"Z123")
        with pytest.raises(PgProtocolError, match="column kind"):
            _parse_tuple_data(struct.pack(">h", 1) + b"b\x00\x00\x00\x00", 0)

    def test_skipped_kinds(self):
        assert parse_pgoutput(b"T" + b"\x00" * 9)[0] == "skip"
        assert parse_pgoutput(b"Y" + b"\x00" * 4 + b"ns\x00nm\x00")[0] \
            == "skip"


# ------------------------------------------------------------ real server


@pytest.fixture(scope="module")
def pg():
    try:
        with PgServer(logical=True) as server:
            yield server
    except PgServerUnavailable as exc:
        pytest.skip(f"no usable PostgreSQL server binaries: {exc}")


@pytest.fixture()
def cdc(pg):
    """A table + publication + wire-created slot, torn down after."""
    with pg.connect() as conn:
        conn.execute("CREATE TABLE ct (k bigint PRIMARY KEY,"
                     " v text, amt bigint)")
        conn.execute("INSERT INTO ct VALUES (1,'a',10),(2,'b',20),"
                     "(3,'c',30)")
    kw = dict(host=pg.host, port=pg.port, user=pg.user,
              database=pg.database)
    pt = create_cdc_publication_and_slot(kw, "ct", "ts_slot", "ts_pub")
    yield SimpleNamespace(kw=kw, consistent_point=pt)
    with pg.connect() as conn:
        conn.execute("SELECT pg_drop_replication_slot('ts_slot')")
        conn.execute("DROP PUBLICATION ts_pub")
        conn.execute("DROP TABLE ct")


def _reader(pg, **extra) -> PgCdcStreamReader:
    opts = {"port": str(pg.port), "host": pg.host, "user": pg.user,
            "table": "ct", "slot": "ts_slot", "publication": "ts_pub",
            "quietms": "60"}
    opts.update(extra)
    schema = SimpleNamespace(fields=[
        SimpleNamespace(name=n)
        for n in ("op", "lsn", "xid", "seq", "commit_ts", "k", "v", "amt")
    ])
    return PgCdcStreamReader(schema, opts)


def _drain(reader, offset, want, deadline_s=15.0):
    """read() until ``want`` change rows arrive (WAL flush lag is up to
    wal_writer_delay=10ms on the logical test server)."""
    rows = []
    deadline = time.monotonic() + deadline_s
    while len(rows) < want:
        if time.monotonic() > deadline:
            raise TimeoutError(f"only {len(rows)}/{want}: {rows}")
        batch, offset = reader.read(offset)
        rows.extend(batch)
        if len(rows) < want:
            time.sleep(0.02)
    return rows, offset


class TestCdcStream:
    def test_changes_stream_typed_and_ordered(self, pg, cdc):
        r = _reader(pg)
        o0 = r.initialOffset()
        assert o0 == {"lsn": cdc.consistent_point}
        with pg.connect() as c:
            c.execute("UPDATE ct SET amt = amt + 5 WHERE k = 2")
            c.execute("DELETE FROM ct WHERE k = 3")
            c.execute("INSERT INTO ct VALUES (4,'d',40)")
        rows, o1 = _drain(r, o0, 3)
        ops = [(row[0], row[5], row[6], row[7]) for row in rows]
        assert ops == [
            ("U", 2, "b", 25),     # new tuple, typed by Relation OIDs
            ("D", 3, "c", 30),     # REPLICA IDENTITY FULL old tuple
            ("I", 4, "d", 40),
        ]
        lsns = [row[1] for row in rows]
        assert lsns == sorted(lsns)           # commit order
        assert o1["lsn"] >= max(lsns)
        # idle poll: offset may advance with the WAL head, never regress
        batch, o2 = r.read(o1)
        assert list(batch) == [] and o2["lsn"] >= o1["lsn"]

    def test_out_of_order_commits_arrive_in_commit_order(self, pg, cdc):
        """The race the keyset tail needs a snapshot fence for cannot
        exist here: the WAL streams whole transactions in COMMIT order,
        so the later-committed UPDATE arrives after the DELETE even
        though its statement ran first."""
        r = _reader(pg)
        o0 = r.initialOffset()
        a = pg.connect()
        try:
            a.execute("BEGIN")
            a.execute("UPDATE ct SET amt = 111 WHERE k = 1")
            with pg.connect() as b:
                b.execute("DELETE FROM ct WHERE k = 2")  # commits FIRST
            a.execute("COMMIT")
        finally:
            a.close()
        rows, _o1 = _drain(r, o0, 2)
        assert [(row[0], row[5]) for row in rows] == [("D", 2), ("U", 1)]
        assert rows[0][1] < rows[1][1]  # strictly increasing commit LSN

    def test_kill_and_resume_exactly_once(self, pg, cdc):
        """Offsets are LSNs: a NEW reader (a restarted query resuming
        from the checkpoint) continues from the stored offset with no
        duplicated and no lost change; replay of a consumed window is
        byte-identical."""
        r1 = _reader(pg)
        o0 = r1.initialOffset()
        with pg.connect() as c:
            c.execute("INSERT INTO ct VALUES (10,'x',100)")
        batch1, o1 = _drain(r1, o0, 1)
        del r1                                   # the "kill"
        with pg.connect() as c:
            c.execute("INSERT INTO ct VALUES (11,'y',110)")
            c.execute("UPDATE ct SET amt = 101 WHERE k = 10")
        r2 = _reader(pg)                         # the "resume"
        batch2, o2 = _drain(r2, o1, 2)
        keys = [(row[0], row[5]) for row in batch1 + batch2]
        assert keys == [("I", 10), ("I", 11), ("U", 10)]  # once each
        # deterministic replay of the first window, twice
        a = [tuple(x) for x in r2.readBetweenOffsets(o0, o1)]
        b = [tuple(x) for x in r2.readBetweenOffsets(o0, o1)]
        assert a == b
        assert [(row[0], row[5]) for row in a] == [("I", 10)]
        assert list(r2.readBetweenOffsets(o1, o1)) == []

    def test_commit_advances_slot_idempotently(self, pg, cdc):
        r = _reader(pg)
        o0 = r.initialOffset()
        with pg.connect() as c:
            c.execute("INSERT INTO ct VALUES (20,'z',200)")
        _rows, o1 = _drain(r, o0, 1)
        r.commit(o1)
        with pg.connect() as c:
            _cols, rows = c.query(
                "SELECT confirmed_flush_lsn::text FROM"
                " pg_replication_slots WHERE slot_name = 'ts_slot'")
        assert lsn_to_int(rows[0][0]) >= o1["lsn"]
        r.commit(o1)  # re-commit after restart: a no-op, not an error
        r.commit(o0)  # stale commit (already past): also a no-op

    def test_missing_slot_refused(self, pg, cdc):
        r = _reader(pg, slot="no_such_slot")
        with pytest.raises(ValueError, match="does not exist"):
            r.initialOffset()


def test_spark_checkpoint_kill_and_resume_exactly_once(pg, spark, tmp_path):
    """The engine-level twin of the direct-reader kill/resume: a real
    StreamingQuery with a checkpoint + fault-tolerant parquet sink is
    stopped mid-stream, MORE transactions land while it is down, and a
    restarted query with the same checkpoint delivers the backlog with
    no duplicated and no lost change row — Spark replays the last
    uncommitted batch via readBetweenOffsets and the slot only ever
    confirms through commit(), so this drives both replay paths under
    the real engine."""
    import time as _t

    from hyperswitch_data_backfill_spark.sources.pgwire_cdc import (
        create_cdc_publication_and_slot,
        read_pgwire_cdc_stream,
    )

    with pg.connect() as conn:
        conn.execute("CREATE TABLE ckpt_t (k bigint PRIMARY KEY, v text)")
    kw = dict(host=pg.host, port=pg.port, user=pg.user,
              database=pg.database)
    create_cdc_publication_and_slot(kw, "ckpt_t", "ck_slot", "ck_pub")
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def start():
        return (
            read_pgwire_cdc_stream(
                spark, pg.host, pg.port, "ckpt_t", "ck_slot", "ck_pub",
                user=pg.user, database=pg.database, quiet_ms=60)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="200 milliseconds")
            .start()
        )

    def sink_keys():
        try:
            return sorted(
                r["k"] for r in spark.read.parquet(out).collect())
        except Exception:
            return []

    def wait_for(n, q, deadline_s=60.0):
        t0 = _t.monotonic()
        while len(sink_keys()) < n:
            if q.exception() is not None:
                raise q.exception()
            assert _t.monotonic() - t0 < deadline_s, sink_keys()
            _t.sleep(0.2)

    q1 = start()
    try:
        with pg.connect() as c:
            c.execute("INSERT INTO ckpt_t VALUES (1,'a'),(2,'b')")
            c.execute("UPDATE ckpt_t SET v = 'a2' WHERE k = 1")
        wait_for(3, q1)                      # 2 inserts + 1 update
    finally:
        q1.stop()                            # the "kill"
    q1.awaitTermination(30)
    with pg.connect() as c:                  # backlog while down
        c.execute("INSERT INTO ckpt_t VALUES (3,'c')")
        c.execute("DELETE FROM ckpt_t WHERE k = 2")
    q2 = start()                             # the "resume", same ckpt
    try:
        wait_for(5, q2)
    finally:
        q2.stop()
    q2.awaitTermination(30)
    rows = sorted(
        (r["op"], r["k"]) for r in spark.read.parquet(out).collect())
    assert rows == [("D", 2), ("I", 1), ("I", 2), ("I", 3), ("U", 1)]
    with pg.connect() as conn:  # teardown
        conn.execute("SELECT pg_drop_replication_slot('ck_slot')")
        conn.execute("DROP PUBLICATION ck_pub")
        conn.execute("DROP TABLE ckpt_t")


def test_cdc_fixture_matches_oracle(spark, duck):
    from hyperswitch_data_backfill_spark.sources.pgwire_cdc import (
        stream_pgwire_cdc,
    )

    try:
        df = stream_pgwire_cdc(
            spark,
            __import__("os").environ.get(
                "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"))
    except PgServerUnavailable as exc:
        pytest.skip(f"no usable PostgreSQL server binaries: {exc}")
    from tests.conftest import assert_oracle_match

    from hyperswitch_data_backfill_spark.registry import REGISTRY

    assert_oracle_match(
        df, duck, REGISTRY["stream_pgwire_cdc"].oracle,
        "stream_pgwire_cdc")
