"""`readStream.format("pgrepl")`: the replication slot as a
Structured Streaming source — LSN offsets checkpointed by Spark,
slot advanced on commit, applied through the distributed CDC path
into a second store over a real TCP socket."""

import pytest

from xtdb_spark.pgwire import PgWireServer
from xtdb_spark.session import XtdbSession
from xtdb_spark.sources.pg_repl import (LogicalReplicationClient,
                                        ReplicationError)
from xtdb_spark.streaming.pgrepl import replicate_stream
from xtdb_spark.tx import TableStore


@pytest.fixture()
def xt(spark, tmp_path):
    s = XtdbSession.__new__(XtdbSession)
    s.spark = spark
    s.store = TableStore(spark, str(tmp_path / "wh_pub"))
    s.sql = XtdbSession.sql.__get__(s)
    s.scan = XtdbSession.scan.__get__(s)
    return s


@pytest.fixture()
def server(xt):
    srv = PgWireServer(xt, port=0).start()
    yield srv
    srv.stop()


@pytest.fixture()
def sub_store(spark, tmp_path):
    return TableStore(spark, str(tmp_path / "wh_sub"))


def _cli(server, slot):
    return LogicalReplicationClient("127.0.0.1", server.port,
                                    slot=slot).connect()


def _current(store, table):
    return sorted((str(r["_id"]), r["name"], str(r["n"]))
                  for r in store.scan(table).collect())


def test_read_slot_and_advance(xt, server):
    cli = _cli(server, "ctrl")
    try:
        with pytest.raises(ReplicationError, match="does not exist"):
            cli.read_slot()
        cli.create_slot()
        head = cli.read_slot()
        xt.store.put("cdocs", [{"_id": 1, "name": "c", "n": 1}])
        assert cli.read_slot() == head          # not advanced yet
        from xtdb_spark.replication import parse_lsn
        new_head = parse_lsn(cli.identify_system()["xlogpos"])
        cli.advance(new_head)
        assert parse_lsn(cli.read_slot()) == new_head
        with pytest.raises(ReplicationError, match="does not exist"):
            LogicalReplicationClient(
                "127.0.0.1", server.port, slot="ghost") \
                .connect().advance(7)
    finally:
        cli.close()


def test_slow_publisher_does_not_truncate_batch(spark, xt, server,
                                                sub_store, tmp_path,
                                                monkeypatch):
    """A publisher that takes longer than the old 1.5 s idle window
    to render ONE tx's wal2json must not cause the batch to return
    early (which would let commit() advance the slot past unread
    changes, losing them forever). The reader now requires positive
    proof — a keepalive at/past the range end — before finishing.
    The walsender runs in THIS process, so delaying changes_for_tx
    here slows the publisher while the executor-side reader is
    untouched."""
    import time

    import xtdb_spark.replication as repl

    pub = xt.store
    c = _cli(server, "slowslot")
    c.create_slot()
    c.close()

    pub.put("wdocs", [{"_id": 1, "name": "a", "n": 1}])
    pub.put("wdocs", [{"_id": 2, "name": "b", "n": 2}])
    pub.put("wdocs", [{"_id": 3, "name": "c", "n": 3}])

    real = repl.changes_for_tx

    def slow(warehouse, txid, tables=None):
        time.sleep(2.2)          # > the reader's 1.5 s poll window
        return real(warehouse, txid, tables)

    monkeypatch.setattr(repl, "changes_for_tx", slow)
    replicate_stream(spark, sub_store, "127.0.0.1", server.port,
                     "slowslot", str(tmp_path / "ck_slow"))
    monkeypatch.setattr(repl, "changes_for_tx", real)

    # every tx arrived — nothing was dropped behind the slot advance
    assert _current(sub_store, "wdocs") == _current(pub, "wdocs") == [
        ("1", "a", "1"), ("2", "b", "2"), ("3", "c", "3")]
    # and a fresh checkpoint replays nothing (slot fully advanced)
    n_events = sub_store.events("wdocs").count()
    replicate_stream(spark, sub_store, "127.0.0.1", server.port,
                     "slowslot", str(tmp_path / "ck_slow2"))
    assert sub_store.events("wdocs").count() == n_events


def test_mid_tx_stall_at_boundary_lsn_does_not_truncate(
        spark, xt, server, sub_store, tmp_path, monkeypatch):
    """Round-9 ADVICE regression: an XLogData wal_start == range-end
    is NOT completion proof — a multi-line tx shares one lsn across
    lines. A boundary tx that stalls >1.5 s BETWEEN its own lines
    used to make poll() go quiet with last_wal_end == end; read()
    returned the partial tx and commit() advanced the slot past the
    missing lines — silent loss. Only a keepalive walEnd ≥ end may
    complete the range now. The walsender runs in this process, so
    stalling changes_for_tx mid-iteration stalls the sender only."""
    import time

    import xtdb_spark.replication as repl

    pub = xt.store
    c = _cli(server, "midslot")
    c.create_slot()
    c.close()

    pub.put("mdocs", [{"_id": 1, "name": "a", "n": 1}])
    # boundary tx: several rows = several wal2json lines, ONE lsn
    pub.put("mdocs", [{"_id": 2, "name": "b", "n": 2},
                      {"_id": 3, "name": "c", "n": 3}])

    real = repl.changes_for_tx

    def stalling(warehouse, txid, tables=None):
        lines = list(real(warehouse, txid, tables))

        def gen():
            yield lines[0]
            if len(lines) > 1:
                time.sleep(2.2)   # > the reader's 1.5 s poll window
                yield from lines[1:]
        return gen()

    monkeypatch.setattr(repl, "changes_for_tx", stalling)
    replicate_stream(spark, sub_store, "127.0.0.1", server.port,
                     "midslot", str(tmp_path / "ck_mid"))
    monkeypatch.setattr(repl, "changes_for_tx", real)

    assert _current(sub_store, "mdocs") == _current(pub, "mdocs") == [
        ("1", "a", "1"), ("2", "b", "2"), ("3", "c", "3")]


def test_reader_times_out_rather_than_truncating(xt, server):
    """If proof of reaching the range end never arrives, the reader
    must FAIL (Spark then retries the task) — never return early and
    let commit() advance the slot past unread changes. Exercised by
    asking for a range end beyond anything the publisher will ever
    reach."""
    from xtdb_spark.streaming.pgrepl import PgReplStreamReader, _LsnRange

    c = _cli(server, "toslot")
    c.create_slot()
    c.close()
    xt.store.put("todocs", [{"_id": 1, "name": "x", "n": 1}])

    rdr = PgReplStreamReader({"host": "127.0.0.1",
                              "port": str(server.port),
                              "slot": "toslot", "create": "false",
                              "readTimeout": "4"})
    start = rdr.initialOffset()["lsn"]
    part = _LsnRange("127.0.0.1", server.port, "toslot", "xtdb",
                     "xtdb", start, 2**62, read_timeout=4.0)
    rows = []
    with pytest.raises(TimeoutError, match="no proof"):
        for r in rdr.read(part):
            rows.append(r)
    # the committed change WAS delivered before the failure — nothing
    # is silently dropped, the range just can't complete
    assert len(rows) == 1


def test_pgrepl_stream_end_to_end(spark, xt, server, sub_store,
                                  tmp_path):
    pub = xt.store
    ck = str(tmp_path / "ck")
    c = _cli(server, "srcslot")
    c.create_slot()
    c.close()

    pub.put("sdocs", [{"_id": 1, "name": "a", "n": 10},
                      {"_id": 2, "name": "b", "n": 20},
                      {"_id": 3, "name": "c", "n": 30}])
    replicate_stream(spark, sub_store, "127.0.0.1", server.port,
                     "srcslot", ck)
    assert _current(sub_store, "sdocs") == [
        ("1", "a", "10"), ("2", "b", "20"), ("3", "c", "30")]

    # incremental batch: update + delete; same checkpoint resumes
    pub.put("sdocs", [{"_id": 2, "name": "b2", "n": 21}])
    pub.delete("sdocs", [3])
    replicate_stream(spark, sub_store, "127.0.0.1", server.port,
                     "srcslot", ck)
    assert _current(sub_store, "sdocs") == _current(pub, "sdocs")

    # the commit advanced the slot: a FRESH checkpoint replays
    # nothing and the subscriber stays converged
    n_events = sub_store.events("sdocs").count()
    replicate_stream(spark, sub_store, "127.0.0.1", server.port,
                     "srcslot", str(tmp_path / "ck2"))
    assert sub_store.events("sdocs").count() == n_events
    assert _current(sub_store, "sdocs") == _current(pub, "sdocs")
