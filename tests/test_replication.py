"""Live logical-replication e2e: the pgwire publisher
(xtdb_spark/replication.py) streams wal2json over a real TCP socket
to the pure-Python protocol client (sources/pg_repl.py), applied
into a SECOND store through the standard CDC path (sources/cdc.py)
— the full reference postgres-source loop
(PostgresSource.kt:42-220) with both halves executed."""

import pytest

from xtdb_spark.pgwire import PgWireServer
from xtdb_spark.session import XtdbSession
from xtdb_spark.sources.cdc import (postgres_replication_stream,
                                    replicate_slot_to_store)
from xtdb_spark.sources.pg_repl import (LogicalReplicationClient,
                                        ReplicationError)
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


def _cli(server, slot="s1"):
    return LogicalReplicationClient("127.0.0.1", server.port,
                                    slot=slot).connect()


def _current(store, table):
    rows = store.scan(table).collect()
    return sorted((str(r["_id"]), r["name"], str(r["n"])) for r in rows)


def test_identify_and_slot_lifecycle(server):
    cli = _cli(server)
    try:
        ident = cli.identify_system()
        assert ident["timeline"] == 1
        assert "/" in ident["xlogpos"]
        point = cli.create_slot()
        assert "/" in point
        with pytest.raises(ReplicationError, match="already exists"):
            cli.create_slot()
        assert cli.create_slot(if_not_exists=True) is None
        cli.drop_slot()
        with pytest.raises(ReplicationError, match="does not exist"):
            cli.drop_slot()
    finally:
        cli.close()


def test_slot_grammar_variants(xt, server):
    # TEMPORARY keyword, plugin options, physical-slot refusal
    cli = _cli(server, slot="gram")
    try:
        r = cli._query_rows(
            "CREATE_REPLICATION_SLOT gram TEMPORARY LOGICAL wal2json")[0]
        assert r[0] == "gram" and r[3] == "wal2json"
        xt.store.put("gdocs", [{"_id": 1, "name": "g", "n": 1}])
        cli._send(b"Q", cli._cstr(
            "START_REPLICATION SLOT gram LOGICAL 0/0 "
            "(\"format-version\" '2')"))
        t, _ = cli._recv_frame()
        assert t == b"W"
        cli.streaming = True
        changes = list(cli.poll(max_wait=3.0))
        assert len(changes) == 1 and '"g"' in changes[0][1]
        cli.stop()
        with pytest.raises(ReplicationError, match="LOGICAL"):
            cli._query_rows("CREATE_REPLICATION_SLOT phys PHYSICAL")
    finally:
        cli.close()


def test_replicate_e2e(spark, xt, server, sub_store):
    pub = xt.store
    cli = postgres_replication_stream("127.0.0.1", server.port,
                                      "xtdb", "e2e")
    try:
        # txs AFTER slot creation: inserts, an update, a delete
        pub.put("repl_docs", [{"_id": 1, "name": "a", "n": 10},
                              {"_id": 2, "name": "b", "n": 20},
                              {"_id": 3, "name": "c", "n": 30}])
        pub.put("repl_docs", [{"_id": 2, "name": "b2", "n": 21}])
        pub.delete("repl_docs", [3])
        applied = replicate_slot_to_store(spark, sub_store, cli,
                                          max_wait=3.0)
        assert applied >= 5          # 3 inserts + 1 update + 1 delete
        assert _current(sub_store, "repl_docs") == [
            ("1", "a", "10"), ("2", "b2", "21")]
        assert _current(sub_store, "repl_docs") == sorted(
            (str(r["_id"]), r["name"], str(r["n"]))
            for r in pub.scan("repl_docs").collect())
    finally:
        cli.stop()
        cli.close()


def test_resume_after_ack_skips_delivered(spark, xt, server, sub_store):
    pub = xt.store
    cli = _cli(server, slot="resume")
    cli.create_slot()
    cli.start()
    pub.put("resume_docs", [{"_id": 1, "name": "x", "n": 1}])
    applied = replicate_slot_to_store(spark, sub_store, cli, max_wait=3.0)
    assert applied == 1
    cli.stop()
    cli.close()

    # new tx while disconnected; reconnect resumes AFTER the ack
    pub.put("resume_docs", [{"_id": 2, "name": "y", "n": 2}])
    cli2 = _cli(server, slot="resume")
    cli2.start()
    try:
        changes = list(cli2.poll(max_wait=3.0))
        assert len(changes) == 1
        assert '"y"' in changes[0][1]
    finally:
        cli2.stop()
        cli2.close()


def test_pg_replication_slots_view(xt, server):
    cli = _cli(server, slot="viewslot")
    try:
        cli.create_slot()
        xt.store.put("vdocs", [{"_id": 1, "name": "v", "n": 0}])
        rows = xt.sql("SELECT slot_name, plugin, slot_type, lag_txs "
                      "FROM pg_replication_slots").collect()
        assert [(r["slot_name"], r["plugin"], r["slot_type"], r["lag_txs"])
                for r in rows] == [("viewslot", "wal2json", "logical", 1)]
        cli.drop_slot()
        assert xt.sql("SELECT * FROM pg_catalog.pg_replication_slots") \
                 .count() == 0
    finally:
        cli.close()


def test_bootstrap_subscriber_snapshot_then_stream(spark, xt, server,
                                                   sub_store):
    from xtdb_spark.sources.cdc import bootstrap_subscriber

    pub = xt.store
    # pre-slot history: the stream can never deliver these — only the
    # snapshot can (the reference's initialSnapshot role)
    pub.put("boot_docs", [{"_id": 1, "name": "a", "n": 10},
                          {"_id": 2, "name": "b", "n": 20}])
    pub.put("boot_other", [{"_id": 7, "name": "o", "n": 70}])
    cli = bootstrap_subscriber(spark, sub_store, "127.0.0.1",
                               server.port, "bootslot")
    try:
        assert _current(sub_store, "boot_docs") == \
            _current(pub, "boot_docs")
        assert _current(sub_store, "boot_other") == \
            _current(pub, "boot_other")
        # post-snapshot txs arrive via the stream
        pub.put("boot_docs", [{"_id": 2, "name": "b2", "n": 21}])
        pub.delete("boot_docs", [1])
        applied = replicate_slot_to_store(spark, sub_store, cli,
                                          max_wait=3.0)
        assert applied >= 2
        assert _current(sub_store, "boot_docs") == \
            _current(pub, "boot_docs")
    finally:
        cli.stop()
        cli.close()


def test_two_independent_subscribers(spark, xt, server, tmp_path):
    """Two slots, two subscriber stores, interleaved multi-table txs;
    subscriber B lags (no ack between drains). Both converge to the
    publisher and the slots track independently in
    pg_replication_slots."""
    pub = xt.store
    sub_a = TableStore(spark, str(tmp_path / "sub_a"))
    sub_b = TableStore(spark, str(tmp_path / "sub_b"))
    ca = _cli(server, slot="twin_a")
    cb = _cli(server, slot="twin_b")
    ca.create_slot()
    cb.create_slot()
    ca.start()

    pub.put("tw_x", [{"_id": 1, "name": "x1", "n": 1}])
    pub.put("tw_y", [{"_id": 9, "name": "y1", "n": 9}])
    pub.put("tw_x", [{"_id": 1, "name": "x2", "n": 2}])
    try:
        applied_a = replicate_slot_to_store(spark, sub_a, ca,
                                            max_wait=3.0)
        assert applied_a >= 3
        assert _current(sub_a, "tw_x") == _current(pub, "tw_x")
        assert _current(sub_a, "tw_y") == _current(pub, "tw_y")

        # B hasn't even started streaming: its slot is still parked
        lags = {r["slot_name"]: r["lag_txs"] for r in xt.sql(
            "SELECT slot_name, lag_txs FROM pg_replication_slots")
            .collect()}
        assert lags["twin_a"] == 0 and lags["twin_b"] >= 3

        cb.start()
        applied_b = replicate_slot_to_store(spark, sub_b, cb,
                                            max_wait=3.0)
        assert applied_b >= 3
        assert _current(sub_b, "tw_x") == _current(pub, "tw_x")
        assert _current(sub_b, "tw_y") == _current(pub, "tw_y")
    finally:
        ca.stop(); ca.close()
        cb.stop(); cb.close()


def test_redelivery_without_ack(xt, server):
    pub = xt.store
    cli = _cli(server, slot="redeliver")
    cli.create_slot()
    cli.start()
    pub.put("redeliver_docs", [{"_id": 1, "name": "r", "n": 7}])
    first = list(cli.poll(max_wait=3.0))
    assert len(first) == 1
    cli.stop()          # NO ack — confirmed_flush unchanged
    cli.close()

    cli2 = _cli(server, slot="redeliver")
    cli2.start()
    try:
        again = list(cli2.poll(max_wait=3.0))
        # at-least-once: same change, same LSN — the apply side's
        # LSN-keyed last-write-wins makes the replay idempotent
        assert [lsn for lsn, _ in again] == [lsn for lsn, _ in first]
        assert [p for _, p in again] == [p for _, p in first]
    finally:
        cli2.stop()
        cli2.close()


def test_compaction_retains_unacked_slot_data(spark, xt, server,
                                              sub_store):
    """Slot-retained WAL: compaction consumes the tx-stamped event
    files, but txs a slot hasn't acked must still stream — archived
    to _wal/ at consumption, trimmed after the ack (the documented
    slot-vs-compaction caveat, now closed)."""
    import glob
    import os

    pub = xt.store
    cli = _cli(server, slot="retain")
    cli.create_slot()

    pub.put("rt_docs", [{"_id": 1, "name": "a", "n": 1}])
    pub.put("rt_docs", [{"_id": 2, "name": "b", "n": 2}])
    pub.put("rt_docs", [{"_id": 1, "name": "a2", "n": 3}])
    pub.delete("rt_docs", [2])
    # FULL rewrite: every part-xt file in the table is consumed
    pub.optimize("rt_docs", full=True)
    assert not glob.glob(os.path.join(pub._path("rt_docs"),
                                      "part-xt*.parquet"))
    wal = glob.glob(os.path.join(pub.warehouse, "_wal", "*.jsonl"))
    assert len(wal) == 4

    cli.start()
    try:
        applied = replicate_slot_to_store(spark, sub_store, cli,
                                          max_wait=3.0)
        assert applied == 4
        assert _current(sub_store, "rt_docs") == \
            _current(pub, "rt_docs") == [("1", "a2", "3")]
        # ack trimmed the archive
        assert not glob.glob(os.path.join(pub.warehouse, "_wal",
                                          "*.jsonl"))
    finally:
        cli.stop()
        cli.close()


def test_leveled_compaction_also_archives(spark, xt, server):
    import glob
    import os

    pub = xt.store
    cli = _cli(server, slot="lvl")
    cli.create_slot()
    for i in range(5):          # past L0_THRESHOLD
        pub.put("lv_docs", [{"_id": i, "name": f"v{i}", "n": i}])
    pub.compact("lv_docs")
    assert glob.glob(os.path.join(pub.warehouse, "_wal", "*.jsonl"))
    cli.start()
    try:
        changes = list(cli.poll(max_wait=3.0))
        assert len(changes) == 5
        names = sorted(c for _, c in changes)
        assert all('"lv_docs"' in c or "lv_docs" in c for c in names)
    finally:
        cli.stop()
        cli.close()


def test_vacuum_retains_unacked_slot_data(spark, xt, server):
    """Vacuum is the third path that destroys part-xt event files
    (after leveled compaction and full optimize) — it must archive
    txs a replication slot hasn't acked the same way, or a lagging
    subscriber silently loses committed changes."""
    import glob
    import os

    pub = xt.store
    cli = _cli(server, slot="vac")
    cli.create_slot()

    pub.put("vc_docs", [{"_id": 1, "name": "a", "n": 1}],
            valid_from="2024-01-01", system_from="2024-01-01")
    pub.put("vc_docs", [{"_id": 1, "name": "a2", "n": 2}],
            valid_from="2024-01-01", system_from="2024-02-01")
    deleted = pub.vacuum("vc_docs")   # horizon = now: v1 file dies
    assert len(deleted) == 1
    assert glob.glob(os.path.join(pub.warehouse, "_wal", "*.jsonl"))

    cli.start()
    try:
        changes = list(cli.poll(max_wait=3.0))
        # BOTH puts still stream — the vacuumed tx from the archive
        assert len(changes) == 2
        assert any('"a"' in c for _, c in changes)
        assert any('"a2"' in c for _, c in changes)
    finally:
        cli.stop()
        cli.close()


def test_no_slots_means_no_wal_overhead(xt):
    import glob
    import os

    pub = xt.store
    pub.put("nw_docs", [{"_id": 1, "name": "x", "n": 1}])
    pub.optimize("nw_docs", full=True)
    assert not glob.glob(os.path.join(pub.warehouse, "_wal", "*"))
