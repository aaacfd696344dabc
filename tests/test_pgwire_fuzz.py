"""Wire-protocol fuzzing: the servers must never hang or poison the
listener on garbage input — every malformed exchange ends in a clean
error/close, and the NEXT connection always works. Deterministic
seeds (no flaky reproductions)."""

import random
import socket
import struct

import pytest

from xtdb_spark.pgwire import PgWireServer
from xtdb_spark.session import XtdbSession
from xtdb_spark.tx import TableStore

from test_pgwire import PgClient


@pytest.fixture()
def xt(spark, tmp_path):
    s = XtdbSession.__new__(XtdbSession)
    s.spark = spark
    s.store = TableStore(spark, str(tmp_path / "wh"))
    s.sql = XtdbSession.sql.__get__(s)
    s.scan = XtdbSession.scan.__get__(s)
    return s


@pytest.fixture()
def server(xt):
    srv = PgWireServer(xt, port=0).start()
    yield srv
    srv.stop()


def _sane_after(server):
    """A fresh, well-behaved connection must still work."""
    c = PgClient(server.port)
    c.startup()
    results, _tags = c.query("SELECT 1 AS one")
    assert results[0][1] == [["1"]]
    c.close()


def test_garbage_startup_never_hangs(server):
    rnd = random.Random(1)
    for i in range(25):
        s = socket.create_connection(("127.0.0.1", server.port),
                                     timeout=10)
        s.settimeout(10)
        try:
            kind = i % 5
            if kind == 0:              # random bytes, no framing
                s.sendall(rnd.randbytes(rnd.randint(1, 64)))
            elif kind == 1:            # absurd length prefix
                s.sendall(struct.pack(">i", 2_000_000_000))
            elif kind == 2:            # unknown protocol code
                body = struct.pack(">i", rnd.randint(1, 1 << 30))
                s.sendall(struct.pack(">i", len(body) + 4) + body)
            elif kind == 3:            # truncated startup, then close
                s.sendall(struct.pack(">i", 64) + b"\x00\x03\x00\x00us")
            else:                      # instant close
                pass
        finally:
            s.close()
    _sane_after(server)


def test_garbage_frames_after_startup(server):
    rnd = random.Random(2)
    for i in range(20):
        c = PgClient(server.port)
        c.startup()
        try:
            t = bytes([rnd.randrange(33, 127)])
            body = rnd.randbytes(rnd.randint(0, 48))
            c.send(t, body)
            c.send(b"S", b"")          # Sync — resync point
            # the server must answer SOMETHING and reach ReadyForQuery
            # (or close) within the socket timeout — never hang
            saw_z = False
            for _ in range(50):
                try:
                    mt, _b = c.read_msg()
                except (ConnectionResetError, TimeoutError):
                    break
                if mt == b"Z":
                    saw_z = True
                    break
            if saw_z:
                results, _ = c.query("SELECT 1 AS one")
                assert results[0][1] == [["1"]]
            c.close()
        except (ConnectionResetError, BrokenPipeError, OSError):
            pass
    _sane_after(server)


def test_truncated_extended_protocol(server):
    # Parse declaring params but cut off mid-frame, then vanish
    for payload in (b"P", b"P\x00\x00", b"B\x00", b"E\x00\x00\x00"):
        c = PgClient(server.port)
        c.startup()
        c.sock.sendall(payload[:1]
                       + struct.pack(">i", 400)   # promises 400 bytes
                       + payload[1:])             # delivers 3
        c.sock.close()
    _sane_after(server)


def test_walsender_garbage_statements(server):
    from xtdb_spark.sources.pg_repl import (LogicalReplicationClient,
                                            ReplicationError)

    cli = LogicalReplicationClient("127.0.0.1", server.port,
                                   slot="fuzz").connect()
    try:
        for bad in ("CREATE_REPLICATION_SLOT",          # missing name
                    "START_REPLICATION SLOT nope LOGICAL 0/0",
                    "START_REPLICATION WAL 0/0",
                    "DROP_REPLICATION_SLOT missing",
                    "READ_REPLICATION_SLOT missing",
                    "SELECT pg_replication_slot_advance('missing', "
                    "'0/1')"):
            with pytest.raises(ReplicationError):
                cli._query_rows(bad)
        # connection still fully usable for real work after the errors
        assert cli.create_slot() is not None
        cli.drop_slot()
    finally:
        cli.close()
