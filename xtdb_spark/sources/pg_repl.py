"""Logical-replication CLIENT: a pure-Python `pg_recvlogical`
speaking the PUBLIC Postgres streaming-replication protocol — the
live-slot half of the CDC source the reference gets from the JDBC
replication driver (PostgresSource.kt:120-151).

No driver ships in this container, so the protocol is implemented
directly (same approach as streaming/kafkalite.py): StartupMessage
with `replication=database`, cleartext/trust auth, walsender simple
queries (IDENTIFY_SYSTEM / CREATE_REPLICATION_SLOT /
START_REPLICATION), CopyBoth with XLogData ('w') and keepalive ('k')
frames, and Standby Status Update ('r') acks that advance the slot's
confirmed_flush — the resume token (PostgresSource.kt:199-210).

Works against ANY wal2json walsender (a real Postgres with the
wal2json plugin, or this repo's own publisher, replication.py) —
the payloads are wal2json v2 lines, exactly what
sources/cdc.py:parse_wal2json consumes.
"""

from __future__ import annotations

import socket
import struct
import time

_PG_EPOCH_OFFSET_S = 946_684_800


def _pg_now_us() -> int:
    return int((time.time() - _PG_EPOCH_OFFSET_S) * 1_000_000)


class ReplicationError(RuntimeError):
    pass


class LogicalReplicationClient:
    """One replication connection + slot. Usage::

        cli = LogicalReplicationClient(host, port, slot="s1")
        cli.connect()
        cli.create_slot(if_not_exists=True)
        cli.start()
        for lsn, line in cli.poll(max_wait=2.0):
            ...apply...
        cli.ack(lsn)          # confirmed_flush — exactly-once resume
        cli.stop(); cli.close()
    """

    def __init__(self, host: str, port: int, slot: str,
                 user: str = "xtdb", password: str | None = None,
                 database: str = "xtdb", plugin: str = "wal2json"):
        self.host, self.port, self.slot = host, port, slot
        self.user, self.password, self.database = user, password, database
        self.plugin = plugin
        self.sock: socket.socket | None = None
        self.buf = b""
        self.streaming = False
        self.last_lsn = 0
        # highest server position observed on the wire (XLogData
        # wal_start or keepalive walEnd) — progress telemetry only
        self.last_wal_end = 0
        # highest KEEPALIVE walEnd: the only wire-derived COMPLETION
        # proof. The sender advances its keepalive position strictly
        # after a tx's lines are all on the wire (replication.py
        # _stream: pos = txid after the line loop), so keepalive
        # walEnd ≥ L proves everything ≤ L was delivered. An XLogData
        # wal_start == L proves nothing: a multi-line tx shares one
        # lsn across lines, so more lines at L may still be coming.
        self.last_keepalive_end = 0

    # ---- framing

    def _send_raw(self, b: bytes) -> None:
        self.sock.sendall(b)

    def _send(self, type_: bytes, payload: bytes = b"") -> None:
        self._send_raw(type_ + struct.pack(">i", len(payload) + 4) + payload)

    def _recv_frame(self, timeout: float | None = None):
        self.sock.settimeout(timeout)
        try:
            while True:
                if len(self.buf) >= 5:
                    (ln,) = struct.unpack(">i", self.buf[1:5])
                    if len(self.buf) >= 1 + ln:
                        t = self.buf[0:1]
                        body = self.buf[5:1 + ln]
                        self.buf = self.buf[1 + ln:]
                        return t, body
                chunk = self.sock.recv(65536)
                if not chunk:
                    raise ConnectionResetError("server closed")
                self.buf += chunk
        except TimeoutError:
            return None, None
        finally:
            self.sock.settimeout(None)

    @staticmethod
    def _cstr(s: str) -> bytes:
        return s.encode() + b"\x00"

    # ---- handshake

    def connect(self) -> "LogicalReplicationClient":
        self.sock = socket.create_connection((self.host, self.port),
                                             timeout=10)
        self.sock.settimeout(None)
        params = (self._cstr("user") + self._cstr(self.user)
                  + self._cstr("database") + self._cstr(self.database)
                  + self._cstr("replication") + self._cstr("database")
                  + b"\x00")
        body = struct.pack(">i", 196608) + params
        self._send_raw(struct.pack(">i", len(body) + 4) + body)
        while True:
            t, data = self._recv_frame()
            if t == b"R":
                (code,) = struct.unpack(">i", data[:4])
                if code == 0:
                    continue
                if code == 3:              # cleartext password
                    if self.password is None:
                        raise ReplicationError("server wants a password")
                    self._send(b"p", self._cstr(self.password))
                    continue
                raise ReplicationError(f"unsupported auth code {code}")
            if t == b"E":
                raise ReplicationError(self._err_text(data))
            if t in (b"S", b"K"):          # ParameterStatus / BackendKeyData
                continue
            if t == b"Z":
                return self
            raise ReplicationError(f"unexpected frame {t!r} in startup")

    @staticmethod
    def _err_text(data: bytes) -> str:
        fields = {}
        for part in data.split(b"\x00"):
            if part:
                fields[chr(part[0])] = part[1:].decode(errors="replace")
        return f"{fields.get('C', '?????')}: {fields.get('M', '')}"

    # ---- simple-query helpers (walsender statements)

    def _query_rows(self, sql: str) -> list[list[str | None]]:
        return self.query(sql)[1]

    def query(self, sql: str) -> tuple[list[str], list[list[str | None]]]:
        """Plain simple-query over this connection (replication
        connections accept ordinary SQL, like postgres): returns
        (column names, text-format rows). Used by the walsender
        statements and by the snapshot phase of
        cdc.bootstrap_subscriber."""
        self._send(b"Q", self._cstr(sql))
        cols: list[str] = []
        rows, err = [], None
        while True:
            t, data = self._recv_frame()
            if t == b"T":
                (nf,) = struct.unpack(">h", data[:2])
                off = 2
                cols = []
                for _ in range(nf):
                    end = data.index(b"\x00", off)
                    cols.append(data[off:end].decode())
                    off = end + 1 + 18      # fixed per-field tail
            elif t == b"D":
                (n,) = struct.unpack(">h", data[:2])
                off, vals = 2, []
                for _ in range(n):
                    (ln,) = struct.unpack(">i", data[off:off + 4])
                    off += 4
                    if ln < 0:
                        vals.append(None)
                    else:
                        vals.append(data[off:off + ln].decode())
                        off += ln
                rows.append(vals)
            elif t == b"E":
                err = self._err_text(data)
            elif t == b"Z":
                if err:
                    raise ReplicationError(err)
                return cols, rows
            # C / N frames: skip

    def identify_system(self) -> dict:
        r = self._query_rows("IDENTIFY_SYSTEM")[0]
        return {"systemid": r[0], "timeline": int(r[1]),
                "xlogpos": r[2], "dbname": r[3]}

    def create_slot(self, if_not_exists: bool = False) -> str | None:
        """Returns the consistent point, or None when the slot already
        existed and `if_not_exists` (postgres has no IF NOT EXISTS for
        slots — the duplicate error is caught client-side)."""
        try:
            r = self._query_rows(
                f"CREATE_REPLICATION_SLOT {self.slot} LOGICAL "
                f"{self.plugin}")[0]
            return r[1]
        except ReplicationError as e:
            if if_not_exists and "already exists" in str(e):
                return None
            raise

    def drop_slot(self) -> None:
        self._query_rows(f"DROP_REPLICATION_SLOT {self.slot}")

    def read_slot(self) -> str:
        """READ_REPLICATION_SLOT (PG 15+): the slot's restart LSN
        (`X/Y`) without opening the stream."""
        return self._query_rows(f"READ_REPLICATION_SLOT {self.slot}")[0][1]

    def advance(self, lsn: int) -> None:
        """pg_replication_slot_advance(): ack a position out of
        stream — everything ≤ lsn is confirmed-flushed."""
        from xtdb_spark.replication import lsn_str

        self._query_rows("SELECT pg_replication_slot_advance("
                         f"'{self.slot}', '{lsn_str(lsn)}')")

    # ---- CopyBoth streaming

    def start(self, start_lsn: str = "0/0") -> None:
        self._send(b"Q", self._cstr(
            f"START_REPLICATION SLOT {self.slot} LOGICAL {start_lsn}"))
        t, data = self._recv_frame()
        if t == b"E":
            # error is followed by ReadyForQuery on the wire
            msg = self._err_text(data)
            self._recv_frame()
            raise ReplicationError(msg)
        if t != b"W":
            raise ReplicationError(f"expected CopyBothResponse, got {t!r}")
        self.streaming = True

    def poll(self, max_wait: float = 1.0, max_changes: int | None = None,
             until_lsn: int | None = None):
        """Yield (lsn:int, payload:str) changes for up to `max_wait`
        seconds of wire idleness; answers keepalives. Returns when
        the wire goes quiet (batch boundary for the apply loop) — or,
        with `until_lsn`, as soon as a keepalive proves the sender
        has caught up to it (the sender emits a tx's lines BEFORE
        advancing its reported position, so position ≥ until_lsn
        means everything ≤ until_lsn was already delivered; an
        XLogData lsn alone is NOT proof — a multi-line tx shares one
        lsn across lines)."""
        if not self.streaming:
            raise ReplicationError("call start() first")
        n = 0
        while max_changes is None or n < max_changes:
            t, data = self._recv_frame(timeout=max_wait)
            if t is None:
                return
            if t != b"d":
                raise ReplicationError(f"unexpected frame {t!r} mid-copy")
            kind = data[:1]
            if kind == b"w":
                (wal_start,) = struct.unpack(">q", data[1:9])
                payload = data[25:].decode()
                self.last_lsn = max(self.last_lsn, wal_start)
                self.last_wal_end = max(self.last_wal_end, wal_start)
                n += 1
                yield wal_start, payload
            elif kind == b"k":
                (wal_end,) = struct.unpack(">q", data[1:9])
                self.last_wal_end = max(self.last_wal_end, wal_end)
                self.last_keepalive_end = max(self.last_keepalive_end,
                                              wal_end)
                reply_requested = data[17:18] == b"\x01"
                if reply_requested:
                    self.ack(self.last_lsn)
                if until_lsn is not None \
                        and self.last_keepalive_end >= until_lsn:
                    return

    def ack(self, flushed_lsn: int, reply: bool = False) -> None:
        """Standby Status Update: everything ≤ flushed_lsn is applied
        — the server persists it as the slot's confirmed_flush, so a
        reconnect resumes strictly after it (exactly-once). `reply`
        sets the protocol's final byte asking the server to answer
        with a keepalive immediately."""
        self._send(b"d", b"r" + struct.pack(
            ">qqqq", flushed_lsn, flushed_lsn, flushed_lsn,
            _pg_now_us()) + (b"\x01" if reply else b"\x00"))

    def request_keepalive(self) -> None:
        """Prompt an immediate server keepalive WITHOUT moving the
        slot: a status update with position 0 (confirm is monotone —
        0 never regresses confirmed_flush) and the reply flag set.
        Lets a reader learn the sender's current position on demand
        instead of waiting out the periodic keepalive interval."""
        self._send(b"d", b"r" + struct.pack(
            ">qqqq", 0, 0, 0, _pg_now_us()) + b"\x01")

    def stop(self) -> None:
        """End the copy cleanly (CopyDone handshake)."""
        if not self.streaming:
            return
        self._send(b"c")
        deadline = time.monotonic() + 5
        while time.monotonic() < deadline:
            t, _ = self._recv_frame(timeout=1.0)
            if t == b"Z" or t is None:
                break
        self.streaming = False

    def close(self) -> None:
        if self.sock is not None:
            try:
                self._send(b"X")
            except OSError:
                pass
            self.sock.close()
            self.sock = None
