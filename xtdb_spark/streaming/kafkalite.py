"""Pure-Python Apache Kafka wire protocol: minimal broker + client +
PySpark streaming source, so the reference's Kafka tx-log path
(modules/kafka KafkaLog.kt; log.clj:70-87 factories) EXECUTES here
over a real network boundary.

Why this exists: the container has no spark-sql-kafka/kafka-clients
jars, no broker binaries, no kafka-python, and no network egress
(ingest.py:57-68 documents the failed vendoring attempt), so Spark's
JVM `.format("kafka")` source can never run. This module closes the
remaining gap as far as physically possible by implementing the
PUBLIC Kafka protocol (kafka.apache.org/protocol) from the spec:

- framing: int32 size-delimited request/response, request header v1
  (api_key, api_version, correlation_id, nullable client_id)
- RecordBatch v2 (magic 2, KIP-98): zigzag-varint records, CRC32C
  (Castagnoli) over attributes..end, first/max timestamps, offset
  deltas — byte-compatible with what a real broker stores
- APIs (fixed non-flexible versions, so classic encodings apply):
  ApiVersions v0 (18), Metadata v1 (3), Produce v3 (0), Fetch v4 (1),
  ListOffsets v1 (2)

On top of the client sits `KafkaLiteDataSource`, a Spark 4 Python
Data Source (public `pyspark.sql.datasource` API) exposing
`readStream.format("kafkalite")` with the exact KAFKA_RECORD_SCHEMA
the JVM Kafka source produces — so `ingest_tx_log` (ingest.py) runs
UNCHANGED against a live broker: network transport, batch format,
offset semantics, checkpointed resume, and redelivery dedup are all
real. The only line of the Kafka path still untestable in this
container is the JVM connector jar itself.

The broker is single-node, in-memory, for tests and local dev — at
production scale the real Kafka service plus spark-sql-kafka is the
(config-identical) path.
"""

from __future__ import annotations

import socket
import struct
import threading
from typing import Iterator, Sequence

# ---------------------------------------------------------------------------
# CRC32C (Castagnoli, reflected poly 0x82F63B78) — Kafka RecordBatch v2 crc
# ---------------------------------------------------------------------------

_CRC32C_TABLE = []


def _crc32c_init() -> None:
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
        _CRC32C_TABLE.append(c)


_crc32c_init()


def crc32c(data: bytes) -> int:
    """CRC32C check value: crc32c(b'123456789') == 0xE3069283."""
    c = 0xFFFFFFFF
    for b in data:
        c = _CRC32C_TABLE[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


# ---------------------------------------------------------------------------
# primitive codecs (classic, non-flexible encodings)
# ---------------------------------------------------------------------------


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def enc_varint(n: int) -> bytes:
    """Kafka varint: zigzag then LEB128."""
    u = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def dec_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = u = 0
    while True:
        if i >= len(buf):
            raise ValueError("truncated varint")
        b = buf[i]
        i += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(u), i
        shift += 7


def _i8(n): return struct.pack(">b", n)
def _i16(n): return struct.pack(">h", n)
def _i32(n): return struct.pack(">i", n)
def _i64(n): return struct.pack(">q", n)
def _u32(n): return struct.pack(">I", n)


def _str(s: str) -> bytes:
    b = s.encode()
    return _i16(len(b)) + b


def _nstr(s: str | None) -> bytes:
    return _i16(-1) if s is None else _str(s)


def _nbytes(b: bytes | None) -> bytes:
    return _i32(-1) if b is None else _i32(len(b)) + b


class _Reader:
    """Cursor over a response/request payload."""

    def __init__(self, buf: bytes, i: int = 0):
        self.buf, self.i = buf, i

    def _take(self, n: int) -> bytes:
        if self.i + n > len(self.buf):
            raise ValueError("truncated frame")
        b = self.buf[self.i:self.i + n]
        self.i += n
        return b

    def i8(self): return struct.unpack(">b", self._take(1))[0]
    def i16(self): return struct.unpack(">h", self._take(2))[0]
    def i32(self): return struct.unpack(">i", self._take(4))[0]
    def i64(self): return struct.unpack(">q", self._take(8))[0]
    def u32(self): return struct.unpack(">I", self._take(4))[0]

    def string(self) -> str | None:
        n = self.i16()
        return None if n < 0 else self._take(n).decode()

    def nbytes(self) -> bytes | None:
        n = self.i32()
        return None if n < 0 else self._take(n)

    def array(self, fn) -> list | None:
        n = self.i32()
        return None if n < 0 else [fn() for _ in range(n)]


# ---------------------------------------------------------------------------
# RecordBatch v2 (magic 2)
# ---------------------------------------------------------------------------


def encode_record_batch(base_offset: int,
                        records: list[tuple[int, bytes | None, bytes | None]],
                        ) -> bytes:
    """records: [(timestamp_ms, key|None, value|None)] → one magic-2
    batch. Layout per the public spec: 61-byte header then
    varint-encoded records; crc is CRC32C over attributes..end."""
    if not records:
        raise ValueError("empty batch")
    base_ts = records[0][0]
    max_ts = max(r[0] for r in records)
    recs = bytearray()
    for delta, (ts, key, val) in enumerate(records):
        body = bytearray()
        body += _i8(0)                                   # attributes
        body += enc_varint(ts - base_ts)                 # timestampDelta
        body += enc_varint(delta)                        # offsetDelta
        if key is None:
            body += enc_varint(-1)
        else:
            body += enc_varint(len(key)) + key
        if val is None:
            body += enc_varint(-1)
        else:
            body += enc_varint(len(val)) + val
        body += enc_varint(0)                            # headers
        recs += enc_varint(len(body)) + body
    crc_part = (_i16(0)                                  # attributes
                + _i32(len(records) - 1)                 # lastOffsetDelta
                + _i64(base_ts) + _i64(max_ts)
                + _i64(-1) + _i16(-1) + _i32(-1)         # pid/epoch/seq
                + _i32(len(records)) + bytes(recs))
    after_len = (_i32(0)                                 # leader epoch
                 + _i8(2)                                # magic
                 + _u32(crc32c(crc_part)) + crc_part)
    return _i64(base_offset) + _i32(len(after_len)) + after_len


def decode_record_batches(buf: bytes, check_crc: bool = True,
                          ) -> list[tuple[int, int, bytes | None, bytes | None]]:
    """Parse a concatenation of magic-2 batches →
    [(offset, timestamp_ms, key, value)]. Trailing partial batches
    (real Fetch responses may truncate) are ignored, as real clients
    do."""
    out = []
    i = 0
    while i + 12 <= len(buf):
        base_offset = struct.unpack(">q", buf[i:i + 8])[0]
        blen = struct.unpack(">i", buf[i + 8:i + 12])[0]
        if i + 12 + blen > len(buf):
            break                                        # partial batch
        r = _Reader(buf, i + 12)
        r.i32()                                          # leader epoch
        magic = r.i8()
        if magic != 2:
            raise ValueError(f"unsupported magic {magic}")
        crc = r.u32()
        if check_crc and crc != crc32c(buf[r.i:i + 12 + blen]):
            raise ValueError("record batch CRC32C mismatch")
        r.i16()                                          # attributes
        r.i32()                                          # lastOffsetDelta
        base_ts = r.i64()
        r.i64()                                          # maxTimestamp
        r.i64(); r.i16(); r.i32()                        # pid/epoch/seq
        n = r.i32()
        for _ in range(n):
            _rlen, j = dec_varint(buf, r.i)
            end = j + _rlen
            j += 1                                       # attributes
            ts_delta, j = dec_varint(buf, j)
            off_delta, j = dec_varint(buf, j)
            klen, j = dec_varint(buf, j)
            key = None if klen < 0 else buf[j:j + klen]
            j += max(klen, 0)
            vlen, j = dec_varint(buf, j)
            val = None if vlen < 0 else buf[j:j + vlen]
            out.append((base_offset + off_delta, base_ts + ts_delta,
                        key, val))
            r.i = end
        i += 12 + blen
    return out


# ---------------------------------------------------------------------------
# broker
# ---------------------------------------------------------------------------

API_PRODUCE, API_FETCH, API_LIST_OFFSETS = 0, 1, 2
API_METADATA, API_VERSIONS = 3, 18
ERR_NONE, ERR_UNKNOWN_TOPIC, ERR_OFFSET_OUT_OF_RANGE = 0, 3, 1


class KafkaLiteBroker:
    """Single-node in-memory Kafka-wire-protocol broker.

    Log storage keeps the PRODUCED BATCHES verbatim (re-based to
    their assigned offsets) and Fetch serves whole batches starting
    at the first batch containing fetch_offset — exactly the real
    broker's contract (consumers must skip records below the
    requested offset, which ours does in `decode_record_batches`
    callers)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self.host, self.port = host, port
        self._logs: dict[tuple[str, int], list[tuple[int, bytes]]] = {}
        self._ends: dict[tuple[str, int], int] = {}
        self._lock = threading.Lock()
        self._sock: socket.socket | None = None
        self._threads: list[threading.Thread] = []
        self._stop = threading.Event()

    # -- lifecycle ---------------------------------------------------------

    def start(self) -> "KafkaLiteBroker":
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((self.host, self.port))
        self.port = self._sock.getsockname()[1]
        self._sock.listen(16)
        t = threading.Thread(target=self._accept_loop, daemon=True)
        t.start()
        self._threads.append(t)
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._sock:
            try:
                self._sock.close()
            except OSError:
                pass

    @property
    def bootstrap(self) -> str:
        return f"{self.host}:{self.port}"

    def create_topic(self, topic: str, partitions: int = 1) -> None:
        with self._lock:
            for p in range(partitions):
                self._logs.setdefault((topic, p), [])
                self._ends.setdefault((topic, p), 0)

    # -- socket plumbing ---------------------------------------------------

    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._sock.accept()
            except OSError:
                return
            t = threading.Thread(target=self._serve, args=(conn,),
                                 daemon=True)
            t.start()
            self._threads.append(t)

    def _serve(self, conn: socket.socket) -> None:
        try:
            while not self._stop.is_set():
                hdr = _recv_exact(conn, 4)
                if hdr is None:
                    return
                size = struct.unpack(">i", hdr)[0]
                payload = _recv_exact(conn, size)
                if payload is None:
                    return
                resp = self._handle(payload)
                conn.sendall(_i32(len(resp)) + resp)
        except (OSError, ValueError):
            pass
        finally:
            try:
                conn.close()
            except OSError:
                pass

    # -- request dispatch --------------------------------------------------

    def _handle(self, payload: bytes) -> bytes:
        r = _Reader(payload)
        api_key, api_version = r.i16(), r.i16()
        correlation_id = r.i32()
        r.string()                                       # client_id
        body = {
            API_VERSIONS: self._api_versions,
            API_METADATA: self._metadata,
            API_PRODUCE: self._produce,
            API_FETCH: self._fetch,
            API_LIST_OFFSETS: self._list_offsets,
        }[api_key](r, api_version)
        return _i32(correlation_id) + body

    def _api_versions(self, r: _Reader, v: int) -> bytes:
        supported = [(API_PRODUCE, 3, 3), (API_FETCH, 4, 4),
                     (API_LIST_OFFSETS, 1, 1), (API_METADATA, 1, 1),
                     (API_VERSIONS, 0, 0)]
        out = _i16(ERR_NONE) + _i32(len(supported))
        for k, lo, hi in supported:
            out += _i16(k) + _i16(lo) + _i16(hi)
        return out

    def _metadata(self, r: _Reader, v: int) -> bytes:
        topics = r.array(r.string)
        with self._lock:
            known = sorted({t for t, _ in self._logs})
        if topics:
            known = [t for t in topics if
                     any(k == t for k in known)] or list(topics)
        out = _i32(1)                                    # brokers
        out += _i32(0) + _str(self.host) + _i32(self.port) + _nstr(None)
        out += _i32(0)                                   # controller_id
        out += _i32(len(known))
        for t in known:
            with self._lock:
                parts = sorted(p for tt, p in self._logs if tt == t)
            err = ERR_NONE if parts else ERR_UNKNOWN_TOPIC
            out += _i16(err) + _str(t) + _i8(0)
            out += _i32(len(parts))
            for p in parts:
                out += (_i16(ERR_NONE) + _i32(p) + _i32(0)
                        + _i32(1) + _i32(0)              # replicas=[0]
                        + _i32(1) + _i32(0))             # isr=[0]
        return out

    def _produce(self, r: _Reader, v: int) -> bytes:
        r.string()                                       # transactional_id
        r.i16()                                          # acks
        r.i32()                                          # timeout_ms
        results = []

        def topic():
            name = r.string()

            def part():
                index = r.i32()
                batch = r.nbytes()
                base = self._append(name, index, batch)
                results.append((name, index, base))
            r.array(part)
        r.array(topic)
        by_topic: dict[str, list[tuple[int, int]]] = {}
        for name, index, base in results:
            by_topic.setdefault(name, []).append((index, base))
        out = _i32(len(by_topic))
        for name, parts in by_topic.items():
            out += _str(name) + _i32(len(parts))
            for index, base in parts:
                err = ERR_NONE if base >= 0 else ERR_UNKNOWN_TOPIC
                out += _i32(index) + _i16(err) + _i64(base) + _i64(-1)
        out += _i32(0)                                   # throttle
        return out

    def _append(self, topic: str, partition: int,
                batch: bytes | None) -> int:
        if batch is None:
            return -1
        recs = decode_record_batches(batch)
        if not recs:
            return -1
        with self._lock:
            key = (topic, partition)
            if key not in self._logs:
                return -1
            base = self._ends.get(key, 0)
            # re-base the produced batch to its assigned offset, fixing
            # baseOffset in place (crc excludes it, so bytes stay valid)
            rebased = _i64(base) + batch[8:]
            self._logs[key].append((base, rebased))
            self._ends[key] = base + len(recs)
            return base

    def _fetch(self, r: _Reader, v: int) -> bytes:
        r.i32(); r.i32(); r.i32()                        # replica/wait/min
        r.i32()                                          # max_bytes
        r.i8()                                           # isolation
        reqs = []

        def topic():
            name = r.string()

            def part():
                reqs.append((name, r.i32(), r.i64(), r.i32()))
            r.array(part)
        r.array(topic)
        out = _i32(0)                                    # throttle
        by_topic: dict[str, list[bytes]] = {}
        for name, partition, fetch_offset, max_bytes in reqs:
            with self._lock:
                key = (name, partition)
                if key not in self._logs:
                    body = (_i32(partition) + _i16(ERR_UNKNOWN_TOPIC)
                            + _i64(-1) + _i64(-1) + _i32(0) + _i32(-1))
                    by_topic.setdefault(name, []).append(body)
                    continue
                end = self._ends[key]
                if fetch_offset > end:
                    body = (_i32(partition)
                            + _i16(ERR_OFFSET_OUT_OF_RANGE)
                            + _i64(end) + _i64(end) + _i32(0) + _i32(-1))
                    by_topic.setdefault(name, []).append(body)
                    continue
                chunks, size = [], 0
                for base, raw in self._logs[key]:
                    nrecs = len(decode_record_batches(raw,
                                                      check_crc=False))
                    if base + nrecs <= fetch_offset:
                        continue
                    chunks.append(raw)
                    size += len(raw)
                    if size >= max_bytes:
                        break
                records = b"".join(chunks)
            body = (_i32(partition) + _i16(ERR_NONE) + _i64(end)
                    + _i64(end) + _i32(0) + _nbytes(records or None))
            by_topic.setdefault(name, []).append(body)
        out += _i32(len(by_topic))
        for name, parts in by_topic.items():
            out += _str(name) + _i32(len(parts)) + b"".join(parts)
        return out

    def _list_offsets(self, r: _Reader, v: int) -> bytes:
        r.i32()                                          # replica_id
        reqs = []

        def topic():
            name = r.string()

            def part():
                reqs.append((name, r.i32(), r.i64()))
            r.array(part)
        r.array(topic)
        by_topic: dict[str, list[bytes]] = {}
        for name, partition, ts in reqs:
            with self._lock:
                key = (name, partition)
                if key not in self._logs:
                    body = (_i32(partition) + _i16(ERR_UNKNOWN_TOPIC)
                            + _i64(-1) + _i64(-1))
                else:
                    off = 0 if ts == -2 else self._ends[key]
                    body = (_i32(partition) + _i16(ERR_NONE)
                            + _i64(-1) + _i64(off))
            by_topic.setdefault(name, []).append(body)
        out = _i32(len(by_topic))
        for name, parts in by_topic.items():
            out += _str(name) + _i32(len(parts)) + b"".join(parts)
        return out


def _recv_exact(conn: socket.socket, n: int) -> bytes | None:
    buf = bytearray()
    while len(buf) < n:
        chunk = conn.recv(n - len(buf))
        if not chunk:
            return None
        buf += chunk
    return bytes(buf)


# ---------------------------------------------------------------------------
# client
# ---------------------------------------------------------------------------


class KafkaLiteClient:
    """Minimal synchronous Kafka wire-protocol client (the five APIs
    the broker speaks). One TCP connection, correlation-id matched."""

    def __init__(self, bootstrap: str, client_id: str = "kafkalite"):
        host, port = bootstrap.rsplit(":", 1)
        self._sock = socket.create_connection((host, int(port)),
                                              timeout=30)
        self._client_id = client_id
        self._corr = 0

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def _call(self, api_key: int, api_version: int, body: bytes) -> _Reader:
        self._corr += 1
        req = (_i16(api_key) + _i16(api_version) + _i32(self._corr)
               + _nstr(self._client_id) + body)
        self._sock.sendall(_i32(len(req)) + req)
        hdr = _recv_exact(self._sock, 4)
        if hdr is None:
            raise ConnectionError("broker closed connection")
        size = struct.unpack(">i", hdr)[0]
        payload = _recv_exact(self._sock, size)
        if payload is None:
            raise ConnectionError("truncated response")
        r = _Reader(payload)
        corr = r.i32()
        if corr != self._corr:
            raise ValueError(f"correlation mismatch {corr}!={self._corr}")
        return r

    def api_versions(self) -> list[tuple[int, int, int]]:
        r = self._call(API_VERSIONS, 0, b"")
        err = r.i16()
        if err:
            raise ValueError(f"ApiVersions error {err}")
        return [(r.i16(), r.i16(), r.i16()) for _ in range(r.i32())]

    def metadata(self, topics: list[str] | None = None,
                 ) -> dict[str, list[int]]:
        body = (_i32(-1) if topics is None else
                _i32(len(topics)) + b"".join(_str(t) for t in topics))
        r = self._call(API_METADATA, 1, body)
        r.array(lambda: (r.i32(), r.string(), r.i32(), r.string()))
        r.i32()                                          # controller
        out: dict[str, list[int]] = {}
        for _ in range(r.i32()):
            err, name = r.i16(), r.string()
            r.i8()                                       # is_internal
            parts = []
            for _ in range(r.i32()):
                r.i16()
                parts.append(r.i32())
                r.i32()
                r.array(r.i32)
                r.array(r.i32)
            if not err:
                out[name] = sorted(parts)
        return out

    def produce(self, topic: str, partition: int,
                records: list[tuple[int, bytes | None, bytes | None]],
                ) -> int:
        """records: [(timestamp_ms, key, value)] → assigned base offset."""
        batch = encode_record_batch(0, records)
        body = (_nstr(None) + _i16(-1) + _i32(30000)
                + _i32(1) + _str(topic)
                + _i32(1) + _i32(partition) + _nbytes(batch))
        r = self._call(API_PRODUCE, 3, body)
        base = -1
        for _ in range(r.i32()):
            r.string()
            for _ in range(r.i32()):
                r.i32()
                err = r.i16()
                base = r.i64()
                r.i64()
                if err:
                    raise ValueError(f"Produce error {err}")
        r.i32()                                          # throttle
        return base

    def fetch(self, topic: str, partition: int, offset: int,
              max_bytes: int = 1 << 20,
              ) -> tuple[list[tuple[int, int, bytes | None, bytes | None]],
                         int]:
        """→ ([(offset, ts_ms, key, value)] at-or-after `offset`,
        high_watermark). Empty list at end of log."""
        body = (_i32(-1) + _i32(0) + _i32(1) + _i32(max_bytes) + _i8(0)
                + _i32(1) + _str(topic)
                + _i32(1) + _i32(partition) + _i64(offset)
                + _i32(max_bytes))
        r = self._call(API_FETCH, 4, body)
        r.i32()                                          # throttle
        recs: list = []
        hwm = -1
        for _ in range(r.i32()):
            r.string()
            for _ in range(r.i32()):
                r.i32()
                err = r.i16()
                hwm = r.i64()
                r.i64()
                r.array(lambda: (r.i64(), r.i64()))
                raw = r.nbytes()
                if err == ERR_OFFSET_OUT_OF_RANGE:
                    continue
                if err:
                    raise ValueError(f"Fetch error {err}")
                if raw:
                    recs.extend(x for x in decode_record_batches(raw)
                                if x[0] >= offset)
        return recs, hwm

    def end_offset(self, topic: str, partition: int) -> int:
        body = (_i32(-1) + _i32(1) + _str(topic)
                + _i32(1) + _i32(partition) + _i64(-1))
        r = self._call(API_LIST_OFFSETS, 1, body)
        off = 0
        for _ in range(r.i32()):
            r.string()
            for _ in range(r.i32()):
                r.i32()
                err = r.i16()
                r.i64()
                off = r.i64()
                if err:
                    raise ValueError(f"ListOffsets error {err}")
        return off


# ---------------------------------------------------------------------------
# Spark Python Data Source: readStream.format("kafkalite")
# ---------------------------------------------------------------------------

try:
    from pyspark.sql.datasource import (DataSource, DataSourceStreamReader,
                                        InputPartition)
except ImportError:                                      # pragma: no cover
    DataSource = DataSourceStreamReader = object
    InputPartition = None


class _OffsetRange(InputPartition or object):
    def __init__(self, bootstrap: str, topic: str, partition: int,
                 start: int, end: int):
        self.bootstrap, self.topic = bootstrap, topic
        self.partition, self.start, self.end = partition, start, end


class KafkaLiteStreamReader(DataSourceStreamReader):
    """Structured Streaming reader over the wire-protocol client.
    Offsets are per-partition next-offsets, checkpointed by Spark —
    the same shape the JVM Kafka source persists, so exactly-once
    resume-after-restart works identically."""

    def __init__(self, options: dict):
        self._bootstrap = options["bootstrap"]
        self._topic = options["topic"]
        with KafkaLiteClient(self._bootstrap) as c:
            self._parts = c.metadata([self._topic]).get(self._topic, [0])

    def initialOffset(self) -> dict:
        return {str(p): 0 for p in self._parts}

    def latestOffset(self) -> dict:
        with KafkaLiteClient(self._bootstrap) as c:
            return {str(p): c.end_offset(self._topic, p)
                    for p in self._parts}

    def partitions(self, start: dict, end: dict,
                   ) -> Sequence["_OffsetRange"]:
        return [_OffsetRange(self._bootstrap, self._topic, int(p),
                             start.get(p, 0), e)
                for p, e in end.items() if e > start.get(p, 0)]

    def read(self, part: "_OffsetRange") -> Iterator[tuple]:
        """Runs ON THE EXECUTOR: each partition range opens its own
        broker connection — the real source's per-task consumer."""
        from datetime import datetime, timezone
        with KafkaLiteClient(part.bootstrap) as c:
            off = part.start
            while off < part.end:
                recs, _ = c.fetch(part.topic, part.partition, off)
                if not recs:
                    break
                for o, ts, key, val in recs:
                    if o >= part.end:
                        return
                    yield (key, val, part.topic, part.partition, o,
                           datetime.fromtimestamp(ts / 1000.0,
                                                  tz=timezone.utc))
                off = recs[-1][0] + 1

    def commit(self, end: dict) -> None:
        pass


class KafkaLiteDataSource(DataSource):
    """`spark.dataSource.register(KafkaLiteDataSource)` then
    `spark.readStream.format("kafkalite").option("bootstrap", ...)
    .option("topic", ...)` — emits KAFKA_RECORD_SCHEMA rows, feeding
    `ingest_tx_log` unchanged."""

    @classmethod
    def name(cls) -> str:
        return "kafkalite"

    def schema(self) -> str:
        from xtdb_spark.streaming.ingest import KAFKA_RECORD_SCHEMA
        return KAFKA_RECORD_SCHEMA

    def streamReader(self, schema) -> KafkaLiteStreamReader:
        return KafkaLiteStreamReader(self.options)


def kafkalite_tx_log_stream(spark, bootstrap: str, topic: str):
    """`kafka_tx_log_stream` (ingest.py:44) against the pure-Python
    broker: registers the data source and returns the same-shaped
    streaming DataFrame the JVM Kafka source would produce."""
    spark.dataSource.register(KafkaLiteDataSource)
    return (spark.readStream.format("kafkalite")
            .option("bootstrap", bootstrap)
            .option("topic", topic)
            .load())
