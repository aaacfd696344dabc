"""Arrow Flight SQL protocol layer.

Reference: the reference node speaks Flight SQL proper
(reference core/src/main/clojure/xtdb/flight_sql.clj — FlightSqlProducer
handling CommandStatementQuery / prepared statements / metadata
commands; adbc.clj:1-153 drives it with a stock ADBC client). This
module adds the same protocol to :class:`xtdb_spark.flight.XtdbFlightServer`
so stock `adbc_driver_flightsql` / JDBC-Flight-SQL clients connect
unmodified.

Flight SQL wraps protobuf messages in `google.protobuf.Any` and ships
them as FlightDescriptor commands / Ticket bodies / DoAction payloads.
The container has no protobuf runtime, so the handful of message
shapes Flight SQL needs are encoded/decoded with a minimal wire-format
codec written from the protobuf encoding spec (varint + tag-length-
value) and Arrow's published FlightSql.proto field numbers — NOT
copied from any generated code.

Messages spoken (field numbers from arrow/flight/protocol/sql/
FlightSql.proto, a published public spec):

- CommandStatementQuery{query=1}          → execute, stream result
- CommandStatementUpdate{query=1}         → DML, DoPutUpdateResult
- TicketStatementQuery{statement_handle=1}
- CommandGetCatalogs{}                    → [catalog_name]
- CommandGetDbSchemas{catalog=1, pat=2}   → [catalog_name, db_schema_name]
- CommandGetTables{catalog=1, schema_pat=2, table_pat=3, types=4,
  include_schema=5}                       → table list (+IPC schema col)
- CommandGetSqlInfo{info=1}               → name/value union table
- ActionCreatePreparedStatementRequest{query=1} /
  ActionCreatePreparedStatementResult{handle=1, dataset_schema=2}
- ActionClosePreparedStatementRequest{handle=1}
- CommandPreparedStatementQuery{handle=1}
"""

from __future__ import annotations

import fnmatch
import threading
import uuid

import pyarrow as pa

TYPE_PREFIX = "type.googleapis.com/arrow.flight.protocol.sql."


# ---------------------------------------------------------------- codec
#
# Just enough protobuf: wire type 0 (varint) and 2 (length-delimited).
# Every Flight SQL field we touch is one of the two.

def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        b = buf[i]
        i += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, i
        shift += 7


def field_bytes(no: int, payload: bytes) -> bytes:
    return _varint((no << 3) | 2) + _varint(len(payload)) + payload


def field_str(no: int, s: str) -> bytes:
    return field_bytes(no, s.encode())


def field_varint(no: int, v: int) -> bytes:
    return _varint(no << 3) + _varint(v)


def parse_fields(buf: bytes) -> dict[int, list]:
    """Decode a message into {field_no: [values]} — bytes for
    length-delimited fields, int for varints. Unknown wire types
    (fixed32/64 — unused by Flight SQL) are skipped."""
    out: dict[int, list] = {}
    i = 0
    while i < len(buf):
        tag, i = _read_varint(buf, i)
        no, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _read_varint(buf, i)
        elif wt == 2:
            ln, i = _read_varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = buf[i:i + 4]
            i += 4
        elif wt == 1:
            v = buf[i:i + 8]
            i += 8
        else:  # pragma: no cover — groups, long dead
            raise ValueError(f"unsupported wire type {wt}")
        out.setdefault(no, []).append(v)
    return out


def any_wrap(msg_name: str, payload: bytes) -> bytes:
    return field_str(1, TYPE_PREFIX + msg_name) + field_bytes(2, payload)


def any_unwrap(buf: bytes) -> tuple[str, bytes] | None:
    """(message name, payload) when `buf` is a google.protobuf.Any
    carrying a Flight SQL message, else None."""
    try:
        f = parse_fields(buf)
        url = f.get(1, [b""])[0].decode()
    except Exception:
        return None
    if not url.startswith(TYPE_PREFIX):
        return None
    return url[len(TYPE_PREFIX):], (f.get(2, [b""])[0] or b"")


def _first_str(f: dict, no: int, default: str = "") -> str:
    v = f.get(no)
    return v[0].decode() if v else default


# ------------------------------------------------- metadata result tables

_SQL_INFO_SCHEMA = pa.schema([
    pa.field("info_name", pa.uint32(), nullable=False),
    pa.field("value", pa.dense_union([
        pa.field("string_value", pa.string()),
        pa.field("bool_value", pa.bool_()),
        pa.field("bigint_value", pa.int64()),
        pa.field("int32_bitmask", pa.int32()),
        pa.field("string_list", pa.list_(pa.string())),
        pa.field("int32_to_int32_list_map",
                 pa.map_(pa.int32(), pa.list_(pa.int32()))),
    ])),
])

_CATALOGS_SCHEMA = pa.schema(
    [pa.field("catalog_name", pa.string(), nullable=False)])

_DB_SCHEMAS_SCHEMA = pa.schema([
    pa.field("catalog_name", pa.string()),
    pa.field("db_schema_name", pa.string(), nullable=False),
])

CATALOG = "xtdb"
DB_SCHEMA = "public"


def _tables_schema(include_schema: bool) -> pa.Schema:
    fields = [
        pa.field("catalog_name", pa.string()),
        pa.field("db_schema_name", pa.string()),
        pa.field("table_name", pa.string(), nullable=False),
        pa.field("table_type", pa.string(), nullable=False),
    ]
    if include_schema:
        fields.append(pa.field("table_schema", pa.binary(), nullable=False))
    return pa.schema(fields)


def _like_to_glob(pat: str) -> str:
    return pat.replace("%", "*").replace("_", "?")


class FlightSqlHandler:
    """Protocol logic, shared by the Flight server verbs. One instance
    per server; prepared statements are process-local handles (the
    reference keeps them per-connection — flight_sql.clj's fsql-txs /
    stmt maps — but Flight auth contexts are out of scope here)."""

    def __init__(self, session):
        self.session = session
        self._prepared: dict[bytes, str] = {}
        self._lock = threading.Lock()

    # -- helpers
    def _arrow_schema(self, df) -> pa.Schema:
        from pyspark.sql.pandas.types import to_arrow_schema

        return to_arrow_schema(df.schema)

    def _table_names(self) -> list[str]:
        return sorted(self.session.store.tables())

    # -- GetFlightInfo: (schema, ticket) per command
    def info_for(self, name: str, payload: bytes):
        """Arrow schema + ticket bytes for a Flight SQL descriptor
        command, or None if `name` isn't a Flight SQL command we
        serve. The ticket round-trips the command (metadata) or a
        statement handle (queries) — both Any-wrapped, opaque to the
        client, exactly how stock servers behave."""
        f = parse_fields(payload)
        if name == "CommandStatementQuery":
            sql = _first_str(f, 1)
            df = self.session.sql(sql)
            if df is None:
                raise ValueError("DML must go through DoPut "
                                 "(CommandStatementUpdate)")
            ticket = any_wrap("TicketStatementQuery",
                             field_bytes(1, sql.encode()))
            return self._arrow_schema(df), ticket
        if name == "CommandPreparedStatementQuery":
            handle = f.get(1, [b""])[0]
            sql = self._prepared.get(handle)
            if sql is None:
                raise KeyError("unknown prepared statement handle")
            df = self.session.sql(sql)
            return self._arrow_schema(df), any_wrap(name, payload)
        if name == "CommandGetCatalogs":
            return _CATALOGS_SCHEMA, any_wrap(name, payload)
        if name == "CommandGetDbSchemas":
            return _DB_SCHEMAS_SCHEMA, any_wrap(name, payload)
        if name == "CommandGetTables":
            include = bool(f.get(5, [0])[0])
            return _tables_schema(include), any_wrap(name, payload)
        if name == "CommandGetSqlInfo":
            return _SQL_INFO_SCHEMA, any_wrap(name, payload)
        return None

    # -- DoGet: materialize the ticket
    def table_for_ticket(self, name: str, payload: bytes) -> pa.Table:
        f = parse_fields(payload)
        if name == "TicketStatementQuery":
            sql = f.get(1, [b""])[0].decode()
            return self.session.to_arrow(sql)
        if name == "CommandPreparedStatementQuery":
            handle = f.get(1, [b""])[0]
            sql = self._prepared.get(handle)
            if sql is None:
                raise KeyError("unknown prepared statement handle")
            return self.session.to_arrow(sql)
        if name == "CommandGetCatalogs":
            return pa.table({"catalog_name": [CATALOG]},
                            schema=_CATALOGS_SCHEMA)
        if name == "CommandGetDbSchemas":
            pat = _first_str(f, 2, "%")
            rows = ([{"catalog_name": CATALOG, "db_schema_name": DB_SCHEMA}]
                    if fnmatch.fnmatch(DB_SCHEMA, _like_to_glob(pat)) else [])
            return pa.Table.from_pylist(rows, schema=_DB_SCHEMAS_SCHEMA)
        if name == "CommandGetTables":
            pat = _first_str(f, 3, "%")
            include = bool(f.get(5, [0])[0])
            rows = []
            for t in self._table_names():
                if not fnmatch.fnmatch(t, _like_to_glob(pat)):
                    continue
                row = {"catalog_name": CATALOG, "db_schema_name": DB_SCHEMA,
                       "table_name": t, "table_type": "TABLE"}
                if include:
                    row["table_schema"] = self._arrow_schema(
                        self.session.scan(t)).serialize().to_pybytes()
                rows.append(row)
            return pa.Table.from_pylist(rows,
                                        schema=_tables_schema(include))
        if name == "CommandGetSqlInfo":
            return self._sql_info_table(
                [int(v) for v in f.get(1, [])] or None)
        raise ValueError(f"unsupported Flight SQL ticket {name}")

    # -- SqlInfo: the handful of server-identity keys ADBC probes
    _SQL_INFOS: dict[int, str] = {
        0: "xtdb_spark",          # FLIGHT_SQL_SERVER_NAME
        1: "4.0",                 # FLIGHT_SQL_SERVER_VERSION
        2: pa.__version__,        # FLIGHT_SQL_SERVER_ARROW_VERSION
    }

    def _sql_info_table(self, wanted: list[int] | None) -> pa.Table:
        items = [(k, v) for k, v in sorted(self._SQL_INFOS.items())
                 if wanted is None or k in wanted]
        names = pa.array([k for k, _ in items], pa.uint32())
        type_ids = pa.array([0] * len(items), pa.int8())
        offsets = pa.array(range(len(items)), pa.int32())
        children = [
            pa.array([v for _, v in items], pa.string()),
            pa.array([], pa.bool_()),
            pa.array([], pa.int64()),
            pa.array([], pa.int32()),
            pa.array([], pa.list_(pa.string())),
            pa.array([], pa.map_(pa.int32(), pa.list_(pa.int32()))),
        ]
        union = pa.UnionArray.from_dense(
            type_ids, offsets, children,
            field_names=[f.name for f in _SQL_INFO_SCHEMA[1].type],
        )
        return pa.Table.from_arrays([names, union], schema=pa.schema([
            _SQL_INFO_SCHEMA[0],
            pa.field("value", union.type)]))

    # -- DoAction: prepared statements
    def action(self, action_type: str, body: bytes) -> list[bytes] | None:
        """Handle a Flight SQL action; None when `action_type` isn't
        ours. Results are Any-wrapped protobufs, per spec."""
        if action_type == "CreatePreparedStatement":
            wrapped = any_unwrap(body)
            if wrapped is None:
                raise ValueError("expected Any-wrapped request")
            f = parse_fields(wrapped[1])
            sql = _first_str(f, 1)
            df = self.session.sql(sql)
            handle = uuid.uuid4().bytes
            with self._lock:
                self._prepared[handle] = sql
            schema_bytes = (b"" if df is None else
                            self._arrow_schema(df).serialize().to_pybytes())
            result = (field_bytes(1, handle)
                      + field_bytes(2, schema_bytes))
            return [any_wrap("ActionCreatePreparedStatementResult", result)]
        if action_type == "ClosePreparedStatement":
            wrapped = any_unwrap(body)
            if wrapped is None:
                raise ValueError("expected Any-wrapped request")
            f = parse_fields(wrapped[1])
            with self._lock:
                self._prepared.pop(f.get(1, [b""])[0], None)
            return [b""]
        return None
