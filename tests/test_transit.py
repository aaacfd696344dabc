"""transit-json reader (xtdb_spark/transit.py) — the reference's
primary document wire codec (types.clj:284-294, pgwire.clj:1324),
subset per the public transit-format spec."""

from datetime import datetime

import pytest

from xtdb_spark.transit import loads, parse_lines


@pytest.fixture()
def xt(spark, tmp_path):
    from xtdb_spark.session import XtdbSession
    from xtdb_spark.tx import TableStore

    s = XtdbSession.__new__(XtdbSession)
    s.spark = spark
    s.store = TableStore(spark, str(tmp_path / "wh"))
    s.sql = XtdbSession.sql.__get__(s)
    s.scan = XtdbSession.scan.__get__(s)
    return s


def test_scalars_and_keywords():
    assert loads('{"~:name": "a", "~:age": 30}') == {"name": "a",
                                                     "age": 30}
    assert loads('"~i9007199254740993"') == 9007199254740993
    assert loads('"~t2024-01-15T10:30:00.123Z"') == \
        datetime(2024, 1, 15, 10, 30, 0, 123000)
    assert loads('"~?t"') is True and loads('"~?f"') is False
    assert loads('"~~tilde"') == "~tilde"
    assert loads('"~^caret"') == "^caret"
    assert loads('"`backtick"') == "backtick"
    assert loads('"~u531a379e-31bb-4ce1-8690-158dceb64be6"') == \
        "531a379e-31bb-4ce1-8690-158dceb64be6"
    assert loads('"~baGV5"') == b"hey"
    assert loads('"~zINF"') == float("inf")


def test_map_as_array_and_nesting():
    got = loads('["^ ", "~:_id", 1, "~:tags", ["a", "b"], '
                '"~:addr", ["^ ", "~:city", "Oslo"]]')
    assert got == {"_id": 1, "tags": ["a", "b"],
                   "addr": {"city": "Oslo"}}


def test_cache_codes():
    # writer caches "~:name"(idx 0) and "~:category"(idx 1) from doc
    # keys; later docs reference them as ^0 / ^1
    line = ('[["^ ", "~:name", "a", "~:category", "x"], '
            '["^ ", "^0", "b", "^1", "y"]]')
    got = loads(line)
    assert got == [{"name": "a", "category": "x"},
                   {"name": "b", "category": "y"}]


def test_tagged_forms():
    assert loads('["~#\'", 5]') == 5
    assert loads('["~#list", [1, 2]]') == [1, 2]
    assert loads('["~#set", [1, 2]]') == [1, 2]
    import pytest
    with pytest.raises(ValueError, match="unsupported transit tag"):
        loads('["~#point", [1, 2]]')


def test_parse_lines():
    data = (b'["^ ", "~:_id", 1, "~:name", "alice"]\n'
            b'["^ ", "~:_id", 2, "~:name", "bob", "~:age", 30]\n')
    rows = parse_lines(data)
    assert rows == [{"_id": 1, "name": "alice"},
                    {"_id": 2, "name": "bob", "age": 30}]


def test_copy_transit_json_over_wire(xt):
    """COPY <t> FROM STDIN WITH (FORMAT 'transit-json') e2e."""
    import struct

    from xtdb_spark.pgwire import PgWireServer
    from tests.test_pgwire import PgClient

    srv = PgWireServer(xt, port=0).start()
    try:
        c = PgClient(srv.port)
        c.startup()
        c.send(b"Q", c.cstr(
            "COPY tj_docs FROM STDIN WITH (FORMAT 'transit-json')"))
        t, _ = c.read_msg()
        assert t == b"G"
        payload = (b'["^ ", "~:_id", 1, "~:name", "alice", '
                   b'"~:joined", "~t2024-01-15T00:00:00Z"]\n'
                   b'["^ ", "~:_id", 2, "~:name", "bob"]\n')
        c.send(b"d", payload)
        c.send(b"c", b"")
        _, tags = c.collect_results()
        assert tags == ["COPY 2"]
        res, _ = c.query(
            "SELECT _id, name, joined FROM tj_docs ORDER BY _id")
        rows = res[0][1]
        assert rows[0][:2] == ["1", "alice"]
        assert rows[0][2].startswith("2024-01-15")
        assert rows[1] == ["2", "bob", None]
        c.close()
    finally:
        srv.stop()


def test_cache_order_matches_writer():
    """Writer cache order: a map's KEY caches before its value, and
    ^N references never re-enter the cache (review regression: the
    value expression evaluated first, misaligning every later
    index)."""
    # writer order: ^0 = ~:aaaa (key), ^1 = ~#list (tag in value),
    # ^2 = ~:bbbb; the later ["^1", [2]] must resolve to ~#list
    line = ('["^ ", "~:aaaa", ["~#list", [1]], '
            '"~:bbbb", ["^1", [2]], "^0", ["^1", [3]]]')
    got = loads(line)
    assert got == {"aaaa": [3], "bbbb": [2]} or \
        list(got.items()) == [("aaaa", [3]), ("bbbb", [2])]
    # repeated tag refs keep resolving after many entries
    line2 = ('[["^ ", "~:key1", ["~#set", [1]]], '
             '["^ ", "^0", ["^1", [2]]]]')
    assert loads(line2) == [{"key1": [1]}, {"key1": [2]}]


# ---- transit-msgpack (same transit semantics, MessagePack framing)

def _mp(v):
    """Tiny MessagePack ENCODER for test payloads (the container has
    no msgpack lib; the module under test only decodes)."""
    import struct

    if v is None:
        return b"\xc0"
    if v is True:
        return b"\xc3"
    if v is False:
        return b"\xc2"
    if isinstance(v, int):
        if 0 <= v <= 0x7F:
            return bytes([v])
        if -32 <= v < 0:
            return bytes([v & 0xFF])
        return b"\xd3" + struct.pack(">q", v)
    if isinstance(v, float):
        return b"\xcb" + struct.pack(">d", v)
    if isinstance(v, bytes):
        return b"\xc4" + bytes([len(v)]) + v
    if isinstance(v, str):
        b = v.encode()
        if len(b) <= 31:
            return bytes([0xA0 | len(b)]) + b
        return b"\xd9" + bytes([len(b)]) + b
    if isinstance(v, list):
        n = len(v)
        head = (bytes([0x90 | n]) if n <= 15
                else b"\xdc" + struct.pack(">H", n))
        return head + b"".join(_mp(x) for x in v)
    if isinstance(v, dict):
        n = len(v)
        head = (bytes([0x80 | n]) if n <= 15
                else b"\xde" + struct.pack(">H", n))
        return head + b"".join(_mp(k) + _mp(x) for k, x in v.items())
    raise TypeError(type(v))


def test_msgpack_scalars_and_maps():
    from xtdb_spark.transit import loads_msgpack

    doc = {"~:_id": 1, "~:name": "a", "~:big": "~i9007199254740993",
           "~:when": "~t2024-01-15T10:30:00.123Z",
           "~:blob": b"\x00\x01", "~:pi": 3.5, "~:neg": -7,
           "~:tags": ["x", "y"], "~:addr": {"~:city": "Oslo"}}
    got = loads_msgpack(_mp(doc))
    assert got == {"_id": 1, "name": "a", "big": 9007199254740993,
                   "when": datetime(2024, 1, 15, 10, 30, 0, 123000),
                   "blob": b"\x00\x01", "pi": 3.5, "neg": -7,
                   "tags": ["x", "y"], "addr": {"city": "Oslo"}}
    # map-as-array form with cache refs across keys
    m = ["^ ", "~:category", "books", "~:subcategory", "^0"]
    assert loads_msgpack(_mp(m)) == {"category": "books",
                                     "subcategory": "category"}


def test_msgpack_stream_and_per_message_cache():
    from xtdb_spark.transit import parse_msgpack

    d1 = {"~:product_name": "a", "~:category_code": "c1"}
    d2 = {"^0": "b", "^1": "c2"}           # refs into doc-1's cache?
    # NO — cache lifetime is per message; each doc re-spells its keys
    data = _mp(d1) + _mp(d1)
    rows = parse_msgpack(data)
    assert rows == [{"product_name": "a", "category_code": "c1"}] * 2
    # within ONE message refs work (nested maps share the cache)
    nested = {"~:product_name": "a",
              "~:inner": {"^0": "ref-to-product_name"}}
    rows = parse_msgpack(_mp(nested))
    assert rows == [{"product_name": "a",
                     "inner": {"product_name": "ref-to-product_name"}}]
    # and a stale cross-message ref fails loudly
    with pytest.raises(ValueError):
        parse_msgpack(_mp(d1) + _mp(d2))
