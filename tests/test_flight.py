"""Arrow Flight endpoint tests — a real gRPC client (pyarrow.flight)
driving the server: schema negotiation, query execution, bulk ingest
via do_put, admin actions (reference flight_sql.clj test surface:
statement execute + ingest over Flight)."""

import pyarrow as pa
import pytest

from xtdb_spark.flight import FlightClient, serve_flight
from xtdb_spark.session import XtdbSession
from xtdb_spark.tx import TableStore


@pytest.fixture()
def xt(spark, tmp_path):
    s = XtdbSession.__new__(XtdbSession)
    s.spark = spark
    s.store = TableStore(spark, str(tmp_path / "wh"))
    for m in ("sql", "scan", "to_arrow", "put", "delete", "erase", "status"):
        setattr(s, m, getattr(XtdbSession, m).__get__(s))
    return s


@pytest.fixture()
def client(xt):
    server = serve_flight(xt)
    c = FlightClient(server.port)
    yield xt, c
    c.close()
    server.shutdown()


def test_put_then_query_roundtrip(client):
    xt, c = client
    c.put("people", [{"_id": 1, "name": "ada", "score": 9},
                     {"_id": 2, "name": "bob", "score": 7}])
    out = c.sql("SELECT _id, name FROM people ORDER BY _id")
    assert out.column("name").to_pylist() == ["ada", "bob"]
    assert "people" in c.tables()


def test_schema_without_execution(client):
    xt, c = client
    c.put("t", [{"_id": 1, "v": 2.5}])
    schema = c.schema("SELECT _id, v FROM t")
    assert schema.names == ["_id", "v"]
    assert pa.types.is_floating(schema.field("v").type)


def test_temporal_clause_over_flight(client):
    xt, c = client
    tx1 = xt.put("accounts", [{"_id": 1, "bal": 10}])
    xt.put("accounts", [{"_id": 1, "bal": 20}])
    now = c.sql("SELECT bal FROM accounts")
    then = c.sql("SELECT bal FROM accounts FOR SYSTEM_TIME AS OF ?",
                 [str(tx1)])
    assert now.column("bal").to_pylist() == [20]
    assert then.column("bal").to_pylist() == [10]


def test_actions_status_delete(client):
    xt, c = client
    c.put("evts", [{"_id": i, "k": i % 2} for i in range(6)])
    st = c.action("status")
    assert st["n_tables"] == 1 and st["latest_completed_tx"] is not None
    c.action("delete", {"table": "evts", "ids": [0, 2, 4]})
    out = c.sql("SELECT count(*) AS n FROM evts")
    assert out.column("n").to_pylist() == [3]


def test_list_actions_and_unknown_action(client):
    xt, c = client
    names = {a.type for a in c._c.list_actions()}
    assert {"status", "delete", "erase", "optimize"} <= names
    with pytest.raises(Exception):
        c.action("nope")
