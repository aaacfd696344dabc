"""Regression pins for the round-7 (continuation) self-review
findings: tx-id collisions under explicit system_from reuse, series
lowering duplicating positional ?-params, pgwire double-executing
non-relation portals, trace-export failures leaking into the traced
operation, and sample_frames dying on corrupt container bytes."""

import json
import os
import struct

import pytest

from xtdb_spark.session import XtdbSession
from xtdb_spark.tx import TableStore


@pytest.fixture()
def xt(spark, tmp_path):
    s = XtdbSession.__new__(XtdbSession)
    s.spark = spark
    s.store = TableStore(spark, str(tmp_path / "wh"))
    s.sql = XtdbSession.sql.__get__(s)
    s.submit_tx = XtdbSession.submit_tx.__get__(s)
    return s


# --- tx-id uniqueness under explicit system_from reuse ----------------------


def test_reused_system_from_gets_unique_tx_ids(spark, store):
    """Two txs pinning the SAME explicit system time must get
    distinct tx ids (log offsets are unique by construction in the
    reference, log.clj:70-87) — colliding part-xt{txid}- names would
    let a later failure quarantine the earlier tx's files."""
    store.put("u", [{"_id": 1, "v": "a"}], system_from="2024-01-01")
    store.put("u", [{"_id": 2, "v": "b"}], system_from="2024-01-01")
    ids = [r["_id"] for r in store.txs().collect() if r["committed"]]
    assert len(ids) == len(set(ids)) == 2
    assert store.scan("u").count() == 2


def test_failed_tx_with_reused_system_from_spares_committed_files(
        spark, store):
    """A FAILING second tx that reuses a committed tx's system time
    must quarantine only its own files: before the unique-id fix its
    quarantine glob (part-xt{txid}-*) swept the first tx's committed
    parquet out of the table."""
    store.put("q", [{"_id": 1, "v": "keep"}], system_from="2024-06-01")
    with pytest.raises(ValueError, match="_id"):
        # fails during op evaluation, INSIDE the commit journal
        store.put("q", [{"no_id": 2}], system_from="2024-06-01")
    rows = store.scan("q").collect()
    assert [(r["_id"], r["v"]) for r in rows] == [(1, "keep")]
    led = [json.loads(ln) for ln in
           open(os.path.join(store.warehouse, "_txs.jsonl"))
           if ln.strip()]
    assert [r["committed"] for r in led] == [True, False]
    assert led[0]["tx_id"] != led[1]["tx_id"]


# --- series lowering: ? params bound once, direction preserved --------------


def test_generate_series_positional_params(spark, tmp_path, xt):
    got = xt.sql("SELECT generate_series(?, ?) AS g",
                 [1, 5]).collect()[0]["g"]
    assert list(got) == [1, 2, 3, 4, 5]
    # wrong direction with params still yields [] (not auto-descend)
    got = xt.sql("SELECT generate_series(?, ?) AS g",
                 [10, 3]).collect()[0]["g"]
    assert list(got) == []
    # 3-arg form and the TABLE forms, params after the series too
    got = xt.sql("SELECT generate_series(?, ?, ?) AS g",
                 [1, 7, 2]).collect()[0]["g"]
    assert list(got) == [1, 3, 5, 7]
    rows = xt.sql("SELECT v FROM generate_series(?, ?) AS g(v) "
                  "WHERE v <> ?", [1, 4, 2]).collect()
    assert sorted(r["v"] for r in rows) == [1, 3, 4]
    # range() excludes its end bound without re-emitting the ? arg
    rows = xt.sql("SELECT v FROM range(?, ?) AS g(v)", [1, 4]).collect()
    assert sorted(r["v"] for r in rows) == [1, 2, 3]


def test_series_nondeterministic_args_single_eval(spark, xt):
    """The bounds are bound ONCE into a struct, so a non-deterministic
    argument cannot disagree between the sequence call and its
    direction guard (the array is internally consistent)."""
    for _ in range(5):
        got = xt.sql(
            "SELECT generate_series(1, 1 + CAST(rand() * 5 AS INT)) AS g"
        ).collect()[0]["g"]
        xs = list(got)
        assert xs == list(range(1, xs[-1] + 1)) and 1 <= xs[-1] <= 6


# --- pgwire: non-relation portal executes exactly once ----------------------


def test_execute_portal_runs_dml_once(spark, tmp_path):
    from tests.test_pgwire import PgClient
    from xtdb_spark.pgwire import PgWireServer

    s = XtdbSession.__new__(XtdbSession)
    s.spark = spark
    s.store = TableStore(spark, str(tmp_path / "wh"))
    s.sql = XtdbSession.sql.__get__(s)
    s.submit_tx = XtdbSession.submit_tx.__get__(s)
    srv = PgWireServer(s, port=0).start()
    c = PgClient(srv.port)
    try:
        c.startup()
        c.query("INSERT INTO dp (_id, v) VALUES (1, 'seed')")
        c.query("PREPARE myins AS INSERT INTO dp (_id, v) "
                "VALUES (2, 'once')")
        # Parse/Bind EXECUTE (not matched by _TAG_RE) + Execute with a
        # row limit: xt.sql() runs the DML; the old code then _run()
        # the portal a second time — inserting the row twice
        c.send(b"P", c.cstr("") + c.cstr("EXECUTE myins")
               + struct.pack(">h", 0))
        c.send(b"B", c.cstr("") + c.cstr("") + struct.pack(">hhh", 0, 0, 0))
        c.send(b"E", c.cstr("") + struct.pack(">i", 100))
        c.send(b"S", b"")
        c.collect_results()
        results, _tags = c.query(
            "SELECT COUNT(*) AS n FROM dp WHERE _id = 2")
        assert results[-1][1] == [["1"]]
        n_events = s.store.events("dp").count()
        assert n_events == 2  # seed + exactly one EXECUTE insert
    finally:
        c.close()
        srv.stop()


# --- tracing: exporter failure never fails the traced op --------------------


def test_trace_export_failure_is_swallowed(xt):
    from xtdb_spark import tracing

    class Boom:
        def export(self, span):
            raise OSError("collector down")

    tracing.configure(Boom())
    try:
        xt.store.put("tr2", [{"_id": 1, "v": 5}])   # must not raise
        assert xt.sql("SELECT v FROM tr2").collect()[0]["v"] == 5
    finally:
        tracing.configure(None)


# --- sample_frames: corrupt container bytes -----------------------------


def test_sample_frames_corrupt_gif(spark):
    from xtdb_spark.pipeline.multimodal import sample_frames

    rows = [(1, "video", bytearray(b"GIF89a\x01"))]  # truncated header
    df = spark.createDataFrame(rows,
                               "media_id long, kind string, content binary")
    with pytest.raises(Exception, match="undecodable video bytes"):
        sample_frames(df).collect()
    # skip mode drops the corrupt row instead of failing the stage
    assert sample_frames(df, on_error="skip").count() == 0
    # fake_decode still stubs corrupt bytes (unchanged behavior)
    assert sample_frames(df, fake_decode=True).count() == 4
