"""Trace spans for sql() + submit_tx (reference tracer.clj: optional
query/tx span emission behind config; off by default)."""

import json

import pytest

from xtdb_spark import tracing
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


@pytest.fixture()
def collector():
    exp = tracing.CollectingExporter()
    tracing.configure(exp)
    yield exp
    tracing.configure(None)


def test_off_by_default_no_spans(xt):
    assert tracing.configured() is None
    xt.store.put("nt", [{"_id": 1}])     # must not raise / record


def test_sql_and_tx_spans_with_timing(xt, collector):
    xt.store.put("tr", [{"_id": 1, "v": 5}], system_from="2024-01-01")
    xt.sql("SELECT v FROM tr").collect()
    xt.submit_tx([("put", "tr", [{"_id": 2, "v": 6}])])

    names = [s["name"] for s in collector.spans]
    assert names.count("xtdb.tx") == 2 and "xtdb.sql" in names

    sql_span = next(s for s in collector.spans if s["name"] == "xtdb.sql")
    assert "SELECT v FROM tr" in sql_span["attributes"]["sql"]
    assert sql_span["end_ns"] > sql_span["start_ns"]
    assert sql_span["attributes"]["duration_ms"] > 0
    assert sql_span["status"] == "OK"

    tx_span = collector.spans[-1]
    assert tx_span["attributes"]["kind"] == "submit_tx"
    assert tx_span["attributes"]["n_ops"] == 1
    assert tx_span["attributes"]["tx_id"] > 0


def test_nested_dml_parents_under_sql_span(xt, collector):
    """INSERT through sql() runs a put — the tx span must be a CHILD
    of the sql span (same trace id, parent linkage)."""
    xt.sql("INSERT INTO nest (_id, v) VALUES (1, 'a')")
    sql_span = next(s for s in collector.spans if s["name"] == "xtdb.sql")
    tx_span = next(s for s in collector.spans if s["name"] == "xtdb.tx")
    assert tx_span["trace_id"] == sql_span["trace_id"]
    assert tx_span["parent_id"] == sql_span["span_id"]
    assert sql_span["parent_id"] is None


def test_error_status_recorded(xt, collector):
    with pytest.raises(Exception):
        xt.sql("SELECT broken syntax here FROM FROM")
    errs = [s for s in collector.spans if s["status"] == "ERROR"]
    assert errs and "error.type" in errs[0]["attributes"]


def test_jsonl_exporter(xt, tmp_path):
    path = str(tmp_path / "trace.jsonl")
    tracing.configure(tracing.JsonlExporter(path))
    try:
        xt.store.put("jt", [{"_id": 1}], system_from="2024-01-01")
        xt.sql("SELECT _id FROM jt").collect()
    finally:
        tracing.configure(None)
    spans = [json.loads(ln) for ln in open(path)]
    assert {s["name"] for s in spans} == {"xtdb.tx", "xtdb.sql"}
    assert all(s["end_ns"] > s["start_ns"] for s in spans)


def test_otlp_payload_shape(monkeypatch):
    """OTLP/HTTP exporter builds a spec-shaped payload (no collector
    in the container — capture the request instead of sending)."""
    sent = {}

    def fake_urlopen(req, timeout=None):
        sent["url"] = req.full_url
        sent["body"] = json.loads(req.data)
        class R:  # noqa: D401
            pass
        return R()

    import urllib.request
    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    tracing.configure(tracing.OtlpHttpExporter("http://collector:4318"))
    try:
        with tracing.span("probe", foo="bar"):
            pass
    finally:
        tracing.configure(None)
    assert sent["url"].endswith("/v1/traces")
    s = sent["body"]["resourceSpans"][0]["scopeSpans"][0]["spans"][0]
    assert s["name"] == "probe" and len(s["traceId"]) == 32
    assert {"key": "foo", "value": {"stringValue": "bar"}} in s["attributes"]
