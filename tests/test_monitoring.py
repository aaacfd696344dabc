"""Healthz + Prometheus metrics endpoint tests (reference
healthz.clj:1-211, metrics.clj:1-80)."""

import urllib.request

import pytest

from xtdb_spark.monitoring import MonitoringServer
from xtdb_spark.session import XtdbSession
from xtdb_spark.tx import TableStore


@pytest.fixture()
def xt(spark, tmp_path):
    s = XtdbSession.__new__(XtdbSession)
    s.spark = spark
    s.store = TableStore(spark, str(tmp_path / "wh"))
    return s


def _get(port, path):
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
            return r.status, r.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


def test_healthz_and_metrics(xt):
    xt.store.put("mon", [{"_id": 1, "v": 1}], system_from="2024-01-01")
    srv = MonitoringServer(xt).start()
    try:
        assert _get(srv.port, "/healthz/alive") == (200, "alive\n")
        code, _ = _get(srv.port, "/healthz/ready")
        assert code == 200
        code, body = _get(srv.port, "/metrics")
        assert code == 200
        assert "# TYPE xtdb_txs_total gauge" in body
        assert "xtdb_txs_total 1.0" in body
        assert "xtdb_storage_files_total 1.0" in body
        assert _get(srv.port, "/nope")[0] == 404
    finally:
        srv.stop()
