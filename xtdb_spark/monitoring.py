"""Monitoring endpoints: /healthz + /metrics over HTTP.

Reference: the node serves liveness/readiness/startup probes
(reference core/src/main/clojure/xtdb/healthz.clj:1-211) and a
Prometheus-scrapable metrics registry
(core/src/main/clojure/xtdb/metrics.clj:1-80). The Spark-first
counterpart is a tiny stdlib HTTP server over the same store-derived
counters that back the `xt.metrics` SQL view
(:func:`xtdb_spark.sources.info_schema.xt_metrics`) — no metrics
daemon, no deps.

Endpoints:

- ``GET /healthz/alive``   — 200 once the server runs (liveness)
- ``GET /healthz/ready``   — 200 when the SparkSession answers a
  trivial action, 503 otherwise (readiness)
- ``GET /healthz/started`` — alias of ready (startup probe)
- ``GET /metrics``         — Prometheus text exposition of the store
  counters + JVM/executor gauges Spark exposes locally

Scale note: these are driver-side, O(files) endpoints — the metric
sources are the manifest and the tx log, never a data scan, so a
scrape stays cheap no matter the table size.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def _prometheus_lines(xt) -> str:
    from xtdb_spark.sources.info_schema import xt_metrics

    lines = []
    for row in xt_metrics(xt.spark, xt.store).collect():
        name = f"xtdb_{row['metric']}"
        lines.append(f"# TYPE {name} gauge")
        lines.append(f"{name} {row['value']}")
    try:
        sc = xt.spark.sparkContext
        lines.append("# TYPE xtdb_spark_default_parallelism gauge")
        lines.append(f"xtdb_spark_default_parallelism {sc.defaultParallelism}")
    except Exception:
        pass
    return "\n".join(lines) + "\n"


class MonitoringServer:
    """`MonitoringServer(xt).start()` → `curl :port/healthz/ready`."""

    def __init__(self, xt, host: str = "127.0.0.1", port: int = 0):
        self.xt = xt
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _reply(self, code: int, body: str,
                       ctype: str = "text/plain; version=0.0.4"):
                data = body.encode()
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                if self.path == "/healthz/alive":
                    self._reply(200, "alive\n")
                elif self.path in ("/healthz/ready", "/healthz/started"):
                    try:
                        outer.xt.spark.range(1).count()
                        self._reply(200, "ready\n")
                    except Exception as e:
                        self._reply(503, f"not ready: {e}\n")
                elif self.path == "/metrics":
                    try:
                        self._reply(200, _prometheus_lines(outer.xt))
                    except Exception as e:
                        self._reply(500, f"metrics error: {e}\n")
                else:
                    self._reply(404, "not found\n")

        self._server = ThreadingHTTPServer((host, port), Handler)
        self.port = self._server.server_address[1]
        self._thread: threading.Thread | None = None

    def start(self) -> "MonitoringServer":
        self._thread = threading.Thread(target=self._server.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
