"""OpenTelemetry-style trace spans for queries and transactions
(reference core/src/main/clojure/xtdb/tracer.clj: optional span
emission around query planning/execution and tx indexing, behind
config — off by default, zero overhead when off).

No OTel SDK ships in this environment, so spans are produced in the
OTLP data shape directly (trace_id/span_id/parent hierarchy,
nanosecond timestamps, attributes, status) and handed to a pluggable
exporter:

- `JsonlExporter(path)` — one OTLP-shaped span per line; the
  log-exporter default, greppable and test-assertable.
- `CollectingExporter()` — in-memory list (tests, REPL inspection).
- `OtlpHttpExporter(endpoint)` — POSTs OTLP/HTTP JSON
  (`/v1/traces`) with stdlib urllib; import-free, but needs a live
  collector so it is env-gated like the Kafka connector.

Enable with `configure(exporter)` or the `XTDB_SPARK_TRACE=<path>`
environment variable (JSONL exporter). Instrumentation points:
`XtdbSession.sql` (span `xtdb.sql` with the query text) and
`TableStore.submit_tx`/`put` (span `xtdb.tx` with op counts/tx id),
matching tracer.clj's query + tx spans. Nesting: a tx submitted
inside a traced sql call (DML) parents correctly via contextvars.
"""

from __future__ import annotations

import contextlib
import contextvars
import json
import os
import secrets
import threading
import time
from typing import Any

_current_span: contextvars.ContextVar[dict | None] = \
    contextvars.ContextVar("xtdb_trace_span", default=None)

_exporter = None
_lock = threading.Lock()


class CollectingExporter:
    def __init__(self):
        self.spans: list[dict] = []

    def export(self, span: dict) -> None:
        self.spans.append(span)


class JsonlExporter:
    def __init__(self, path: str):
        self.path = path

    def export(self, span: dict) -> None:
        with _lock, open(self.path, "a") as f:
            f.write(json.dumps(span, default=str) + "\n")


class OtlpHttpExporter:
    """OTLP/HTTP JSON to a collector's /v1/traces — stdlib only.
    Env-gated in tests (no collector in the container); the payload
    shape follows the published OTLP JSON encoding."""

    def __init__(self, endpoint: str, service_name: str = "xtdb_spark"):
        self.endpoint = endpoint.rstrip("/") + "/v1/traces"
        self.service = service_name

    def export(self, span: dict) -> None:
        import urllib.request

        body = json.dumps({"resourceSpans": [{
            "resource": {"attributes": [
                {"key": "service.name",
                 "value": {"stringValue": self.service}}]},
            "scopeSpans": [{
                "scope": {"name": "xtdb_spark"},
                "spans": [{
                    "traceId": span["trace_id"],
                    "spanId": span["span_id"],
                    **({"parentSpanId": span["parent_id"]}
                       if span.get("parent_id") else {}),
                    "name": span["name"],
                    "kind": 1,
                    "startTimeUnixNano": str(span["start_ns"]),
                    "endTimeUnixNano": str(span["end_ns"]),
                    "attributes": [
                        {"key": k, "value": {"stringValue": str(v)}}
                        for k, v in span["attributes"].items()],
                    "status": {"code": 2 if span["status"] == "ERROR"
                               else 1},
                }]}]}]}).encode()
        req = urllib.request.Request(
            self.endpoint, data=body,
            headers={"Content-Type": "application/json"})
        urllib.request.urlopen(req, timeout=5)


def configure(exporter) -> None:
    """Install an exporter (None disables tracing)."""
    global _exporter
    _exporter = exporter


def configured():
    return _exporter


def _env_exporter():
    path = os.environ.get("XTDB_SPARK_TRACE")
    if path:
        return JsonlExporter(path)
    return None


@contextlib.contextmanager
def span(name: str, **attributes: Any):
    """Record one span around the body; no-op (one dict lookup) when
    no exporter is configured. Parent/child linkage via contextvars,
    so nested traced calls build a real trace tree."""
    exp = _exporter or _env_exporter()
    if exp is None:
        yield None
        return
    parent = _current_span.get()
    s = {
        "trace_id": (parent["trace_id"] if parent
                     else secrets.token_hex(16)),
        "span_id": secrets.token_hex(8),
        "parent_id": parent["span_id"] if parent else None,
        "name": name,
        "start_ns": time.time_ns(),
        "attributes": {k: v for k, v in attributes.items()
                       if v is not None},
        "status": "OK",
    }
    token = _current_span.set(s)
    try:
        yield s
    except BaseException as e:
        s["status"] = "ERROR"
        s["attributes"]["error.type"] = type(e).__name__
        raise
    finally:
        _current_span.reset(token)
        s["end_ns"] = time.time_ns()
        s["attributes"]["duration_ms"] = round(
            (s["end_ns"] - s["start_ns"]) / 1e6, 3)
        try:
            exp.export(s)
        except Exception:
            # telemetry must never fail the traced operation (a down
            # collector or unwritable trace file would otherwise turn
            # every successful sql()/put()/submit_tx into an error —
            # after the data was already durably written — and, in
            # the exception path, mask the real exception raised by
            # the body). OTel SDKs drop-and-log the same way.
            import logging

            logging.getLogger("xtdb_spark.tracing").warning(
                "trace span export failed", exc_info=True)
