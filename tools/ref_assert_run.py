#!/usr/bin/env python3
"""Run extracted reference SQL assertions against the engine and
report pass/fail/error per file.

  python tools/ref_assert_run.py [--show N] [file.clj ...]
"""

from __future__ import annotations

import argparse
import datetime as dt
import math
import os
import sys
from decimal import Decimal

from pyspark.sql import Row

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.ref_assert_extract import (Kw, extract,  # noqa: E402
                                      extract_deftests)

BASE = "/root/reference/src/test/clojure/xtdb/"
DEFAULT_FILES = ["sql/expr_test.clj", "sql/temporal_test.clj",
                 "sql/generate_series_test.clj", "sql/with_test.clj",
                 "sql_test.clj"]


def col_name(k: str) -> str:
    if k.startswith("xt/"):
        return "_" + k[3:].replace("-", "_")
    return k.replace("/", "$").replace("-", "_")


def canon(v):
    """Hashable canonical form for multiset comparison across the
    engine's and the reference's value spellings."""
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float, Decimal)):
        try:
            f = float(v)
        except (OverflowError, ValueError):
            return str(v)
        if math.isnan(f):
            return "NaN"
        if math.isinf(f):
            return "Inf" if f > 0 else "-Inf"
        if f == int(f) and abs(f) < 2 ** 53:
            return ("num", int(f))
        return ("num~", f"{f:.9g}")
    if isinstance(v, dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return ("dt", v.isoformat())
    if isinstance(v, dt.date):
        return ("d", v.isoformat())
    if isinstance(v, dt.time):
        return ("t", v.isoformat())
    if isinstance(v, dt.timedelta):
        return ("dur", v.total_seconds())
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return ("bin", bytes(v).hex())
    if isinstance(v, dict):
        return tuple(sorted(
            (str(k), canon(x)) for k, x in v.items() if x is not None))
    return str(v)


def canon_row_engine(row) -> tuple:
    # duplicate output names keep both values, suffixed :1 :2 … like
    # the reference's projection dedup (SELECT * over a join keeps
    # foo._id as _id and bar._id as _id:1)
    seen: dict = {}
    out = []
    for k, v in zip(row.__fields__, row):
        n = seen.get(k, 0)
        seen[k] = n + 1
        name = k if n == 0 else f"{k}:{n}"
        if isinstance(v, Row):
            v = v.asDict(recursive=True)
        if v is not None:
            out.append((name, canon(v)))
    return tuple(sorted(out))


def canon_row_expected(d: dict) -> tuple:
    return tuple(sorted(
        (col_name(str(k)), canon(v)) for k, v in d.items()
        if v is not None))


def _doc_key(k: str) -> str:
    k = str(k)
    if k == "xt/id":
        return "_id"
    if k.startswith("xt/"):
        return "_" + k[3:].replace("-", "_")
    return k.replace("/", "$").replace("-", "_")


def _doc_val(v):
    if isinstance(v, Kw):
        return str(v)
    if isinstance(v, dict):
        return {_doc_key(k): _doc_val(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_doc_val(x) for x in v]
    return v


def _fresh_xt(spark):
    import tempfile
    from datetime import datetime, timedelta

    from xtdb_spark.session import XtdbSession
    from xtdb_spark.tx import TableStore

    xt = XtdbSession.__new__(XtdbSession)
    xt.spark = spark
    xt.store = TableStore(spark, tempfile.mkdtemp(prefix="refassert"))
    xt.sql = XtdbSession.sql.__get__(xt)
    xt.scan = XtdbSession.scan.__get__(xt)

    def _mock_clock(_state=[datetime(2020, 1, 1)]):
        # test_util.clj ->mock-clock: 2020-01-01 + 1 day per tx
        t = _state[0]
        _state[0] = t + timedelta(days=1)
        return t

    xt.store.instant_source = _mock_clock
    return xt


def _replay_tx(xt, ops):
    for op in ops:
        kind = op[0]
        if kind == "sql":
            xt.sql(op[1])
        elif kind == "put":
            _, table, docs, opts = op
            xt.store.put(table.replace("-", "_"),
                         [_doc_val(d) for d in docs],
                         valid_from=opts.get("valid-from"),
                         valid_to=opts.get("valid-to"))
        elif kind == "delete":
            xt.store.delete(op[1].replace("-", "_"),
                            [_doc_val(i) for i in op[2]])
        elif kind == "erase":
            xt.store.erase(op[1].replace("-", "_"),
                           [_doc_val(i) for i in op[2]])


def run_file(spark, relpath: str, show: int = 0):
    """Deftest-scoped replay: fresh store + mock clock per deftest,
    fixtures applied in source order, assertions compared."""
    res = {"file": relpath, "pass": 0, "fail": 0, "error": 0,
           "skipped": 0, "fixture_skipped": 0, "failures": []}
    for d in extract_deftests(BASE + relpath):
        xt = None
        broken = None
        for it in d["items"]:
            kind, line = it[0], it[1]
            if kind == "skip":
                res["skipped"] += 1
                continue
            if kind == "fixture-skip":
                broken = it[2]
                continue
            if xt is None:
                xt = _fresh_xt(spark)
            if kind == "tx":
                if broken:
                    continue
                try:
                    _replay_tx(xt, it[2])
                except Exception:
                    # a failing fixture tx may be EXPECTED (the
                    # reference asserts anomalies on bad txs, then
                    # continues — e.g. the invalid-ID abort). Replay
                    # continues; if the failure was NOT expected the
                    # following assertions fail loudly.
                    pass
                continue
            # assertion
            if broken:
                res["fixture_skipped"] += 1
                continue
            sql, expected = it[2], it[3]
            try:
                rows = xt.sql(sql).collect()
                got = sorted(canon_row_engine(r) for r in rows)
                exp = sorted(canon_row_expected(r) for r in expected)
                if got == exp:
                    res["pass"] += 1
                else:
                    res["fail"] += 1
                    if len(res["failures"]) < show:
                        res["failures"].append(
                            {"line": line, "sql": sql[:200],
                             "got": str(got)[:300],
                             "exp": str(exp)[:300]})
            except Exception as e:
                res["error"] += 1
                if len(res["failures"]) < show:
                    res["failures"].append(
                        {"line": line, "sql": sql[:200],
                         "err": f"{type(e).__name__}: {e}"[:300]})
    return res


def run_file_flat(xt, relpath: str, show: int = 0):
    res = {"file": relpath, "pass": 0, "fail": 0, "error": 0,
           "skipped": 0, "failures": []}
    for a in extract(BASE + relpath):
        if "skip" in a:
            res["skipped"] += 1
            continue
        try:
            rows = xt.sql(a["sql"]).collect()
            got = sorted(canon_row_engine(r) for r in rows)
            exp = sorted(canon_row_expected(r) for r in a["expected"])
            if got == exp:
                res["pass"] += 1
            else:
                res["fail"] += 1
                if len(res["failures"]) < show:
                    res["failures"].append(
                        {"line": a["line"], "sql": a["sql"][:200],
                         "got": str(got)[:300], "exp": str(exp)[:300]})
        except Exception as e:
            res["error"] += 1
            if len(res["failures"]) < show:
                res["failures"].append(
                    {"line": a["line"], "sql": a["sql"][:200],
                     "err": f"{type(e).__name__}: {e}"[:300]})
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="*", default=DEFAULT_FILES)
    ap.add_argument("--show", type=int, default=0)
    args = ap.parse_args()

    from xtdb_spark.session import build_spark

    spark = build_spark("ref-asserts", master="local[8]",
                        shuffle_partitions=1)
    spark.sparkContext.setLogLevel("ERROR")

    import json

    for f in (args.files or DEFAULT_FILES):
        r = run_file(spark, f, show=args.show)
        print(json.dumps(r))


if __name__ == "__main__":
    main()
