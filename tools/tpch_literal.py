#!/usr/bin/env python3
"""Literal TPC-H parity: run the reference's own 22 query texts
VERBATIM against this engine and compare with the reference's own
golden results.

- Query texts: reference src/test/resources/xtdb/sql/tpch/q01-22.sql
  (FROM-first pipeline dialect, `_id`-keyed joins, FETCH FIRST,
  WITH MATERIALIZED, EXISTS(FROM …)).
- Data: DuckDB's built-in `dbgen` — the same spec-exact TPC-H
  generator the reference uses (io.airlift.tpch is dbgen's Java
  port; both implement the TPC-H spec's seeded generation, verified
  by value equality below) — transformed exactly like the
  reference's loader (modules/datasets/…/tpch.clj:20-66):
  IDENTIFIER columns become UUIDs via sha256("s" + "<suffix>_<n>")
  [:16] (core Iid.kt asIid over the "<suffix>_<n>" string), DOUBLE
  columns are float64, `_id` is the pk column's value (composite
  pks join with "___", tpch.clj doc->id).
- Golden: src/test/resources/xtdb/tpch/results-sf-001.edn compared
  with tpch_test.clj's is-equal? (ordered rows, same key set,
  numeric epsilon 0.001).

Usage: python tools/tpch_literal.py [--sf 0.001] [--qs 1,2,...]
"""

from __future__ import annotations

import hashlib
import os
import re
import sys
import uuid
from datetime import date
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_SQL_DIR = "/root/reference/src/test/resources/xtdb/sql/tpch"
REF_GOLDEN = "/root/reference/src/test/resources/xtdb/tpch/results-sf-001.edn"

# airlift tpch column types: every *key column is IDENTIFIER
# (modules/datasets tpch.clj cell-reader) — the uuid is derived from
# the column suffix, so FKs hash identically to their target pk
_IDENT_SUFFIXES = ("partkey", "suppkey", "custkey", "orderkey",
                   "nationkey", "regionkey")

_PKEYS = {            # tpch.clj table->pkey
    "region": ["r_regionkey"],
    "nation": ["n_nationkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "partsupp": ["ps_partkey", "ps_suppkey"],
    "customer": ["c_custkey"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_linenumber"],
}

TABLES = list(_PKEYS)


def ref_uuid(col: str, n) -> str:
    """tpch.clj cell-reader for IDENTIFIER columns: the column name
    minus its table prefix + "_" + value, through Iid.kt asIid
    (sha256("s"+str)[:16]) as a UUID."""
    suffix = col.split("_", 1)[1]
    h = hashlib.sha256(f"s{suffix}_{n}".encode()).digest()[:16]
    return str(uuid.UUID(bytes=h))


def _ident_col(col: str) -> bool:
    return col.split("_", 1)[1] in _IDENT_SUFFIXES


def dbgen_rows(sf: float) -> dict[str, list[dict]]:
    import duckdb

    con = duckdb.connect()
    con.sql(f"CALL dbgen(sf={sf})")
    out = {}
    for t in TABLES:
        cols = [d[0] for d in con.sql(f"SELECT * FROM {t} LIMIT 0").description]
        rows = []
        for tup in con.sql(f"SELECT * FROM {t}").fetchall():
            r = {}
            for c, v in zip(cols, tup):
                if _ident_col(c):
                    r[c] = ref_uuid(c, v)
                elif isinstance(v, Decimal):
                    r[c] = float(v)
                else:
                    r[c] = v
            pk = _PKEYS[t]
            r["_id"] = (r[pk[0]] if len(pk) == 1
                        else "___".join(str(r[k]) for k in pk))
            rows.append(r)
        out[t] = rows
    return out


def load_store(xt, sf: float = 0.001) -> None:
    for t, rows in dbgen_rows(sf).items():
        xt.put(t, rows)


def query_texts() -> dict[int, str]:
    out = {}
    for n in range(1, 23):
        with open(os.path.join(REF_SQL_DIR, f"q{n:02d}.sql")) as f:
            out[n] = f.read()
    return out


def load_golden(path: str = REF_GOLDEN) -> list[list[dict]]:
    from xtdb_spark.xtql_edn import Keyword, read_edn

    def plain(v):
        if isinstance(v, Keyword):
            return v.name if hasattr(v, "name") else str(v)
        return v

    forms = read_edn(open(path).read())
    out = []
    for qrows in forms:
        rows = []
        for m in qrows:
            rows.append({str(k)[1:] if str(k).startswith(":") else
                         getattr(k, "name", str(k)): v
                         for k, v in m.items()})
        out.append(rows)
    return out


def _norm(v):
    """normalize engine/golden values into a comparable space"""
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, date):
        return v.isoformat()
    return v


def rows_equal(expected: list[dict], actual: list[dict],
               eps: float = 0.001) -> tuple[bool, str]:
    """tpch_test.clj is-equal?: ordered rows, same key sets, numeric
    epsilon, equality otherwise."""
    if len(expected) != len(actual):
        return False, f"row count {len(actual)} != {len(expected)}"
    for i, (e, a) in enumerate(zip(expected, actual)):
        if set(e) != set(a):
            return False, f"row {i} keys {sorted(a)} != {sorted(e)}"
        for k in e:
            x, y = _norm(e[k]), _norm(a[k])
            if isinstance(x, (int, float)) and isinstance(y, (int, float)) \
                    and not isinstance(x, bool) and not isinstance(y, bool):
                if abs(float(x) - float(y)) > eps:
                    return False, f"row {i} {k}: {y} != {x}"
            elif str(x) != str(y):
                return False, f"row {i} {k}: {y!r} != {x!r}"
    return True, ""


def run_query(xt, text: str) -> list[dict]:
    df = xt.sql(text)
    return [r.asDict() for r in df.collect()]


def main():
    import argparse
    import time

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.001)
    ap.add_argument("--qs", default=None,
                    help="comma-separated query numbers")
    ap.add_argument("--no-golden", action="store_true",
                    help="run + print rowcounts only (non-0.001 sf)")
    args = ap.parse_args()
    qs = ([int(x) for x in args.qs.split(",")] if args.qs
          else list(range(1, 23)))

    from xtdb_spark.session import XtdbSession, build_spark

    spark = build_spark("tpch-literal", master="local[8]",
                        shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    import tempfile

    wh = tempfile.mkdtemp(prefix="tpch_lit_")
    xt = XtdbSession(spark, wh)
    t0 = time.time()
    load_store(xt, args.sf)
    print(f"ingest {time.time()-t0:.1f}s")
    golden = None if args.no_golden else load_golden()
    texts = query_texts()
    npass = nfail = 0
    for n in qs:
        t0 = time.time()
        try:
            rows = run_query(xt, texts[n])
        except Exception as e:
            print(f"Q{n:02d} ERROR {type(e).__name__}: {e}")
            nfail += 1
            continue
        dt = time.time() - t0
        if golden is None:
            print(f"Q{n:02d} {len(rows)} rows ({dt:.1f}s)")
            continue
        ok, msg = rows_equal(golden[n - 1], rows)
        print(f"Q{n:02d} {'PASS' if ok else 'FAIL'} "
              f"{len(rows)} rows ({dt:.1f}s) {msg}")
        npass += ok
        nfail += not ok
    print(f"{npass} pass, {nfail} fail")
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main()
