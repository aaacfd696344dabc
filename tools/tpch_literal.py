#!/usr/bin/env python3
"""Literal TPC-H parity: run the reference's own 22 query texts
VERBATIM against this engine and compare with the reference's own
golden results.

- Query texts: reference src/test/resources/xtdb/sql/tpch/q01-22.sql
  (FROM-first pipeline dialect, `_id`-keyed joins, FETCH FIRST,
  WITH MATERIALIZED, EXISTS(FROM ...)).
- Data: DuckDB's built-in `dbgen` (the C dbgen lineage), transformed
  exactly like the reference's loader (modules/datasets/.../
  tpch.clj:20-66): IDENTIFIER columns become UUIDs via
  sha256("s" + "<suffix>_<n>")[:16] (core Iid.kt asIid), DOUBLE
  columns are float64, `_id` is the pk column's value (composite pks
  join with "___", tpch.clj doc->id).
- Golden: src/test/resources/xtdb/tpch/results-sf-001.edn (sf 0.001)
  / results-sf-01.edn (sf 0.01), compared with tpch_test.clj's
  is-equal? (ordered rows, same key set, numeric epsilon 0.001,
  null columns ABSENT from the reference's result maps).

Generator caveat (measured, not assumed): the reference's loader
uses io.airlift.tpch, whose pseudo-text streams (addresses, comments,
part names) deliberately deviate from C dbgen's — numeric, date,
phone, key and decimal columns are value-identical (verified:
c_custkey 121 has the same phone/acctbal in both, different
c_address/c_comment). The comparison therefore runs in tiers:

  golden       — exact ordered-row match vs the reference's edn
  golden-mod   — exact vs golden after dropping the V-string /
                 comment columns the generators disagree on
                 (projection-only text: c_address, s_address,
                 s_comment); every OTHER column still matches
  duckdb       — engine-vs-engine on IDENTICAL data: DuckDB's own
                 built-in TPC-H query for the same number (PRAGMA
                 tpch(n)) over the very dbgen tables we ingested,
                 compared positionally (multiset, numeric epsilon) —
                 catches everything the golden tier can't when the
                 query FILTERS on generated text (q9 p_name, q13
                 o_comment, q20 p_name)

Every query must pass the duckdb tier; the battery also reports how
many pass each golden tier.

Usage: python tools/tpch_literal.py [--sf 0.001|0.01] [--qs 1,2,...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import uuid
from datetime import date, datetime
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_SQL_DIR = "/root/reference/src/test/resources/xtdb/sql/tpch"
REF_GOLDEN = {
    0.001: "/root/reference/src/test/resources/xtdb/tpch/results-sf-001.edn",
    0.01: "/root/reference/src/test/resources/xtdb/tpch/results-sf-01.edn",
}

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

# pseudo-text columns where airlift (golden) and dbgen (our data)
# diverge BY GENERATOR DESIGN; projection-only in the query set
_TEXTPOOL_COLS = {"c_address", "s_address", "s_comment", "c_comment"}


def ref_uuid(col: str, n) -> str:
    """tpch.clj cell-reader for IDENTIFIER columns: the column name
    minus its table prefix + "_" + value, through Iid.kt asIid
    (sha256("s"+str)[:16]) as a UUID."""
    suffix = col.split("_", 1)[1]
    h = hashlib.sha256(f"s{suffix}_{n}".encode()).digest()[:16]
    return str(uuid.UUID(bytes=h))


def _ident_col(col: str) -> bool:
    return col.split("_", 1)[1] in _IDENT_SUFFIXES


def dbgen_connection(sf: float):
    """dbgen tables with DOCUMENT-KEY semantics: at tiny scale
    factors dbgen emits duplicate partsupp composite keys (sf0.001:
    800 rows, 700 distinct (ps_partkey, ps_suppkey)); document
    ingestion keyed on `_id` keeps the LAST occurrence (within-tx
    later-op-wins — matches the reference's golden results), so the
    comparison engine must see the same deduped relation."""
    import duckdb

    con = duckdb.connect()
    con.sql(f"CALL dbgen(sf={sf})")
    for t, pk in _PKEYS.items():
        n, d = con.sql(f"SELECT count(*), count(DISTINCT ({', '.join(pk)}))"
                       f" FROM {t}").fetchone()
        if n != d:
            keys = ", ".join(pk)
            con.sql(f"""CREATE OR REPLACE TABLE {t} AS
                SELECT * EXCLUDE (__rn) FROM (
                  SELECT *, row_number() OVER (
                    PARTITION BY {keys} ORDER BY rowid DESC) AS __rn
                  FROM {t}) WHERE __rn = 1""")
    return con


def dbgen_rows(con) -> dict[str, list[dict]]:
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


def load_store(xt, sf: float = 0.001, con=None) -> None:
    if con is None:
        con = dbgen_connection(sf)
    for t, rows in dbgen_rows(con).items():
        xt.put(t, rows)


def query_texts() -> dict[int, str]:
    out = {}
    for n in range(1, 23):
        with open(os.path.join(REF_SQL_DIR, f"q{n:02d}.sql")) as f:
            out[n] = f.read()
    return out


def load_golden(sf: float) -> list[list[dict]]:
    from xtdb_spark.xtql_edn import Keyword, read_edn

    forms = read_edn(open(REF_GOLDEN[sf]).read())
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
    if isinstance(v, datetime):
        return v.date().isoformat()
    if isinstance(v, date):
        return v.isoformat()
    return v


def _drop_nulls(rows: list[dict]) -> list[dict]:
    """the reference's result maps OMIT null columns (absent, not
    nil) — e.g. q17/q19 at sf0.001 are [{}] for a null aggregate"""
    return [{k: v for k, v in r.items() if v is not None} for r in rows]


def rows_equal(expected: list[dict], actual: list[dict],
               eps: float = 0.001, drop_cols: frozenset = frozenset(),
               ) -> tuple[bool, str]:
    """tpch_test.clj is-equal?: ordered rows, same key sets, numeric
    epsilon, equality otherwise."""
    actual = _drop_nulls(actual)
    if drop_cols:
        expected = [{k: v for k, v in r.items() if k not in drop_cols}
                    for r in expected]
        actual = [{k: v for k, v in r.items() if k not in drop_cols}
                  for r in actual]
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


def duck_rows(con, n: int) -> list[list]:
    """DuckDB's own TPC-H query n over the same dbgen tables,
    IDENTIFIER columns mapped through the same uuid transform so the
    values are directly comparable to ours."""
    rel = con.sql(f"PRAGMA tpch({n})")
    cols = [d[0] for d in rel.description]
    out = []
    for tup in rel.fetchall():
        row = []
        for c, v in zip(cols, tup):
            if "_" in c and _ident_col(c) and v is not None:
                row.append(ref_uuid(c, v))
            else:
                row.append(_norm(v))
        out.append(row)
    return out


def _sort_key(row: list) -> str:
    return repr([None if v is None else
                 (round(v, 2) if isinstance(v, float) else v)
                 for v in row])


def duck_equal(duck: list[list], actual: list[dict]) -> tuple[bool, str]:
    """positional multiset compare with numeric epsilon — the
    reference texts and DuckDB's queries both follow the spec's
    SELECT order, but alias names differ; tie order under partial
    ORDER BY is engine-specific, hence multiset."""
    ours = [[_norm(v) for v in r.values()] for r in actual]
    if len(duck) != len(ours):
        return False, f"row count {len(ours)} != duck {len(duck)}"
    if duck and len(duck[0]) != len(ours[0]):
        return False, f"col count {len(ours[0])} != duck {len(duck[0])}"
    for e, a in zip(sorted(duck, key=_sort_key), sorted(ours, key=_sort_key)):
        for x, y in zip(e, a):
            if isinstance(x, (int, float)) and isinstance(y, (int, float)) \
                    and not isinstance(x, bool) and not isinstance(y, bool):
                if abs(float(x) - float(y)) > max(0.02, 1e-9 * abs(float(x))):
                    return False, f"{y} != duck {x}"
            elif x != y and str(x) != str(y):
                return False, f"{y!r} != duck {x!r}"
    return True, ""


def run_query(xt, text: str) -> list[dict]:
    df = xt.sql(text)
    return [r.asDict() for r in df.collect()]


def run_battery(xt, con, sf: float, qs=None, verbose=True):
    """Returns {n: (tier, msg)} — tier one of 'golden', 'golden-mod',
    'duckdb', 'FAIL', 'ERROR'."""
    import time

    golden = load_golden(sf) if sf in REF_GOLDEN else None
    texts = query_texts()
    results = {}
    for n in qs or range(1, 23):
        t0 = time.time()
        try:
            rows = run_query(xt, texts[n])
        except Exception as e:
            results[n] = ("ERROR", f"{type(e).__name__}: {e}")
            if verbose:
                print(f"Q{n:02d} ERROR {results[n][1]}")
            continue
        dt = time.time() - t0
        dok, dmsg = duck_equal(duck_rows(con, n), rows)
        tier, msg = "FAIL", dmsg
        if golden is not None:
            gok, gmsg = rows_equal(golden[n - 1], rows)
            if gok and dok:
                tier, msg = "golden", ""
            elif dok:
                mok, _ = rows_equal(golden[n - 1], rows,
                                    drop_cols=frozenset(_TEXTPOOL_COLS))
                tier = "golden-mod" if mok else "duckdb"
                msg = "" if mok else f"golden: {gmsg}"
        elif dok:
            tier, msg = "duckdb", ""
        results[n] = (tier, msg)
        if verbose:
            print(f"Q{n:02d} {tier:10s} {len(rows)} rows ({dt:.1f}s) {msg}")
    return results


def main():
    import argparse
    import tempfile
    import time

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.001)
    ap.add_argument("--qs", default=None,
                    help="comma-separated query numbers")
    args = ap.parse_args()
    qs = ([int(x) for x in args.qs.split(",")] if args.qs
          else list(range(1, 23)))

    from xtdb_spark.session import XtdbSession, build_spark

    spark = build_spark("tpch-literal", master="local[8]",
                        shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    wh = tempfile.mkdtemp(prefix="tpch_lit_")
    xt = XtdbSession(spark, wh)
    con = dbgen_connection(args.sf)
    t0 = time.time()
    load_store(xt, args.sf, con=con)
    print(f"ingest {time.time()-t0:.1f}s")
    results = run_battery(xt, con, args.sf, qs)
    tiers = [t for t, _ in results.values()]
    bad = sum(t in ("FAIL", "ERROR") for t in tiers)
    print(f"golden={tiers.count('golden')} golden-mod="
          f"{tiers.count('golden-mod')} duckdb={tiers.count('duckdb')} "
          f"fail={bad}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
