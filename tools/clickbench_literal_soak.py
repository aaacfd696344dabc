#!/usr/bin/env python3
"""Scale soak for the LITERAL ClickBench battery (verdict r9 #3):
the reference's 43 verbatim query texts over an N-row synthesized
hits store, cross-checked against DuckDB on the same rows — the same
tiers as tests/test_clickbench_literal.py (full sorted-row values
for no-LIMIT queries, row counts for tie-prone LIMIT top-k), at a
scale where the FOR ALL VALID_TIME fast path and the scan-agg heads
actually stream real data volumes.

Reuses the test module's generator and comparators so soak and CI
check EXACTLY the same thing. Memory note: the generator is
driver-side pandas (N × ~27 cols); 3M rows ≈ 1.5 GB — fine here,
larger tiers would want a distributed generator.

Usage: python tools/clickbench_literal_soak.py [N=3000000]
Prints ONE JSON line: {"n": N, "value_ok": v, "count_ok": c,
"fail": f, "total_s": t}.
"""

from __future__ import annotations

import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000

    import test_clickbench_literal as tcl

    tcl.N = n
    import duckdb

    from xtdb_spark.session import XtdbSession, build_spark
    from xtdb_spark.sql.constructs import _quote_date_trunc
    from xtdb_spark.tx import TableStore

    spark = build_spark("cb-literal-soak", master="local[16]",
                        shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    pdf = tcl._gen_hits()
    xt = XtdbSession.__new__(XtdbSession)
    xt.spark = spark
    xt.store = TableStore(spark, tempfile.mkdtemp(prefix="cb_soak_"))
    xt.sql = XtdbSession.sql.__get__(xt)
    xt.store.put("hits", spark.createDataFrame(pdf))
    con = duckdb.connect()
    con.register("hits", pdf.drop(columns=["_id"]))
    print(f"ingest {time.time()-t0:.1f}s ({n} rows)", file=sys.stderr)

    qs = tcl._queries()
    value_ok = count_ok = 0
    failures = []
    t0 = time.time()
    for name, sql in sorted(qs.items(), key=lambda kv: int(kv[0][1:])):
        tq = time.time()
        sp_rows = [tuple(r) for r in xt.sql(sql).collect()]
        duck_sql = _quote_date_trunc(
            re.sub(r"\bFOR\s+ALL\s+VALID_TIME\b", "", sql,
                   flags=re.IGNORECASE))
        du_rows = con.execute(duck_sql).fetchall()
        has_limit = re.search(r"\bLIMIT\b", sql, re.IGNORECASE)
        if name in tcl.COUNT_ONLY_REASON or has_limit:
            ok = len(sp_rows) == len(du_rows)
            count_ok += ok
        else:
            ok = tcl._rows_equal(sp_rows, du_rows)
            value_ok += ok
        if not ok:
            failures.append((name, len(sp_rows), len(du_rows)))
        print(f"{name}: {'ok' if ok else 'FAIL'} "
              f"({time.time()-tq:.1f}s)", file=sys.stderr)
    print(json.dumps({"n": n, "value_ok": value_ok,
                      "count_ok": count_ok, "fail": len(failures),
                      "failures": failures,
                      "total_s": round(time.time() - t0, 1)}))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
