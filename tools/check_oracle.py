"""Local replica of the driver's correctness gate: run every
queries() entry on Spark AND its oracle_sql() on DuckDB over the same
parquet, compare row count, column names, and order-insensitive
values. Run:  python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys
import time
import traceback

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — mismatches surface
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return repr(v)


def rows_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from xtdb_spark.session import build_spark

    spark = build_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entry.queries(), entry.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception:
            print(f"FAIL  {name}: spark error")
            traceback.print_exc()
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(rows)} rows ({time.time()-t0:.1f}s) [rows-only]")
            n_rowsonly += 1
            if len(rows) == 0:
                print(f"  WARN {name}: 0 rows")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if sorted(cols) != sorted(ocols):
            problems.append(f"cols spark={sorted(cols)} duck={sorted(ocols)}")
        if len(rows) != len(orows):
            problems.append(f"rowcount spark={len(rows)} duck={len(orows)}")
        if not problems:
            sk, ok = rows_key(rows, cols), rows_key(orows, ocols)
            if sk != ok:
                diffs = [(a, b) for a, b in zip(sk, ok) if a != b][:3]
                problems.append(f"values differ, e.g. {diffs}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(rows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
