"""ClickBench-parity micro-harness: times the cb_* battery
(xtdb_spark/queries/clickbench.py — the reference's
modules/bench/.../clickbench.clj analogue) on Spark AND on DuckDB
running each entry's oracle SQL over the same parquet, like
bench.py + bench_duckdb.py do for the headline set.

Run: python tools/bench_clickbench.py [sf_dir]   (default sf0.1)
Prints ONE JSON line with both totals and the ratio.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

TABLES = ["events"]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import duckdb

    from xtdb_spark.queries import QUERIES
    from xtdb_spark.queries.registry import cache_tables
    from xtdb_spark.session import build_spark

    names = sorted(n for n in QUERIES if n.startswith("cb_"))

    spark = build_spark("xtdb-clickbench")
    spark.sparkContext.setLogLevel("ERROR")
    cache_tables(spark, sf_dir, TABLES)
    for _ in range(2):  # same 2-pass warm as bench.py
        for n in names:
            QUERIES[n].fn(spark, sf_dir).collect()
    stimes = {}
    for n in names:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            QUERIES[n].fn(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        stimes[n] = round(best, 4)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
    for n in names:  # warm the OS cache / duckdb plans
        con.execute(QUERIES[n].oracle).fetchall()
    dtimes = {}
    for n in names:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(QUERIES[n].oracle).fetchall()
            best = min(best, time.perf_counter() - t0)
        dtimes[n] = round(best, 4)

    s_total = round(sum(stimes.values()), 4)
    d_total = round(sum(dtimes.values()), 4)
    print(json.dumps({
        "metric": "clickbench_battery_hot",
        "unit": "sec",
        "spark_total": s_total,
        "duckdb_total": d_total,
        "ratio": round(s_total / d_total, 2) if d_total else None,
        "spark": stimes,
        "duckdb": dtimes,
    }))


if __name__ == "__main__":
    main()
