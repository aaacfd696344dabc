"""DuckDB yardstick for bench.py: runs the HEADLINE queries' oracle
SQL on DuckDB over the same parquet (hot = best of 3), printing the
same JSON shape. BASELINE.md defines the acceptance target as "within
2x of baseline", with the DuckDB oracle's wall-time as the practical
baseline — this is that number.

Run:  python tools/bench_duckdb.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else \
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf = float(sf)
    except ValueError:
        sf = None

    from bench import HEADLINE
    from xtdb_spark.queries import QUERIES

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    times: dict[str, float] = {}
    for name in HEADLINE:
        sql = QUERIES[name].oracle
        if sql is None:
            continue
        con.execute(sql).fetchall()  # cold
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 4)

    print(json.dumps({
        "metric": "duckdb_oracle_hot_total",
        "value": round(sum(times.values()), 4),
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
