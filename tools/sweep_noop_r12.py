"""Catalog-wide noop-sink timing sweep at a scale replica (guide §1.4):
rank operators by measured cost to pick optimization targets.

Usage: python tools/sweep_noop_r12.py [sf_dir] [prefix ...]
Default sf_dir /tmp/xtdb_bench/sf1; default prefixes pipe,an,ts,bitemp.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xtdb_bench/sf1"
    prefixes = tuple(sys.argv[2].split(",")) if len(sys.argv) > 2 else (
        "pipe", "an", "ts", "bitemp")
    skip = set((sys.argv[3].split(",")) if len(sys.argv) > 3 else ())

    from xtdb_spark.queries import QUERIES
    from xtdb_spark.session import build_spark

    spark = build_spark("xtdb-sweep-noop")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for name in sorted(QUERIES):
        if not name.startswith(prefixes) or name in skip:
            continue
        t0 = time.perf_counter()
        try:
            spark.sparkContext.setJobDescription(f"sweep:{name}")
            df = QUERIES[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            rows.append((dt, name, ""))
            print(f"{dt:8.2f}s  {name}", flush=True)
        except Exception as e:  # noqa: BLE001 — sweep must survive one bad entry
            dt = time.perf_counter() - t0
            rows.append((dt, name, str(e).splitlines()[0][:120]))
            print(f"{dt:8.2f}s  {name}  ERR {rows[-1][2]}", flush=True)

    print("\n== ranked ==")
    for dt, name, err in sorted(rows, reverse=True):
        print(f"{dt:8.2f}s  {name}  {err}")


if __name__ == "__main__":
    main()
