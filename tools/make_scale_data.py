"""Replicate the driver's sf0.1 testdata N× with shifted keys, so the
bench can be run at a scale where the data-proportional term dominates
Spark's fixed per-query cost (see BENCH_NOTES.md). Both engines
(bench.py and tools/bench_duckdb.py) read the same output, so the
comparison stays apples-to-apples.

Usage: python tools/make_scale_data.py [N=10] [out=/tmp/xtdb_bench/sf1]
Then:  SPARK_GRAFT_SF_DIR=/tmp/xtdb_bench/sf1 python bench.py
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = os.environ.get("SPARK_GRAFT_SRC", "/root/testdata/sf0.1")
OFF = 10_000_000  # key offset per copy — far above any sf0.1 key

# table → columns to shift per copy (keeps joins/cardinalities sane:
# every copy is a disjoint key universe over the same dimensions)
SHIFT = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/xtdb_bench/sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t, keys in SHIFT.items():
        src = f"read_parquet('{SRC}/{t}.parquet')"
        if not keys:
            q = f"SELECT * FROM {src}"
        else:
            copies = []
            for i in range(n):
                cols = ", ".join(
                    f"{k} + {i * OFF} AS {k}" if k in keys else k
                    for k in [d[0] for d in con.execute(
                        f"DESCRIBE SELECT * FROM {src}").fetchall()])
                copies.append(f"SELECT {cols} FROM {src}")
            q = " UNION ALL ".join(copies)
        con.execute(f"COPY ({q}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        print(t, con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0], "rows")


if __name__ == "__main__":
    main()
