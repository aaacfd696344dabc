"""A/B the plan-cache strategies on a few headline queries at sf0.1.

Decomposes the ~0.17 s/query fixed cost: (a) Python-side DataFrame
construction (Py4J round-trips), (b) Catalyst analyze/optimize/plan,
(c) execution. Strategies:

  fresh      — fn(spark, sf) then collect (current bench behavior)
  view       — fn once → temp view; per run spark.table(view).collect()
               (re-optimizes + re-plans, fresh shuffle IDs — honest
               plan cache at the parsed/analyzed level)
  build_only — fn(spark, sf) with no action (plan-build cost alone)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xtdb_spark.session import build_spark
from xtdb_spark.queries import QUERIES
from xtdb_spark.queries.registry import cache_tables

NAMES = sys.argv[2:] or [
    "tpch_q1_pricing_summary", "tpch_q6_revenue_forecast",
    "tpch_q10_returned_items", "tpch_q5_local_supplier_volume",
    "op_group_by_aggs", "pipe_dedup_exact",
]
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def best(k, f, n=3):
    b = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        b = min(b, time.perf_counter() - t0)
    return b


def main():
    spark = build_spark("plancache-ab")
    spark.sparkContext.setLogLevel("ERROR")
    cache_tables(spark, SF, TABLES)
    # warm twice (JIT)
    for _ in range(2):
        for n in NAMES:
            QUERIES[n].fn(spark, SF).collect()

    rows = []
    for n in NAMES:
        t_build = best(n, lambda: QUERIES[n].fn(spark, SF))
        t_fresh = best(n, lambda: QUERIES[n].fn(spark, SF).collect())
        df = QUERIES[n].fn(spark, SF)
        view = f"__plan_{n}"
        df.createOrReplaceTempView(view)
        spark.table(view).collect()  # touch once so shuffle exists
        t_view = best(n, lambda: spark.table(view).collect())
        t_same = best(n, lambda: df.collect())
        rows.append((n, t_build, t_fresh, t_view, t_same))

    print(f"{'query':42s} {'build':>7s} {'fresh':>7s} {'view':>7s} {'samedf':>7s}")
    for n, b, f, v, s in rows:
        print(f"{n:42s} {b:7.3f} {f:7.3f} {v:7.3f} {s:7.3f}")
    tot = [sum(r[i] for r in rows) for i in (1, 2, 3, 4)]
    print(f"{'TOTAL':42s} {tot[0]:7.3f} {tot[1]:7.3f} {tot[2]:7.3f} {tot[3]:7.3f}")


if __name__ == "__main__":
    main()
