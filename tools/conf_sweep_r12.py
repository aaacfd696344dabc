"""Round-12 follow-up: sweep the interaction flagged in
OPTIMIZATION_r12.md "Not yet optimized" —
`spark.sql.adaptive.advisoryPartitionSizeInBytes` (AQE coalescing
target, session default 256m) vs
`spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold` (AQE's
SMJ->SHJ rewrite cap, session default 128m).

Hypothesis worth testing (guide §2.2/§3.1): with advisory=256m AQE
coalesces post-shuffle partitions toward 256 MB, but the SHJ rewrite
needs every build-side map partition under the 128 MB cap — so the
two defaults may fight at GB+ scale, leaving joins on sort-merge that
a matched pair of values would hash-join.

Methodology: same-JVM alternating rounds over the join-heavy subset
at a GB-scale replica (AQE active there), best-of-N per (variant,
head). Both confs are runtime-settable AQE confs, so one JVM serves
all variants; alternation controls for background load (guide §1).

Usage: SPARK_GRAFT_SF_DIR=/tmp/xtdb_bench/sf10 python tools/conf_sweep_r12.py [rounds=3]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_TABLES

SUBSET = [
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q7_volume_shipping",
    "tpch_q9_product_type_profit",
    "tpch_q10_returned_items",
    "tpch_q12_late_shipments",
    "tpch_q13_customer_order_distribution",
    "tpch_q18_large_volume_customer",
    "tpch_q22_global_sales_opportunity",
]

M = 1024 * 1024
VARIANTS = [
    # name, advisory, shj-threshold
    ("adv256_shj128 (HEAD)", 256 * M, 128 * M),
    ("adv128_shj128", 128 * M, 128 * M),
    ("adv256_shj256", 256 * M, 256 * M),
    ("adv128_shj256", 128 * M, 256 * M),
    ("adv256_shj0 (rewrite off)", 256 * M, 0),
]


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/xtdb_bench/sf10")

    from xtdb_spark.queries.registry import cache_tables, cached_plan
    from xtdb_spark.session import build_spark

    spark = build_spark("xtdb-spark-conf-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    cache_tables(spark, sf_dir, BENCH_TABLES)
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true", \
        "sweep only meaningful where AQE is active (GB+ working set)"

    # warm: pin cache + JIT (2 passes, HEAD confs)
    for _ in range(2):
        for name in SUBSET:
            cached_plan(spark, name, sf_dir).collect()

    best: dict[tuple[str, str], float] = {}
    for r in range(rounds):
        for vname, adv, shj in VARIANTS:
            spark.conf.set(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes", str(adv))
            spark.conf.set(
                "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
                str(shj))
            for name in SUBSET:
                spark.sparkContext.setJobDescription(f"{vname}:{name}:r{r}")
                t0 = time.perf_counter()
                cached_plan(spark, name, sf_dir).collect()
                dt = time.perf_counter() - t0
                k = (vname, name)
                best[k] = min(best.get(k, float("inf")), dt)
            print(f"round {r} {vname}: "
                  f"{sum(best[(vname, n)] for n in SUBSET):.2f} s (best-of so far)",
                  flush=True)

    print("\nper-head best-of-%d:" % rounds)
    for vname, _, _ in VARIANTS:
        tot = sum(best[(vname, n)] for n in SUBSET)
        row = {n.split("_")[1]: round(best[(vname, n)], 2) for n in SUBSET}
        print(f"{vname:28s} total {tot:6.2f} s  {json.dumps(row)}")


if __name__ == "__main__":
    main()
