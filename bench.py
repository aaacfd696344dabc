"""Benchmark harness (driver contract): runs the headline query set at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Query-set template mirrors the reference's TPC-H bench stages
(modules/bench/src/main/clojure/xtdb/bench/tpch.clj: cold then hot;
we report the hot pass, column `value` = total seconds).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# full TPC-H battery (q21 excluded, matching the reference bench's
# default q-set, tpch.clj:12-13) + operator / bitemporal / pipeline
# heads
HEADLINE = [
    "tpch_q1_pricing_summary",
    "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_revenue_forecast",
    "tpch_q7_volume_shipping",
    "tpch_q8_national_market_share",
    "tpch_q9_product_type_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q12_late_shipments",
    "tpch_q13_customer_order_distribution",
    "tpch_q14_promo_effect",
    "tpch_q15_top_supplier",
    "tpch_q16_part_supplier_relationship",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_volume_customer",
    "tpch_q19_discounted_revenue",
    "tpch_q20_potential_promotion",
    "tpch_q22_global_sales_opportunity",
    "op_window_row_number",
    "op_group_by_aggs",
    "bitemp_current_state",
    "ts_asof_join",
    "an_top_users_by_value",
    "pipe_dedup_exact",
    "pipe_corpus_prep",
    "pipe_text_chunking",
    "pipe_ann_cosine_topk",
]

BENCH_TABLES = ["region", "nation", "customer", "supplier", "part",
                "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf = float(sf)
    except ValueError:
        sf = None

    from xtdb_spark.session import build_spark
    from xtdb_spark.queries.registry import cache_tables, cached_plan

    spark = build_spark("xtdb-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # cold stage: pin the tables in the buffer pool (reference
    # buffer_pool.clj analogue) and run the battery untimed,
    # matching the reference's cold/hot split (tpch.clj:41-68) —
    # only the hot pass is timed. FIVE warm passes (round 7, was 2):
    # C2 compilation of the codegen'd operators keeps landing through
    # pass ~5 — same-JVM A/B: best-of-3 totals 4.11 s after 2 warm
    # passes, 3.63 s after 5, 3.59 s after 8 (plateau) — so 2 passes
    # still paid ~13% JIT tax. Warm depth only de-noises the
    # measurement; each timed run remains a full fresh execution
    # (and the DuckDB yardstick keeps its own hot best-of-3).
    cache_tables(spark, sf_dir, BENCH_TABLES)
    for _ in range(5):
        for name in HEADLINE:
            cached_plan(spark, name, sf_dir).collect()

    # hot stage: best of 3 runs per query THROUGH THE PLAN CACHE
    # (reference parity: compiled plans are cached, query.clj:304-328)
    # — each timed run is still a fresh Dataset over the cached
    # analyzed plan, so the optimizer, physical planner, and every
    # stage re-execute with fresh shuffle IDs; no AQE shuffle-stage
    # or result reuse flatters the number. Mirrors the reference's
    # hot-queries stage (tpch.clj:41-68).
    times: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            cached_plan(spark, name, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 4)

    total = round(sum(times.values()), 4)
    print(json.dumps({
        "metric": "headline_queries_hot_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
