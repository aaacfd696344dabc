"""ClickBench scan-agg floor: one more lever pass (round-9 verdict
item 7). The standing weak item is ~10× DuckDB per-core on
low-cardinality scan-agg heads at sf10, previously attributed to
Spark's per-core row pipeline vs DuckDB's vectorized hash-agg
(columnar-cache A/B, round 6). This grid A/Bs the remaining session-
settable knobs on the worst heads, alternating variants in one JVM:

- `spark.sql.codegen.aggregate.map.twolevel.enabled` (default on —
  also try OFF to confirm the default isn't hurting small-key aggs)
- `spark.sql.codegen.aggregate.map.vectorized.enable` (default OFF —
  the vectorized first-level hash map)
- `spark.sql.parquet.columnarReaderBatchSize` 4096 → 16384
- `spark.sql.columnVector.offheap.enabled` (off-heap scan vectors)

Run: python tools/cb_floor_ab.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADS = ["cb_simple_aggs", "cb_distinct_counts", "cb_group_count_topk",
         "cb_highcard_user_topk", "cb_wide_sum_battery"]

VARIANTS = [
    ("base", {}),
    ("twolevel-off", {
        "spark.sql.codegen.aggregate.map.twolevel.enabled": "false"}),
    ("vec-aggmap", {
        "spark.sql.codegen.aggregate.map.vectorized.enable": "true"}),
    ("batch-16k", {
        "spark.sql.parquet.columnarReaderBatchSize": "16384"}),
    ("offheap-vec", {
        "spark.sql.columnVector.offheap.enabled": "true"}),
]

DEFAULTS = {
    "spark.sql.codegen.aggregate.map.twolevel.enabled": "true",
    "spark.sql.codegen.aggregate.map.vectorized.enable": "false",
    "spark.sql.parquet.columnarReaderBatchSize": "4096",
    "spark.sql.columnVector.offheap.enabled": "false",
}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xtdb_bench/sf10"

    from xtdb_spark.queries.registry import query_map
    from xtdb_spark.session import build_spark

    spark = build_spark("cb-floor-ab")
    spark.sparkContext.setLogLevel("ERROR")
    qs = query_map()

    def run(name):
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).collect()
        return time.perf_counter() - t0

    for h in HEADS:                       # warm file listings/JIT
        run(h)

    best: dict[str, dict[str, float]] = {h: {} for h in HEADS}
    for _ in range(3):                    # alternate variants
        for label, conf in VARIANTS:
            for k, v in DEFAULTS.items():
                spark.conf.set(k, conf.get(k, v))
            for h in HEADS:
                dt = run(h)
                best[h][label] = min(best[h].get(label, 1e9), dt)
    for k, v in DEFAULTS.items():
        spark.conf.set(k, v)

    labels = [l for l, _ in VARIANTS]
    print(f"{'head':<24}" + "".join(f"{l:>14}" for l in labels))
    for h in HEADS:
        print(f"{h:<24}" + "".join(f"{best[h][l]:>13.2f}s"
                                   for l in labels))


if __name__ == "__main__":
    main()
