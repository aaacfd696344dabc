"""Per-phase planning profile of the bench heads: for each headline
query, run it through the bench-identical cache/plan path and report
the QueryPlanningTracker phase durations (analysis / optimization /
planning) plus the top Catalyst rules by cumulative time
(RuleExecutor.dumpTimeSpent), to decide which optimizer rules are
worth excluding at MB scale.

Run:  python tools/phase_profile.py [sf_dir] [n_heads]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_TABLES, HEADLINE  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else len(HEADLINE)

    from xtdb_spark.queries.registry import cache_tables, cached_plan
    from xtdb_spark.session import build_spark

    spark = build_spark("xtdb-phase-profile")
    spark.sparkContext.setLogLevel("ERROR")
    cache_tables(spark, sf_dir, BENCH_TABLES)
    heads = HEADLINE[:n]
    for _ in range(3):                      # warm JIT + caches
        for name in heads:
            cached_plan(spark, name, sf_dir).collect()

    jvm = spark.sparkContext._jvm
    rule_exec = jvm.org.apache.spark.sql.catalyst.rules.RuleExecutor
    rule_exec.resetMetrics()

    tot = {"analysis": 0.0, "optimization": 0.0, "planning": 0.0}
    wall = 0.0
    for name in heads:
        df = cached_plan(spark, name, sf_dir)
        t0 = time.perf_counter()
        df.collect()
        wall += time.perf_counter() - t0
        phases = df._jdf.queryExecution().tracker().phases()
        it = phases.iterator()
        while it.hasNext():
            e = it.next()
            ph = e._1()
            ms = (e._2().endTimeMs() - e._2().startTimeMs())
            if ph in tot:
                tot[ph] += ms
    print(f"heads={len(heads)} wall={wall:.2f}s  "
          + "  ".join(f"{k}={v:.0f}ms" for k, v in tot.items()))

    dump = rule_exec.dumpTimeSpent()
    rows = []
    for ln in dump.splitlines():
        parts = ln.split()
        if len(parts) >= 2 and parts[1].isdigit() and "." in parts[0]:
            rows.append((int(parts[1]), parts[0]))
    rows.sort(reverse=True)
    print("top rules by cumulative ns:")
    for ns, rule in rows[:30]:
        print(f"  {ns/1e6:8.1f} ms  {rule}")


if __name__ == "__main__":
    main()
