"""Capture .explain('formatted') for every bench headline query under
the bench-identical session/cache config (guide §1: measure the plan
you actually run). Writes plans/<tag>/<query>_<suffix>.txt and prints
a per-query summary line: #Exchange, join strategies, Python-eval
nodes, pushed-filter presence.

Usage: python tools/capture_plans.py <tag> <suffix> [query ...]
  e.g. python tools/capture_plans.py r12 before
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_TABLES, HEADLINE  # noqa: E402


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "r12"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or HEADLINE

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    from xtdb_spark.session import build_spark
    from xtdb_spark.queries.registry import cache_tables, cached_plan

    spark = build_spark("xtdb-spark-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    cache_tables(spark, sf_dir, BENCH_TABLES)

    for name in names:
        df = cached_plan(spark, name, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = len(re.findall(r"\bExchange\b", plan))
        joins = sorted(set(re.findall(
            r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
            r"BroadcastNestedLoopJoin|CartesianProduct)", plan)))
        pyeval = sorted(set(re.findall(
            r"(BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|"
            r"FlatMapGroupsInPandas)", plan)))
        expand = "Expand" if "Expand" in plan else ""
        print(f"{name}: Exchange={n_ex} joins={','.join(joins) or '-'} "
              f"py={','.join(pyeval) or '-'} {expand}")


if __name__ == "__main__":
    main()
