"""Plan-quality audit: for each headline query, print the physical
plan facts (pushdown, pruning, join strategy, shuffle count).
Run: python tools/plan_audit.py [name ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def main():
    from xtdb_spark.plans.explain import analyze
    from xtdb_spark.queries import QUERIES
    from xtdb_spark.session import build_spark

    sf_dir = "/root/testdata/sf0.01"
    names = sys.argv[1:] or [
        "tpch_q1_pricing_summary", "tpch_q3_shipping_priority",
        "tpch_q5_local_supplier_volume", "tpch_q6_revenue_forecast",
        "tpch_q10_returned_items", "tpch_q18_large_volume_customer",
        "op_join_inner", "op_window_row_number", "bitemp_current_state",
        "ts_asof_join", "pipe_dedup_exact", "pipe_ann_cosine_topk",
    ]
    spark = build_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    # audit the static plan: with AQE on, codegen spans and join
    # strategies only materialize at runtime, so the explain output
    # under-reports them (runtime plans are usually better — AQE
    # upgrades to broadcast etc.)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    for name in names:
        df = QUERIES[name].fn(spark, sf_dir)
        f = analyze(df)
        print(f"== {name}")
        print(f"   scans={f.n_scans} bcast_joins={f.n_broadcast_joins} "
              f"smj={f.n_sortmerge_joins} shuffles={f.n_shuffles} "
              f"codegen={f.codegen_spans}")
        for i, (pf, rs) in enumerate(zip(f.pushed_filters, f.read_schemas)):
            print(f"   scan[{i}] pushed=[{pf[:90]}]")
            print(f"           reads=<{rs[:90]}>")
        if "--full" in sys.argv:
            print(f.text)


if __name__ == "__main__":
    main()
