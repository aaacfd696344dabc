"""Join-derived sideways pushdown A/B at scale: a 20M-event
bitemporal fact table (10% of entities carry a second version)
inner-joined to a 100k-row dim through the SQL path, alternating
store.sql_join_prefilter on/off in one JVM. Shows where deriving the
build side's key set and injecting `fact_key IN (keys)` as the
scan's candidate-iid semi-join wins (selective dim filters: the
resolution window shuffles only candidate events) and that the
injector auto-bails on broad dim filters (identical timings, no
probe cost).

Run: python tools/join_prefilter_ab.py [n_rows] [work_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_dim = max(1000, n // 200)
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/xtdb_bench/jpf_ab"
    shutil.rmtree(work, ignore_errors=True)

    from pyspark.sql import functions as F

    from xtdb_spark.session import XtdbSession, build_spark
    from xtdb_spark.sql import rewriter
    from xtdb_spark.tx import TableStore

    spark = build_spark("join-prefilter-ab")
    spark.sparkContext.setLogLevel("ERROR")
    xt = XtdbSession.__new__(XtdbSession)
    xt.spark = spark
    xt.store = TableStore(spark, work)
    xt.sql = XtdbSession.sql.__get__(xt)

    fact = spark.range(n).select(
        F.col("id").alias("_id"),
        (F.xxhash64("id") % n_dim).alias("ref"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"))
    xt.store.put("jf", fact)
    xt.store.put("jf", fact.filter(F.col("_id") % 10 == 0)
                 .withColumn("payload", F.lit("v2")))
    dim = spark.range(n_dim).select(
        F.col("id").alias("_id"),
        (F.col("id") % 1000).alias("grp"))
    xt.store.put("jd", dim)

    # dim `_id = k` selects 1 key of n_dim (selective); `grp = 7`
    # selects n_dim/1000 keys — 0.1% of dim rows but every grp key
    # appears across the fact key space, so the injector's fact-side
    # estimate (n_dim/1000 ÷ n_dim = 0.1%... still selective) fires;
    # `grp <= 199` (20%) must bail at the build gate.
    probes = [
        ("1 key",    "d._id = 7"),
        ("100 keys", "d.grp = 7"),
        ("broad",    "d.grp <= 199"),
    ]

    def run(where):
        t0 = time.perf_counter()
        out = xt.sql(
            "SELECT COUNT(*) AS c, SUM(LENGTH(f.payload)) AS s "
            f"FROM jf f JOIN jd d ON f.ref = d._id WHERE {where}") \
            .collect()[0]
        dt = time.perf_counter() - t0
        inj = [e for e in rewriter.LAST_PREFILTERS if e["join_derived"]]
        return dt, out["c"], bool(inj)

    print(f"n={n:,} fact events, n_dim={n_dim:,}")
    print(f"{'probe':<10} {'off(s)':>8} {'on(s)':>8} {'speedup':>8} "
          f"{'rows':>12} {'injected':>9}")
    for label, where in probes:
        for _ in range(1):        # warm both paths once
            xt.store.sql_join_prefilter = False
            run(where)
            xt.store.sql_join_prefilter = True
            run(where)
        offs, ons, inj_on = [], [], False
        rows_off = rows_on = None
        for _ in range(3):        # alternate in one JVM
            xt.store.sql_join_prefilter = False
            dt, rows_off, _i = run(where)
            offs.append(dt)
            xt.store.sql_join_prefilter = True
            dt, rows_on, inj_on = run(where)
            ons.append(dt)
        assert rows_off == rows_on, (label, rows_off, rows_on)
        off, on = min(offs), min(ons)
        print(f"{label:<10} {off:>8.2f} {on:>8.2f} {off / on:>7.2f}x "
              f"{rows_on:>12,} {str(inj_on):>9}")


if __name__ == "__main__":
    main()
