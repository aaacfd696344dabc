"""scan(prefilter=...) A/B at scale: a 20M-event bitemporal table
(10% of entities have a second version), probed with predicates of
three selectivities, alternating plain vs prefiltered scans in one
JVM. Shows where the candidate semi-join wins (selective predicates:
the resolution window shuffles only candidate events) and where it
loses (broad predicates: the extra candidate pass buys nothing).

Run: python tools/prefilter_ab.py [n_rows] [work_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/xtdb_bench/pf_ab"
    shutil.rmtree(work, ignore_errors=True)

    from pyspark.sql import functions as F

    from xtdb_spark.session import build_spark
    from xtdb_spark.tx import TableStore

    spark = build_spark("prefilter-ab")
    spark.sparkContext.setLogLevel("ERROR")
    store = TableStore(spark, work)

    base = spark.range(n).select(
        F.col("id").alias("_id"),
        (F.xxhash64("id") % 100_000).alias("x"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"))
    store.put("pf", base)
    # second version for 10% of entities (forces real resolution work)
    store.put("pf", base.filter(F.col("_id") % 10 == 0)
              .withColumn("x", F.col("x") + 1))

    probes = [
        ("0.1%", F.col("x").between(-50, 49)),      # ~0.1% of keys
        ("2%",   F.col("x").between(-1000, 999)),
        ("50%",  F.col("x") >= 0),
    ]

    def run(pred, mode):
        t0 = time.perf_counter()
        if mode == "plain":
            d = store.scan("pf")
        else:
            d = store.scan("pf", prefilter=pred, prefilter_mode=mode)
        d = d.filter(pred)
        out = d.agg(F.count("*"), F.sum(F.length("payload"))).collect()[0]
        return time.perf_counter() - t0, out[0]

    # auto must track best-of-both: the decision overhead (bounded
    # Arrow-batch sample + a few local jobs) is timed INSIDE run()
    for _ in range(2):                               # warm + measured
        for name, pred in probes:
            tp, rp = run(pred, "force")
            tb, rb = run(pred, "plain")
            ta, ra = run(pred, "auto")
            assert rp == rb == ra, (name, rp, rb, ra)
            print(f"sel={name:5s} rows={rb:>9,}  plain={tb:6.2f}s  "
                  f"prefilter={tp:6.2f}s  auto={ta:6.2f}s  "
                  f"speedup={tb / tp:4.2f}x  auto_vs_best="
                  f"{ta / min(tb, tp):4.2f}x", flush=True)


if __name__ == "__main__":
    main()
