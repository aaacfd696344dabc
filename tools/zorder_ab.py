"""Z-order layout A/B at scale: the same ~20M-row table written (a)
iid-clustered (default full optimize) and (b) Z-ordered on (x, ts),
then a two-predicate box scan timed on each — same JVM, alternating,
best-of-3 — plus the parquet-level evidence (files whose footer
stats could prune the box).

Run: python tools/zorder_ab.py [n_rows] [work_dir]
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def file_hits(path, x_lo, x_hi, t_lo, t_hi):
    import pyarrow.parquet as pq

    total, hit = 0, 0
    for fp in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(fp).metadata
        names = {md.schema.column(i).name: i for i in range(len(md.schema))}
        xs = md.row_group(0).column(names["x"]).statistics
        ts = md.row_group(0).column(names["ts"]).statistics
        xmin, xmax = xs.min, xs.max
        tmin, tmax = ts.min, ts.max
        for rg in range(1, md.num_row_groups):
            s = md.row_group(rg).column(names["x"]).statistics
            xmin, xmax = min(xmin, s.min), max(xmax, s.max)
            s = md.row_group(rg).column(names["ts"]).statistics
            tmin, tmax = min(tmin, s.min), max(tmax, s.max)
        total += 1
        if not (xmax < x_lo or xmin > x_hi or tmax < t_lo or tmin > t_hi):
            hit += 1
    return hit, total


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/xtdb_bench/zorder_ab"
    shutil.rmtree(work, ignore_errors=True)

    from pyspark.sql import functions as F

    from xtdb_spark.session import build_spark
    from xtdb_spark.tx import TableStore

    spark = build_spark("zorder-ab")
    spark.sparkContext.setLogLevel("ERROR")
    store = TableStore(spark, work)

    # x uniform 0..9999; ts a shuffled time axis (decorrelated from x);
    # payload = the bytes a real query fetches after the box filter
    # (the training-data access pattern: filter by source/time, read
    # the text) — it's what makes pruning show up as decode cost
    df = spark.range(n).select(
        F.col("id").alias("_id"),
        (F.xxhash64("id") % 10_000).alias("x"),
        F.timestamp_micros((F.abs(F.xxhash64(F.col("id") + 7))
                            % (86400_000_000 * 365))).alias("ts"),
        F.base64(F.unhex(F.repeat(F.format_string("%016x",
                 F.xxhash64(F.col("id") + 13)), 12))).alias("payload"))
    store.put("pts", df)

    # the probe: a 1% x-slice AND a 10% time window
    x_lo, x_hi = -2_000, -1_900          # xxhash64 % spans negatives
    t_lo = "1970-06-01"
    t_hi = "1970-07-07"

    def probe():
        # the ANALYTIC read path (queries/registry.py ld()): plain
        # parquet scan, filters pushed to the reader. The bitemporal
        # `store.scan` path windows per _iid BEFORE user predicates
        # apply, so file pruning can't help it — its pruning axes are
        # _iid buckets + the system-time manifest (compactor.py);
        # z-order serves the analytic tables.
        d = spark.read.parquet(store._path("pts")).filter(
            (F.col("x").between(x_lo, x_hi))
            & (F.col("ts") >= t_lo) & (F.col("ts") < t_hi))
        t0 = time.perf_counter()
        out = d.agg(F.count("*"),
                    F.sum(F.length("payload"))).collect()[0]
        return time.perf_counter() - t0, out

    results = {}
    for mode in ("iid", "zorder", "iid", "zorder", "iid", "zorder"):
        if mode == "iid":
            store.optimize("pts", n_files=64)
        else:
            store.optimize("pts", cluster_by=["x", "ts"], n_files=64)
        sec, out = probe()
        results.setdefault(mode, []).append(sec)
        from datetime import datetime, timezone
        hit, total = file_hits(
            store._path("pts"), x_lo, x_hi,
            datetime.fromisoformat(t_lo).replace(tzinfo=timezone.utc),
            datetime.fromisoformat(t_hi).replace(tzinfo=timezone.utc))
        print(f"{mode:7s} scan={sec:6.3f}s rows={out[0]:>8} "
              f"files_hit={hit}/{total}", flush=True)
    print("best-of:  iid %.3f s   zorder %.3f s   speedup %.2fx" % (
        min(results["iid"]), min(results["zorder"]),
        min(results["iid"]) / min(results["zorder"])))


if __name__ == "__main__":
    main()
