#!/usr/bin/env python3
"""Staged-mode Fusion benchmark (reference `--staged-only`): load the
production-patterns dataset, then time each query once.

  python tools/bench_fusion.py [--systems N] [--readings N]
      [--updates-per-system N] [--cpus N]

Prints one JSON line: {"load_s": …, "queries": {name: sec}, …}.
"""
import argparse
import json
import os
import sys
import time
from datetime import datetime, timedelta

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--systems", type=int, default=200)
    ap.add_argument("--readings", type=int, default=100)
    ap.add_argument("--updates-per-system", type=int, default=3)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    args = ap.parse_args()

    import tempfile

    from xtdb_spark import fusion
    from xtdb_spark.session import XtdbSession, build_spark
    from xtdb_spark.tx import TableStore

    spark = build_spark("fusion-bench", master=f"local[{args.cpus}]",
                        shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    xt = XtdbSession.__new__(XtdbSession)
    xt.spark = spark
    xt.store = TableStore(spark, tempfile.mkdtemp(prefix="fusion_bench"))
    xt.sql = XtdbSession.sql.__get__(xt)
    xt.scan = XtdbSession.scan.__get__(xt)

    now = datetime.utcnow()
    base = now.replace(minute=0, second=0, microsecond=0) \
        - timedelta(minutes=5 * (args.readings // 2))
    t0 = time.time()
    info = fusion.load(xt, n_systems=args.systems,
                       n_readings=args.readings,
                       updates_per_system=args.updates_per_system,
                       base_time=base, load_time=base, seed=0)
    load_s = round(time.time() - t0, 2)

    sid = info["system_ids"][0]
    lo, hi = info["min_vt"], info["max_vt"] + timedelta(minutes=5)
    suite = [
        ("system-settings", fusion.Q_SYSTEM_SETTINGS, [sid]),
        ("readings-for-system", fusion.Q_READINGS_FOR_SYSTEM,
         [sid, lo, hi]),
        ("system-count-over-time", fusion.Q_SYSTEM_COUNT_OVER_TIME,
         [lo, hi]),
        ("readings-range-bins", fusion.Q_READINGS_RANGE_BINS, [lo, hi]),
        ("cumulative-registration", fusion.Q_CUMULATIVE_REGISTRATION,
         [lo, hi]),
    ]
    times, rows = {}, {}
    for name, q, params in suite:
        t0 = time.time()
        rows[name] = len(xt.sql(q, params).collect())
        times[name] = round(time.time() - t0, 3)

    print(json.dumps({
        "metric": "fusion_staged", "load_s": load_s,
        "systems": args.systems, "readings": args.readings,
        "queries": times, "rows": rows,
        "value": round(sum(times.values()), 3), "unit": "sec"}))


if __name__ == "__main__":
    main()
