"""Catalog-wide noop timing sweep of the pipe_* / an_* / ts_* entries
at a scale replica (guide §1.4: noop sink times the computation, not
the sink; §1.5: jobs labelled). Finds remaining expensive operators.

Usage: python tools/sweep_pipe_r12.py [sf_dir] [prefix ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xtdb_bench/sf1"
    prefixes = tuple(sys.argv[2:]) or ("pipe_",)

    import __spark_entry__ as entry
    from xtdb_spark.session import build_spark

    spark = build_spark("pipe-sweep-r12")
    spark.sparkContext.setLogLevel("ERROR")

    out = []
    for name, fn in entry.queries().items():
        if not name.startswith(prefixes):
            continue
        spark.sparkContext.setJobDescription(f"sweep: {name}")
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            out.append((dt, name))
            print(f"{name}: {dt:.1f}s", flush=True)
        except Exception as e:
            print(f"{name}: ERROR {type(e).__name__}: {e}", flush=True)
        spark.sparkContext.setJobDescription(None)

    print("\nslowest first:")
    for dt, name in sorted(out, reverse=True):
        print(f"  {dt:7.1f}s  {name}")


if __name__ == "__main__":
    main()
