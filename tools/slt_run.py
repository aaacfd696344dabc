#!/usr/bin/env python3
"""Run SLT scripts/dirs against the engine, reference-runner style.

Usage:
  python tools/slt_run.py [--threads N] [--limit Q] [--sample K]
      [--max-errors E] [--max-failures F] [--show-failures N]
      [--json OUT.json] PATH...

PATHs are .test files or directories (recursed, sorted — the
reference's --dirs mode, runner.clj:428-433). Budgets mirror the
reference CI (slt.yml:14-27, build.gradle.kts:722-748): exit 1 when
failures/errors exceed them.
"""
import argparse
import json
import os
import sys
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def collect(paths, sample):
    files = []
    for p in paths:
        if os.path.isdir(p):
            sub = sorted(
                os.path.join(dp, f)
                for dp, _, fs in os.walk(p) for f in fs
                if f.endswith(".test"))
            if sample and len(sub) > sample:
                # deterministic spread: every len/sample-th file
                step = len(sub) / sample
                sub = [sub[int(i * step)] for i in range(sample)]
            files.extend(sub)
        else:
            files.append(p)
    return files


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("paths", nargs="+")
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--limit", type=int, default=None,
                    help="query limit per file")
    ap.add_argument("--sample", type=int, default=None,
                    help="max files per directory argument")
    ap.add_argument("--max-errors", type=int, default=None)
    ap.add_argument("--max-failures", type=int, default=None)
    ap.add_argument("--show-failures", type=int, default=0)
    ap.add_argument("--json", default=None)
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--direct-sql", action="store_true",
                    help="reference --direct-sql mode: XTDB-dialect "
                         "scripts, _id visible (logic_test/direct-sql)")
    args = ap.parse_args()

    files = collect(args.paths, args.sample)
    print(f"{len(files)} files", flush=True)

    from xtdb_spark.session import build_spark
    from xtdb_spark.slt.runner import run_files, summarize

    cpus = args.cpus or min(16, os.cpu_count() or 8)
    spark = build_spark("slt", master=f"local[{cpus}]",
                        shuffle_partitions=1,
                        extra_conf={"spark.driver.memory": "12g",
                                    "spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    lock = threading.Lock()
    done = [0]

    def progress(r):
        with lock:
            done[0] += 1
            print(f"[{done[0]}/{len(files)}] {r.get('file','?')}: "
                  f"ok={r.get('success',0)} fail={r.get('failure',0)} "
                  f"err={r.get('error',0)} t={r.get('time_s','?')}s"
                  + (f" ABORT={r['abort']}" if r.get("abort") else ""),
                  flush=True)

    results = run_files(spark, files, threads=args.threads,
                        query_limit=args.limit,
                        collect_failures=args.show_failures,
                        progress=progress, direct_sql=args.direct_sql)
    tot = summarize(results)
    print(json.dumps(tot), flush=True)

    if args.show_failures:
        shown = 0
        for r in results:
            for f in r.get("failures", []):
                print(f"--- {r['file']}:{f['line']}\n{f['query']}\n"
                      f"expected: {f.get('expected')!r}\n"
                      f"actual/err: {f.get('actual', f.get('error'))!r}")
                shown += 1
                if shown >= args.show_failures:
                    break
            if shown >= args.show_failures:
                break

    if args.json:
        with open(args.json, "w") as f:
            json.dump({"total": tot, "files": results}, f, indent=1)

    bad = False
    if args.max_failures is not None and tot["failure"] > args.max_failures:
        print(f"FAILURE budget exceeded: {tot['failure']} > "
              f"{args.max_failures}")
        bad = True
    if args.max_errors is not None and tot["error"] > args.max_errors:
        print(f"ERROR budget exceeded: {tot['error']} > {args.max_errors}")
        bad = True
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
