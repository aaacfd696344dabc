"""Ingest + scan micro-bench — parity with the reference's
`modules/bench/src/main/clojure/xtdb/bench/ingest_tx_overhead.clj`
and `scan_perf.clj` harnesses (BASELINE.md rows "Ingest overhead /
scan perf micro").

Measures, against a throwaway TableStore warehouse:
  - bulk_rows_per_s : one big `copy_from`-style put of N rows
  - tx_per_s        : K tiny single-row `submit_tx` batches (the
                      per-tx fixed cost the reference isolates)
  - scan_rows_per_s : current-state resolve over the ingested events
  - optimize_s      : compaction of the K small event files

Run: python tools/bench_ingest.py [n_bulk] [n_txs]
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main():
    n_bulk = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_txs = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    from pyspark.sql import functions as F

    from xtdb_spark.session import build_spark
    from xtdb_spark.tx import TableStore

    spark = build_spark("xtdb-bench-ingest")
    spark.sparkContext.setLogLevel("ERROR")
    wh = tempfile.mkdtemp(prefix="xtdb_ingest_bench_")
    try:
        store = TableStore(spark, wh)

        # -- bulk ingest: one append of n_bulk rows (distributed
        # write path — rows never touch the driver) --
        bulk = spark.range(n_bulk).select(
            F.col("id").alias("_id"),
            (F.col("id") % 1000).alias("device"),
            (F.rand(seed=7) * 100).alias("reading"))
        t0 = time.perf_counter()
        store.put("bench_bulk", bulk)
        bulk_s = time.perf_counter() - t0

        # -- per-tx overhead: tiny txs, cost is all fixed overhead --
        t0 = time.perf_counter()
        for i in range(n_txs):
            store.submit_tx([
                ("put", "bench_oltp", [{"_id": i, "v": float(i)}]),
            ])
            tx_s = time.perf_counter() - t0

        # -- scan: current-state resolution over the bulk table --
        t0 = time.perf_counter()
        n = store.scan("bench_bulk").count()
        scan_s = time.perf_counter() - t0
        assert n == n_bulk, (n, n_bulk)

        # -- compaction of the n_txs small files --
        t0 = time.perf_counter()
        merged = store.optimize("bench_oltp")
        opt_s = time.perf_counter() - t0

        # -- log→indexer sustained throughput over the LIVE kafkalite
        # broker (reference ingest_tx_overhead.clj's production
        # shape: records through the log, applied by the indexer) —
        # the wire produce and the stream→store apply are timed
        # separately so the broker and the ingest path each get a
        # number comparable to the walsender's changes/s --
        from xtdb_spark.streaming.ingest import ingest_tx_log
        from xtdb_spark.streaming.kafkalite import (
            KafkaLiteBroker, KafkaLiteClient, kafkalite_tx_log_stream)

        n_log = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000
        broker = KafkaLiteBroker().start()
        broker.create_topic("txs", 1)
        try:
            recs = [(1_700_000_000_000 + i, None,
                     json.dumps({"_id": i, "v": i % 97}).encode())
                    for i in range(n_log)]
            t0 = time.perf_counter()
            with KafkaLiteClient(broker.bootstrap) as c:
                for i in range(0, n_log, 1000):
                    c.produce("txs", 0, recs[i:i + 1000])
            produce_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            ingest_tx_log(
                kafkalite_tx_log_stream(spark, broker.bootstrap, "txs"),
                store, "bench_log", wh + "/_ck_kafkalite")
            ingest_s = time.perf_counter() - t0
            n_applied = store.scan("bench_log").count()
            assert n_applied == n_log, (n_applied, n_log)
        finally:
            broker.stop()

        print(json.dumps({
            "metric": "ingest_scan_micro",
            "unit": "mixed",
            "bulk_rows": n_bulk,
            "bulk_rows_per_s": round(n_bulk / bulk_s),
            "tx_per_s": round(n_txs / tx_s, 2),
            "tx_overhead_ms": round(1000 * tx_s / n_txs, 1),
            "scan_rows_per_s": round(n_bulk / scan_s),
            "optimize_s": round(opt_s, 2),
            "optimize_merged_files": merged,
            "kafka_produce_msgs_per_s": round(n_log / produce_s),
            "kafka_ingest_changes_per_s": round(n_log / ingest_s),
            "kafka_log_msgs": n_log,
        }))
    finally:
        shutil.rmtree(wh, ignore_errors=True)


if __name__ == "__main__":
    main()
