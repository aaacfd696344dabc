"""Replication path spot-checks at scale.

1. Walsender throughput: N rows in one tx streamed over TCP through
   the full protocol stack (pyarrow file read → wal2json render →
   XLogData frames → client parse) — changes/sec for the
   single-socket ordered log (parallelism belongs to the apply side).
2. BPE bounded-fit wall at sf10 (28× the gate corpus): the
   (word,count) shuffle + top-V collect + local merge loop — the
   claim "train cost is corpus-size-independent after one shuffle"
   measured.

Run: python tools/repl_throughput.py [n_rows] [sf10_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    sf10 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/xtdb_bench/sf10"

    from pyspark.sql import functions as F

    from xtdb_spark.pgwire import PgWireServer
    from xtdb_spark.session import XtdbSession, build_spark
    from xtdb_spark.sources.pg_repl import LogicalReplicationClient

    import shutil
    shutil.rmtree("/tmp/xtdb_bench/repl_tp", ignore_errors=True)
    spark = build_spark("repl-throughput")
    spark.sparkContext.setLogLevel("ERROR")
    xt = XtdbSession(spark, "/tmp/xtdb_bench/repl_tp")
    srv = PgWireServer(xt, port=0).start()
    try:
        cli = LogicalReplicationClient("127.0.0.1", srv.port,
                                       slot="tp").connect()
        cli.create_slot()
        df = spark.range(n).select(
            F.col("id").alias("_id"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
            (F.col("id") % 1000).alias("grp"))
        xt.store.put("tp_docs", df)
        cli.start()
        t0 = time.perf_counter()
        got = 0
        for _, _payload in cli.poll(max_wait=5.0):
            got += 1
            if got == n:
                break
        dt = time.perf_counter() - t0
        print(f"walsender: {got} changes in {dt:.2f}s = "
              f"{got / dt:,.0f} changes/s (single socket)")
        cli.stop()
        cli.close()
    finally:
        srv.stop()

    if os.path.isdir(sf10):
        from xtdb_spark.pipeline import bpe

        docs = spark.read.parquet(os.path.join(sf10, "documents.parquet"))
        n_docs = docs.count()
        t0 = time.perf_counter()
        wf = bpe.word_freqs(docs)
        n_words = wf.count()
        t_shuffle = time.perf_counter() - t0
        t0 = time.perf_counter()
        merges = bpe.train(docs, n_merges=120, top_words=50_000)
        t_train = time.perf_counter() - t0
        print(f"bpe sf10: {n_docs:,} docs -> {n_words:,} distinct words; "
              f"word_freqs {t_shuffle:.1f}s, full train {t_train:.1f}s, "
              f"{len(merges)} merges")


if __name__ == "__main__":
    main()
