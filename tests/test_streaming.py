"""Streaming ingest tests: parquet stream → foreachBatch →
bitemporal table (the reference's log → indexer path, SURVEY §2.9)."""

from datetime import datetime

from pyspark.sql import functions as F

from xtdb_spark.streaming.ingest import stream_events_to_table, windowed_counts


def test_stream_ingest_to_bitemporal_table(spark, store, tmp_path):
    src = str(tmp_path / "src")
    rows = [(i, datetime(2024, 1, 1, i), f"u{i % 3}", 1.5 * i)
            for i in range(12)]
    (spark.createDataFrame(rows, "event_id long, ts timestamp, who string, value double")
     .coalesce(1).write.parquet(src))

    stream_events_to_table(spark, src, store, "ingested",
                           checkpoint=str(tmp_path / "ckpt"))
    cur = store.scan("ingested")
    assert cur.count() == 12
    assert {r["who"] for r in cur.select("who").distinct().collect()} == {
        "u0", "u1", "u2"}
    # events became bitemporal rows: history query works
    assert store.scan("ingested", all_system_time=True).count() == 12


def test_windowed_counts_batch_equivalence(spark):
    rows = [(datetime(2024, 1, 1, 10, m), "a", 1.0) for m in range(0, 50, 10)] \
        + [(datetime(2024, 1, 1, 11, 5), "b", 2.0)]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    out = {(str(r["win_start"]), r["event_type"]): (r["n"], r["sum_value"])
           for r in windowed_counts(df).collect()}
    assert out[("2024-01-01 10:00:00", "a")] == (5, 5.0)
    assert out[("2024-01-01 11:00:00", "b")] == (1, 2.0)
