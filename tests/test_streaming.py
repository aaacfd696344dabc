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


def test_stateful_sessionize_stream_carries_state(spark, tmp_path):
    """applyInPandasWithState sessionization: a user's session spans
    two micro-batches; the state store must carry it across."""
    import os
    import time

    from xtdb_spark.streaming.stateful import sessionize_stream

    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    schema = "ts timestamp, user_id long"
    # batch 1: u1 events at 10:00/10:05; u2 at 09:00
    b1 = [(datetime(2024, 1, 1, 10, 0), 1), (datetime(2024, 1, 1, 10, 5), 1),
          (datetime(2024, 1, 1, 9, 0), 2)]
    # batch 2: u1 continues inside gap (10:20) AND starts a new
    # session (12:00) — the 10:00 session must close with 3 events
    b2 = [(datetime(2024, 1, 1, 10, 20), 1), (datetime(2024, 1, 1, 12, 0), 1)]
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(src + "/f1")
    time.sleep(1.1)  # file source orders batches by mod time
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(src + "/f2")

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src + "/f*"))
    out = sessionize_stream(stream, gap_minutes=30)
    q = (out.writeStream.format("memory").queryName("sess")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()

    rows = spark.sql("SELECT * FROM sess").collect()
    closed = [r for r in rows if r["closed"] and r["user_id"] == 1]
    assert len(closed) == 1
    assert closed[0]["n_events"] == 3  # 10:00 + 10:05 (batch1) + 10:20 (batch2)
    assert str(closed[0]["session_start"]) == "2024-01-01 10:00:00"
    assert str(closed[0]["session_end"]) == "2024-01-01 10:20:00"
    # open sessions snapshotted: u1's 12:00 and u2's 09:00
    open_u1 = [r for r in rows if not r["closed"] and r["user_id"] == 1]
    assert any(str(r["session_start"]) == "2024-01-01 12:00:00" for r in open_u1)
    assert any(r["user_id"] == 2 and not r["closed"] for r in rows)


def test_watermark_seals_window_and_drops_later_data(spark, tmp_path):
    """Append-mode windowed agg with a 1h watermark: once the
    watermark passes a window's end the window is emitted ONCE and
    its state evicted; an hours-late event arriving after that must
    be discarded, not re-emit or duplicate the window. (Spark merges
    a batch's input before evicting, so the late event must land in a
    batch after the sealing one — watermark advances between batches,
    computed from the previous batch's max event time.)"""
    import os
    import time

    from xtdb_spark.streaming.ingest import windowed_counts

    src = str(tmp_path / "wm_src")
    os.makedirs(src)
    schema = "ts timestamp, event_type string, value double"
    b1 = [(datetime(2024, 1, 1, 10, m), "a", 1.0) for m in (0, 10, 20)]
    b2 = [(datetime(2024, 1, 1, 14, 0), "a", 1.0)]   # watermark → 13:00 next batch
    b3 = [(datetime(2024, 1, 1, 14, 10), "a", 1.0)]  # seals + evicts 10:00 window
    b4 = [(datetime(2024, 1, 1, 10, 10), "a", 99.0)]  # late: state already gone
    for i, b in enumerate([b1, b2, b3, b4]):
        spark.createDataFrame(b, schema).coalesce(1).write.parquet(f"{src}/f{i}")
        time.sleep(1.1)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src + "/f*"))
    out = windowed_counts(stream, window="1 hour", watermark="1 hour")
    q = (out.writeStream.format("memory").queryName("wm")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()

    rows = [r for r in spark.sql("SELECT * FROM wm").collect()
            if str(r["win_start"]) == "2024-01-01 10:00:00"]
    # exactly one emission, with only the on-time events — the late
    # 99.0 event neither duplicated the window nor grew it
    assert len(rows) == 1, rows
    assert rows[0]["n"] == 3 and rows[0]["sum_value"] == 3.0, rows


def test_dedupe_stream_drops_cross_batch_redeliveries(spark, tmp_path):
    """At-least-once upstream: the same event_id delivered in two
    different micro-batches within the watermark must come out ONCE
    (state evicted after the horizon, so this scales)."""
    import os
    import time

    from xtdb_spark.streaming.ingest import dedupe_stream

    src = str(tmp_path / "dd_src")
    os.makedirs(src)
    schema = "event_id long, ts timestamp, value double"
    b1 = [(1, datetime(2024, 1, 1, 10, 0), 1.0),
          (2, datetime(2024, 1, 1, 10, 1), 2.0)]
    b2 = [(2, datetime(2024, 1, 1, 10, 2), 2.0),   # redelivery of id 2
          (3, datetime(2024, 1, 1, 10, 3), 3.0)]
    for i, b in enumerate([b1, b2]):
        spark.createDataFrame(b, schema).coalesce(1).write.parquet(f"{src}/f{i}")
        time.sleep(1.1)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src + "/f*"))
    out = dedupe_stream(stream, ["event_id"], "ts", "1 hour")
    q = (out.writeStream.format("memory").queryName("dd")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    rows = spark.sql("SELECT event_id FROM dd").collect()
    assert sorted(r["event_id"] for r in rows) == [1, 2, 3]
    # batch fallback dedupes on the key too
    batch = spark.createDataFrame(b1 + b2, schema)
    assert dedupe_stream(batch, ["event_id"]).count() == 3


def test_catalog_stream_windowed_counts_entry(spark):
    """Regression: the CATALOG entry (not a test-built source) must
    run end-to-end on the driver's parquet. Round 3 broke because the
    events parquet reads ts as TIMESTAMP_NTZ, withWatermark rejected
    it, and the suite's own typed sources masked the failure."""
    import __spark_entry__ as entry

    df = entry.queries()["stream_windowed_counts"](
        spark, "/root/testdata/sf0.001")
    assert df.count() > 0
    assert dict(df.dtypes)["win_start"].startswith("timestamp")


def test_windowed_counts_casts_ntz(spark):
    """windowed_counts itself must tolerate a TIMESTAMP_NTZ event-time
    column on the streaming path (cast, not crash)."""
    from datetime import datetime

    from xtdb_spark.streaming.ingest import windowed_counts

    df = spark.createDataFrame(
        [(datetime(2024, 1, 1, 10, 30), "a", 1.0)],
        "ts timestamp_ntz, event_type string, value double")
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    out = windowed_counts(df)
    assert out.collect()[0]["n"] == 1


def test_stream_stream_interval_join(spark, tmp_path):
    """Stream-stream join with watermark-bounded state: clicks pair
    with purchases up to 1h BEFORE them for the same user; result
    matches the equivalent batch join over the same files."""
    import os

    from xtdb_spark.streaming.joins import stream_interval_join

    lsrc, rsrc = str(tmp_path / "clicks"), str(tmp_path / "buys")
    os.makedirs(lsrc), os.makedirs(rsrc)
    lschema = "user_id long, ts timestamp, click_id long"
    rschema = "user_id long, ts timestamp, amount double"
    clicks = [(1, datetime(2024, 1, 1, 10, 30), 100),
              (1, datetime(2024, 1, 1, 12, 0), 101),
              (2, datetime(2024, 1, 1, 10, 15), 102)]
    buys = [(1, datetime(2024, 1, 1, 10, 0), 5.0),    # pairs with click 100
            (1, datetime(2024, 1, 1, 11, 30), 7.0),   # pairs with click 101
            (2, datetime(2024, 1, 1, 8, 0), 9.0)]     # too old for click 102
    spark.createDataFrame(clicks, lschema).coalesce(1).write.parquet(lsrc + "/f0")
    spark.createDataFrame(buys, rschema).coalesce(1).write.parquet(rsrc + "/f0")

    ls = spark.readStream.schema(lschema).parquet(lsrc + "/f*")
    rs = spark.readStream.schema(rschema).parquet(rsrc + "/f*")
    out = stream_interval_join(ls, rs, on="user_id", lookback="1 hour")
    q = (out.writeStream.format("memory").queryName("ssj")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r["l_click_id"], r["r_amount"])
           for r in spark.sql("SELECT * FROM ssj").collect()}
    assert got == {(100, 5.0), (101, 7.0)}


def test_kafka_path_contract_exactly_once(spark, store, tmp_path):
    """Kafka log-tail contract test (reference modules/kafka +
    LogProcessor.kt): drive `ingest_tx_log` — the exact code a real
    broker feeds via `kafka_tx_log_stream` — with a FILE-BACKED
    stream of Kafka-shaped records (same schema: key/value/topic/
    partition/offset/timestamp) and assert offset→tx-id exactly-once
    under redelivery."""
    import json
    import os

    from xtdb_spark.streaming.ingest import (KAFKA_RECORD_SCHEMA,
                                             ingest_tx_log)

    src = str(tmp_path / "log")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def write_records(name, recs):
        spark.createDataFrame(
            [(None, json.dumps(doc).encode(), "txs", 0, off,
              datetime(2024, 1, 1))
             for off, doc in recs],
            KAFKA_RECORD_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(src)

    write_records("b1", [(0, {"_id": 1, "v": "a"}),
                         (1, {"_id": 2, "v": "b"}),
                         (2, {"_id": 3, "v": "c"})])
    stream = spark.readStream.schema(KAFKA_RECORD_SCHEMA).parquet(src)
    ingest_tx_log(stream, store, "ktx", ckpt)
    assert store.scan("ktx").count() == 3

    # redelivery: offsets 1-2 appear AGAIN (at-least-once source)
    # alongside new offsets 3-4 — only 3-4 may apply
    write_records("b2", [(1, {"_id": 2, "v": "b"}),
                         (2, {"_id": 3, "v": "c"}),
                         (3, {"_id": 4, "v": "d"}),
                         (4, {"_id": 5, "v": "e"})])
    stream = spark.readStream.schema(KAFKA_RECORD_SCHEMA).parquet(src)
    ingest_tx_log(stream, store, "ktx", ckpt)
    rows = store.scan("ktx").select("_id", "v").collect()
    assert {(r["_id"], r["v"]) for r in rows} == {
        (1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e")}
    # each entity has exactly ONE event — redelivered offsets were
    # never re-applied
    ev = store.events("ktx")
    assert ev.count() == 5
    # offset → tx-id watermark is durable and mapped
    wm = json.load(open(os.path.join(store.warehouse,
                                     "_log_offsets__ktx.json")))
    assert wm["txs"]["0"]["offset"] == 4
    assert wm["txs"]["0"]["tx_id"] > 0

    # a full checkpoint-loss replay of the WHOLE log is still a no-op
    ingest_tx_log(
        spark.readStream.schema(KAFKA_RECORD_SCHEMA).parquet(src),
        store, "ktx", str(tmp_path / "ckpt2"))
    assert store.events("ktx").count() == 5


def test_session_counts_merging(spark):
    """Session windows merge events within the gap and split beyond
    it; boundary: an event exactly `gap` after the previous one STILL
    merges (Spark splits only when the gap is exceeded strictly)."""
    from datetime import datetime

    from xtdb_spark.streaming.ingest import session_counts

    rows = [
        (1, datetime(2024, 1, 1, 10, 0)),
        (1, datetime(2024, 1, 1, 10, 30)),   # merges (30m < 1h gap)
        (1, datetime(2024, 1, 1, 11, 30)),   # exactly 1h → still merges
        (1, datetime(2024, 1, 1, 13, 0)),    # 1h30m gap → NEW session
        (2, datetime(2024, 1, 1, 9, 0)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {(r["user_id"], r["session_start"], r["n"])
           for r in session_counts(df, gap="1 hour").collect()}
    assert got == {
        (1, datetime(2024, 1, 1, 10, 0), 3),
        (1, datetime(2024, 1, 1, 13, 0), 1),
        (2, datetime(2024, 1, 1, 9, 0), 1),
    }
