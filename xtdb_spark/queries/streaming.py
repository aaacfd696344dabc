"""Streaming queries: micro-batch replay of the events table through
Structured Streaming, verified against the equivalent batch SQL (the
windowed aggregation is deterministic, so the DuckDB oracle applies
even though execution is streaming)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from xtdb_spark.queries.registry import ld, register
from xtdb_spark.streaming.ingest import windowed_counts


@register(
    "stream_windowed_counts",
    """
    SELECT TIMESTAMP '1970-01-01' + INTERVAL 1 SECOND
             * CAST(FLOOR(epoch(ts) / 3600) * 3600 AS BIGINT) AS win_start,
           event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY win_start, event_type
    """,
)
def stream_windowed_counts(spark, sf_dir):
    """Watermarked tumbling-window rollup executed as a real
    Structured Streaming query (AvailableNow trigger, memory sink),
    then returned as a DataFrame. Exceeds the reference (no streaming
    query ops there, SURVEY §2.9)."""
    import os

    from pyspark.sql import functions as F2
    from xtdb_spark.queries.registry import NANOS_CONF

    spark.conf.set(NANOS_CONF, "true")
    # the file stream source requires a *directory*; expose the single
    # parquet file through a symlink dir
    src_dir = tempfile.mkdtemp(prefix="xt_stream_src_")
    link = os.path.join(src_dir, "events.parquet")
    if not os.path.exists(link):
        os.symlink(f"{sf_dir}/events.parquet", link)
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = spark.readStream.schema(raw_schema).parquet(src_dir)
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":
        stream = stream.withColumn("ts", F2.expr("timestamp_micros(ts div 1000)"))
    elif ts_type == "timestamp_ntz":
        # parquet may read ts as TIMESTAMP_NTZ, which withWatermark
        # rejects; session tz is pinned UTC so this is tag-only.
        stream = stream.withColumn("ts", F2.col("ts").cast("timestamp"))
    agg = windowed_counts(stream, window="1 hour", watermark="2 hours")
    name = "xt_stream_windowed_counts"
    with tempfile.TemporaryDirectory() as ckpt:
        (agg.writeStream.outputMode("complete").format("memory")
         .queryName(name).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start().awaitTermination())
    return spark.table(name).select(
        "win_start", "event_type", "n", "sum_value")


@register(
    "stream_dedup_exactly_once",
    """
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def stream_dedup_exactly_once(spark, sf_dir):
    """Streaming dedup: the events stream is fed TWICE (two symlinks
    to the same parquet — the at-least-once delivery a real log
    replay produces), and `dropDuplicatesWithinWatermark` on the
    event key restores exactly-once before a rollup. The batch oracle
    is the single-copy aggregate: if dedup state dropped or kept the
    wrong rows, counts and sums diverge. State is bounded by the
    watermark horizon (reference ingest dedups on tx-id at the log
    offset level — streaming/ingest.py's checkpoint+tx-id model; this
    is the query-side analogue for keyed event streams at 100 TB:
    state ∝ keys inside the watermark window, not the stream
    length)."""
    import os

    from pyspark.sql import functions as F2
    from xtdb_spark.queries.registry import NANOS_CONF

    spark.conf.set(NANOS_CONF, "true")
    src_dir = tempfile.mkdtemp(prefix="xt_stream_dup_src_")
    for copy in ("a", "b"):  # duplicate delivery
        link = os.path.join(src_dir, f"events_{copy}.parquet")
        if not os.path.exists(link):
            os.symlink(f"{sf_dir}/events.parquet", link)
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = spark.readStream.schema(raw_schema).parquet(src_dir)
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":
        stream = stream.withColumn("ts", F2.expr("timestamp_micros(ts div 1000)"))
    elif ts_type == "timestamp_ntz":
        stream = stream.withColumn("ts", F2.col("ts").cast("timestamp"))
    deduped = (stream
               .withWatermark("ts", "30 days")
               .dropDuplicatesWithinWatermark(["event_id"]))
    agg = deduped.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(28,2)")).cast("double")
        .alias("sum_value"))
    name = "xt_stream_dedup"
    with tempfile.TemporaryDirectory() as ckpt:
        (agg.writeStream.outputMode("complete").format("memory")
         .queryName(name).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start().awaitTermination())
    return spark.table(name).select("event_type", "n", "sum_value")


@register(
    "stream_session_windows",
    """
    WITH d AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts) IS NULL
                   OR ts - LAG(ts) OVER (PARTITION BY user_id
                                         ORDER BY ts)
                      > INTERVAL 1 HOUR
                  THEN 1 ELSE 0 END AS new_s
      FROM events),
    s AS (SELECT user_id, ts,
                 SUM(new_s) OVER (PARTITION BY user_id
                                  ORDER BY ts) AS sid
          FROM d)
    SELECT MIN(ts) AS session_start, user_id, COUNT(*) AS n
    FROM s GROUP BY user_id, sid
    """,
)
def stream_session_windows(spark, sf_dir):
    """Session windows (per-user sessions closing after 1 h of
    inactivity) executed as a REAL Structured Streaming query —
    session_window is the stateful merging-window operator
    (SURVEY §2.9 exceed; the reference has no streaming ops).  The
    oracle derives identical sessions with gaps-and-islands SQL."""
    import os

    from pyspark.sql import functions as F2
    from xtdb_spark.queries.registry import NANOS_CONF
    from xtdb_spark.streaming.ingest import session_counts

    spark.conf.set(NANOS_CONF, "true")
    src_dir = tempfile.mkdtemp(prefix="xt_stream_sess_")
    link = os.path.join(src_dir, "events.parquet")
    if not os.path.exists(link):
        os.symlink(f"{sf_dir}/events.parquet", link)
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = spark.readStream.schema(raw_schema).parquet(src_dir)
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":
        stream = stream.withColumn("ts",
                                   F2.expr("timestamp_micros(ts div 1000)"))
    elif ts_type == "timestamp_ntz":
        stream = stream.withColumn("ts", F2.col("ts").cast("timestamp"))
    agg = session_counts(stream, gap="1 hour", watermark="2 hours")
    name = "xt_stream_session_windows"
    with tempfile.TemporaryDirectory() as ckpt:
        (agg.writeStream.outputMode("complete").format("memory")
         .queryName(name).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start().awaitTermination())
    return spark.table(name).select("session_start", "user_id", "n")


@register(
    "stream_kafka_wire_tail",
    """
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sum_value
    FROM (SELECT * FROM events ORDER BY event_id LIMIT 64)
    GROUP BY event_type
    """,
)
def stream_kafka_wire_tail(spark, sf_dir):
    """Kafka tx-log tail through the REAL wire protocol (reference
    modules/kafka; streaming/kafkalite.py): the first 64 events are
    produced into an in-process pure-Python Kafka broker as magic-2
    RecordBatches over TCP (2 partitions, keyed by event_id parity),
    tailed back with `readStream.format("kafkalite")` — the Spark 4
    Python Data Source speaking Fetch v4 from the executors — and
    aggregated. The oracle is the same aggregate straight off the
    parquet, so any loss, duplication, or corruption across the wire
    surfaces as a count/value mismatch. The 64-row driver collect is
    the test-fixture producer, not the data path (a production
    producer writes the log directly)."""
    import json as _json

    from xtdb_spark.queries.registry import NANOS_CONF
    from xtdb_spark.streaming.kafkalite import (KafkaLiteBroker,
                                                KafkaLiteClient,
                                                kafkalite_tx_log_stream)

    spark.conf.set(NANOS_CONF, "true")
    rows = (ld(spark, sf_dir, "events")
            .orderBy("event_id").limit(64)
            .select("event_id", "event_type",
                    F.col("value").cast("double").alias("value"))
            .collect())
    broker = KafkaLiteBroker().start()
    broker.create_topic("events", 2)
    try:
        with KafkaLiteClient(broker.bootstrap) as c:
            for p in (0, 1):
                batch = [(1_700_000_000_000 + i,
                          str(r["event_id"]).encode(),
                          _json.dumps({"event_id": r["event_id"],
                                       "event_type": r["event_type"],
                                       "value": r["value"]}).encode())
                         for i, r in enumerate(rows)
                         if r["event_id"] % 2 == p]
                if batch:
                    c.produce("events", p, batch)
        name = "xt_stream_kafka_wire"
        with tempfile.TemporaryDirectory() as ckpt:
            (kafkalite_tx_log_stream(spark, broker.bootstrap, "events")
             .writeStream.outputMode("append").format("memory")
             .queryName(name).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start().awaitTermination())
    finally:
        broker.stop()
    doc = F.from_json(F.col("value").cast("string"),
                      "event_id bigint, event_type string, value double")
    return (spark.table(name)
            .select(doc.alias("d"))
            .groupBy(F.col("d.event_type").alias("event_type"))
            .agg(F.count("*").alias("n"),
                 F.sum(F.col("d.value").cast("decimal(28,2)"))
                 .cast("double").alias("sum_value")))
