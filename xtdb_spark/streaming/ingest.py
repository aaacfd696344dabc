"""Streaming ingest: the Spark re-expression of the reference's
log → indexer pipeline.

Reference: a single ordered tx log (in-memory / local / Kafka —
core/src/main/clojure/xtdb/log.clj:70-87) is tailed by the indexer
(core/src/main/kotlin/xtdb/indexer/LogProcessor.kt) into the live
index, flushed to immutable columnar files. The reference has NO
streaming *query* operators (SURVEY.md §2.9) — streaming is ingest.

Spark design: Structured Streaming `readStream` → `foreachBatch` →
bitemporal event-append. Exactly-once via checkpointing + the
idempotent append (batch id embedded in the file path). A Kafka
source is the same code with `.format("kafka")` — gated here since
the test container has no broker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_events_to_table(spark: SparkSession, source_dir: str, store,
                           table: str, checkpoint: str,
                           id_col: str = "event_id",
                           ts_col: str = "ts") -> None:
    """File-source streaming ingest: replay a parquet event directory
    through micro-batches into a bitemporal table via foreachBatch.
    Uses Trigger.AvailableNow so it terminates after draining."""
    static = spark.read.parquet(source_dir)
    stream = (spark.readStream.schema(static.schema).parquet(source_dir))

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        docs = batch_df.withColumnRenamed(id_col, "_id")
        store.put(table, docs)

    (stream.writeStream.foreachBatch(sink)
     .option("checkpointLocation", checkpoint)
     .trigger(availableNow=True)
     .start()
     .awaitTermination())


def kafka_tx_log_stream(spark: SparkSession, brokers: str, topic: str,
                        starting_offsets: str = "earliest") -> DataFrame:
    """The reference's Kafka tx-log as a Structured Streaming source
    (reference modules/kafka; log.clj:70-87 factories): returns the
    raw (key, value, timestamp, offset) stream — pipe through
    `foreachBatch` + `store.put` exactly like the file source in
    `stream_events_to_table`. The log offset is the tx-id, so the
    checkpoint + idempotent append give exactly-once.

    Requires the spark-sql-kafka package on the classpath; the test
    container has no broker, so this raises a clear error at `.load()`
    time rather than being silently untested."""
    return (spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", brokers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .load())


def windowed_counts(events: DataFrame, ts_col: str = "ts",
                    key_col: str = "event_type",
                    window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window aggregation — the standard
    late-data-tolerant rollup (exceeds the reference: XTDB has no
    streaming windows). Works on both streaming and batch frames."""
    df = events
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        # withWatermark rejects TIMESTAMP_NTZ event time
        # ([EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE]); the session tz is
        # pinned UTC, so the cast is a pure type-tag change.
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (df.groupBy(F.window(F.col(ts_col), window).alias("win"),
                       F.col(key_col))
            .agg(F.count("*").alias("n"),
                 F.sum(F.col("value").cast("decimal(28,2)")).cast("double")
                 .alias("sum_value"))
            .select(F.col("win.start").alias("win_start"),
                    F.col(key_col), F.col("n"), F.col("sum_value")))


def dedupe_stream(events: DataFrame, id_cols: list[str] | None = None,
                  ts_col: str = "ts", watermark: str = "1 hour") -> DataFrame:
    """Streaming exactly-once dedup: drop re-deliveries of the same
    id(s) arriving within the watermark horizon — the streaming
    counterpart of the batch `exact_duplicates` pipeline op, and the
    idempotence layer a log-replay ingest needs when the upstream log
    can redeliver (at-least-once Kafka semantics; reference's indexer
    dedupes on tx-id the same way). State per id is evicted once the
    watermark passes it, so state size tracks the horizon, not the
    stream length. Built on `dropDuplicatesWithinWatermark` (event
    time), falling back to key-only `dropDuplicates` for batch
    DataFrames (where the watermark is meaningless)."""
    id_cols = id_cols or ["event_id"]
    if not events.isStreaming:
        return events.dropDuplicates(id_cols)
    if dict(events.dtypes).get(ts_col) == "timestamp_ntz":
        events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (events.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(id_cols))
