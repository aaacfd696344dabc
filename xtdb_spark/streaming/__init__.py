from xtdb_spark.streaming.ingest import stream_events_to_table, windowed_counts

__all__ = ["stream_events_to_table", "windowed_counts"]
