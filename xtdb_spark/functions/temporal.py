"""Temporal scalar/table functions.

Parity targets (reference core/src/main/clojure/xtdb/expression/temporal.clj):
- `generate_series` over timestamps (temporal.clj generate_series defmethods)
- `range_bins` time-bucketing (temporal.clj range_bins) — the
  reference's primitive behind time-series rollup queries
  (modules/bench/src/main/clojure/xtdb/bench/readings.clj:41-47)
- `date_trunc`, `extract`, `age` → native Spark functions.

All pure Column compositions (no UDFs): `F.sequence` + `explode`
runs JVM-side and parallelizes per input row, so a series spanning
years at minute granularity still distributes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def generate_series_ts(spark: SparkSession, start, stop, step_interval: str,
                       col_name: str = "ts") -> DataFrame:
    """Series of timestamps [start, stop) at a fixed interval, as a
    1-column DataFrame. `step_interval` e.g. '1 hour', '5 minutes'.
    """
    seq = F.sequence(
        F.lit(start).cast("timestamp"),
        F.lit(stop).cast("timestamp"),
        F.expr(f"INTERVAL {step_interval}"),
    )
    df = spark.range(1).select(F.explode(seq).alias(col_name))
    # half-open: F.sequence is inclusive of stop when it lands exactly
    return df.filter(F.col(col_name) < F.lit(stop).cast("timestamp"))


def generate_series_int(spark: SparkSession, start: int, stop: int, step: int = 1,
                        col_name: str = "n") -> DataFrame:
    """Integer series [start, stop) — reference expression.clj:2360-2366.
    `spark.range` is already a distributed, splittable source."""
    return spark.range(start, stop, step).withColumnRenamed("id", col_name)


def range_bins(ts: Column, bin_width: str, origin: str = "1970-01-01 00:00:00") -> Column:
    """Assign `ts` to a fixed-width bin; returns struct<_from,_to>
    (the bin period). Equivalent of reference range_bins
    (expression/temporal.clj), built from epoch arithmetic so it
    stays in whole-stage codegen.

    bin_width: SQL interval string understood as seconds, e.g.
    '1 hour', '15 minutes'.
    """
    width_s = F.unix_timestamp(F.lit(origin).cast("timestamp") + F.expr(f"INTERVAL {bin_width}")) \
        - F.unix_timestamp(F.lit(origin).cast("timestamp"))
    origin_s = F.unix_timestamp(F.lit(origin).cast("timestamp"))
    bin_idx = F.floor((F.unix_timestamp(ts) - origin_s) / width_s)
    from_s = origin_s + bin_idx * width_s
    return F.struct(
        F.timestamp_seconds(from_s).alias("_from"),
        F.timestamp_seconds(from_s + width_s).alias("_to"),
    )


def date_bin_start(ts: Column, width_seconds: int) -> Column:
    """Scalar bucket-start timestamp (cheap path used by bench/rollups)."""
    secs = F.floor(F.unix_timestamp(ts) / width_seconds) * width_seconds
    return F.timestamp_seconds(secs)
