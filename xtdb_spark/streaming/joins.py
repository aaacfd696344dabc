"""Stream-stream interval join (beyond-reference streaming surface).

The reference has no streaming query operators (SURVEY §2.9 — its
streaming is ingest), but a Spark-native engine should expose the
platform's stream-stream join: two unbounded sources joined on a key
within a time interval, with watermarks bounding BOTH sides' state so
the join's buffered state is evicted as event time advances — the
property that makes it runnable forever at 100 TB/day.

Semantics: left event at time tl pairs with right events at tr in
[tl - lookback, tl + lookahead] for the same key. Both inputs MUST
carry watermarks (enforced here) or Spark would buffer the full
history of both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback: str = "1 hour",
    lookahead: str = "0 seconds",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join streaming `left` with streaming `right` on `on`, keeping
    pairs with `right_ts` in [left_ts - lookback, left_ts + lookahead].
    Columns come back prefixed l_/r_ (stream-stream joins forbid
    ambiguous names). Outer variants ('left_outer', 'right_outer')
    emit unmatched rows once the watermark proves no partner can
    arrive — exactly Spark's state-eviction contract."""
    lw = left.select(
        F.col(on).alias("l_key"), F.col(left_ts).cast("timestamp").alias("l_ts"),
        *[F.col(c).alias(f"l_{c}") for c in left.columns if c not in (on, left_ts)],
    ).withWatermark("l_ts", watermark)
    rw = right.select(
        F.col(on).alias("r_key"), F.col(right_ts).cast("timestamp").alias("r_ts"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c not in (on, right_ts)],
    ).withWatermark("r_ts", watermark)
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {lookback}"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {lookahead}"))
    )
    return lw.join(rw, cond, how)
