"""Time-series operator queries: as-of join (DuckDB ASOF JOIN as the
oracle) and sessionization (window-SQL oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from xtdb_spark.operators.asof import (
    asof_join, asof_join_same_source, sessionize)
from xtdb_spark.queries.registry import ld, register


@register(
    "ts_asof_join",
    """
    WITH clicks AS (SELECT user_id, ts, event_id FROM events
                    WHERE event_type = 'click'),
         purchases AS (SELECT user_id, ts, value FROM events
                       WHERE event_type = 'purchase')
    SELECT c.event_id, c.user_id, p.value AS last_purchase_value,
           p.ts AS asof_ts
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND p.ts <= c.ts
    """,
)
def ts_asof_join_q(spark, sf_dir):
    """As-of join: each click picks up the user's most recent prior
    purchase. Both sides are the SAME events relation, so the r12
    same-source spelling applies (operators/asof.py): ONE scan + one
    carry-forward window instead of two scans + union (which erased
    the scan's partitioning and forced a full re-shuffle). Equality
    vs the general asof_join pinned in tests/test_r12_opt.py; A/B
    1.22× sf0.1 / 1.09× sf10."""
    e = ld(spark, sf_dir, "events") \
        .select("user_id", "ts", "event_id", "value", "event_type")
    joined = asof_join_same_source(
        e, on="user_id", ts="ts",
        left_pred=F.col("event_type") == "click",
        right_pred=F.col("event_type") == "purchase",
        right_cols=["value"])
    return joined.select("event_id", "user_id",
                         F.col("value").alias("last_purchase_value"),
                         F.col("asof_ts"))


@register(
    "ts_sessionize",
    """
    SELECT user_id,
           CAST(MAX(session_seq) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM (
      SELECT user_id,
             SUM(CASE WHEN prev_ts IS NULL
                        OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1
                      ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_seq
      FROM (SELECT user_id, ts,
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
            FROM events))
    GROUP BY user_id
    """,
)
def ts_sessionize_q(spark, sf_dir):
    """Sessionization: 30-minute inactivity gap splits sessions."""
    e = ld(spark, sf_dir, "events")
    s = sessionize(e, key="user_id", ts="ts", gap_minutes=30)
    return s.groupBy("user_id").agg(
        F.max("session_seq").alias("n_sessions"),
        F.count("*").alias("n_events"))


@register(
    "ts_readings_rollup",
    """
    SELECT user_id,
           CAST(time_bucket(INTERVAL 6 HOURS, ts,
                            TIMESTAMP '1970-01-01') AS TIMESTAMP) AS bin_start,
           COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
                 / COUNT(value), 6) AS avg_v,
           ROUND(MIN(value), 6) AS min_v,
           ROUND(MAX(value), 6) AS max_v
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
      AND user_id < 50
    GROUP BY user_id, bin_start
    """,
)
def ts_readings_rollup_q(spark, sf_dir):
    """The reference's `readings` bench query shape
    (modules/bench/src/main/clojure/xtdb/bench/readings.clj:25-47:
    AVG/MIN/MAX per device over a valid-time range, time-bucketed via
    range_bins). Bucketing stays a pure Column expression, so the
    groupBy is the only shuffle."""
    from xtdb_spark.functions.temporal import range_bins

    e = ld(spark, sf_dir, "events")
    return (e.filter((F.col("ts") >= F.lit("2024-01-10").cast("timestamp"))
                     & (F.col("ts") < F.lit("2024-01-20").cast("timestamp"))
                     & (F.col("user_id") < 50))
            .groupBy("user_id",
                     range_bins(F.col("ts"), "6 hours")["_from"]
                     .alias("bin_start"))
            .agg(F.count("*").alias("n"),
                 F.round(F.sum(F.col("value").cast("decimal(38,6)"))
                         .cast("double") / F.count("value"), 6).alias("avg_v"),
                 F.round(F.min("value"), 6).alias("min_v"),
                 F.round(F.max("value"), 6).alias("max_v")))


@register(
    "ts_range_join",
    """
    WITH clicks AS (SELECT event_id AS l_event_id, user_id,
                           ts AS l_from, ts + INTERVAL 90 MINUTE AS l_to
                    FROM events WHERE event_type = 'click'),
         views AS (SELECT event_id AS r_event_id, user_id,
                          ts AS r_from, ts + INTERVAL 90 MINUTE AS r_to
                   FROM events WHERE event_type = 'view')
    SELECT c.l_event_id, v.r_event_id, c.user_id,
           greatest(c.l_from, v.r_from) AS overlap_start,
           least(c.l_to, v.r_to) AS overlap_end
    FROM clicks c JOIN views v
      ON c.user_id = v.user_id AND c.l_from < v.r_to AND v.r_from < c.l_to
    """,
)
def ts_range_join_q(spark, sf_dir):
    """Interval-overlap join: 90-minute attention windows around
    clicks and views, paired when they overlap for the same user.
    Bucketized into an equi-join (operators/range_join.py) — the
    oracle is the plain theta-join spelling, proving the rewrite
    exact. The reference reaches the same results via period overlap
    predicates inside a theta join (SURVEY §2.3)."""
    from xtdb_spark.operators.range_join import range_join

    e = ld(spark, sf_dir, "events")
    win = F.expr("INTERVAL 90 MINUTES")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("l_event_id"), "user_id",
        F.col("ts").alias("l_from"), (F.col("ts") + win).alias("l_to"))
    views = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("r_event_id"), "user_id",
        F.col("ts").alias("r_from"), (F.col("ts") + win).alias("r_to"))
    j = range_join(clicks, views, "l_from", "l_to", "r_from", "r_to",
                   on=["user_id"], bucket="2 hours")
    return j.select(
        "l_event_id", "r_event_id", "user_id",
        F.greatest("l_from", "r_from").alias("overlap_start"),
        F.least("l_to", "r_to").alias("overlap_end"))
