"""Bitemporal correctness queries, cross-checked against DuckDB.

The driver's `events` table is deterministically reinterpreted as a
bitemporal event log (entity = user_id, `_system_from` = ts, op =
'delete' when event_type = 'error' else 'put'), then resolved with the
engine's window-based visibility logic (xtdb_spark.bitemporal). The
oracle expresses the same XTDB semantics as plain window SQL — an
independent derivation on an independent engine.

Reference semantics under test: scan temporal bounds
(core/src/main/clojure/xtdb/operator/scan.clj:62-114), supersession
(core/src/main/kotlin/xtdb/bitemporal/PolygonCalculator.kt:22-50).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from xtdb_spark import bitemporal
from xtdb_spark.queries.registry import ld, register


def _as_event_log(spark, sf_dir):
    """events parquet → bitemporal event frame. Valid time = [ts, ∞);
    system time = ts; 'error' events are deletes."""
    e = ld(spark, sf_dir, "events")
    return e.select(
        F.col("user_id").alias("_id"),
        F.col("value"),
        F.col("event_type"),
        F.col("user_id").alias("_iid"),  # already a compact unique key
        F.col("ts").alias("_valid_from"),
        F.lit(None).cast("timestamp").alias("_valid_to"),
        F.col("ts").alias("_system_from"),
        F.when(F.col("event_type") == "error", "delete").otherwise("put").alias("op"),
    )


_ORACLE_EVENTS = """
    WITH ev AS (
      SELECT user_id AS _id, value, ts AS _system_from, ts AS _valid_from,
             CASE WHEN event_type = 'error' THEN 'delete' ELSE 'put' END AS op
      FROM events
    )
"""


@register(
    "bitemp_current_state",
    _ORACLE_EVENTS + """
    SELECT _id, value FROM (
      SELECT _id, value, op,
             ROW_NUMBER() OVER (PARTITION BY _id
                                ORDER BY _system_from DESC) AS rn
      FROM ev)
    WHERE rn = 1 AND op = 'put'
    """,
)
def current_state(spark, sf_dir):
    """Default scan: VALID_TIME AS OF now, SYSTEM_TIME AS OF now
    (reference scan.clj:307-310)."""
    ev = _as_event_log(spark, sf_dir)
    return bitemporal.resolve_asof(ev).select("_id", "value")


@register(
    "bitemp_asof_system_time",
    _ORACLE_EVENTS + """
    SELECT _id, value FROM (
      SELECT _id, value, op,
             ROW_NUMBER() OVER (PARTITION BY _id
                                ORDER BY _system_from DESC) AS rn
      FROM ev WHERE _system_from <= TIMESTAMP '2024-01-15')
    WHERE rn = 1 AND op = 'put'
    """,
)
def asof_system(spark, sf_dir):
    """FOR SYSTEM_TIME AS OF — time-travel to a past snapshot."""
    ev = _as_event_log(spark, sf_dir)
    return bitemporal.resolve_asof(ev, system_time="2024-01-15").select("_id", "value")


@register(
    "bitemp_asof_valid_time",
    _ORACLE_EVENTS + """
    SELECT _id, value FROM (
      SELECT _id, value, op,
             ROW_NUMBER() OVER (PARTITION BY _id
                                ORDER BY _system_from DESC) AS rn
      FROM ev WHERE _valid_from <= TIMESTAMP '2024-01-10 12:00:00')
    WHERE rn = 1 AND op = 'put'
    """,
)
def asof_valid(spark, sf_dir):
    """FOR VALID_TIME AS OF — rows whose valid interval covers V,
    system-latest wins (valid_to = ∞ here, so covering ⇔
    _valid_from <= V)."""
    ev = _as_event_log(spark, sf_dir)
    return bitemporal.resolve_asof(ev, valid_time="2024-01-10 12:00:00") \
        .select("_id", "value")


@register(
    "bitemp_system_history",
    _ORACLE_EVENTS + """
    SELECT _id,
           COUNT(*) AS n_versions,
           COUNT(*) FILTER (WHERE op = 'delete') AS n_deletes,
           MIN(_system_from) AS first_seen,
           MAX(_system_from) AS last_seen,
           COUNT(_system_to) AS n_superseded
    FROM (SELECT _id, op, _system_from,
                 LEAD(_system_from) OVER (PARTITION BY _id, _valid_from
                                          ORDER BY _system_from) AS _system_to
          FROM ev)
    GROUP BY _id
    """,
)
def system_history(spark, sf_dir):
    """FOR ALL SYSTEM_TIME: full version chain with derived
    `_system_to` (xtdb_spark.bitemporal.with_system_to)."""
    ev = _as_event_log(spark, sf_dir)
    h = bitemporal.with_system_to(ev)
    return h.groupBy("_id").agg(
        F.count("*").alias("n_versions"),
        F.count(F.when(F.col("op") == "delete", 1)).alias("n_deletes"),
        F.min("_system_from").alias("first_seen"),
        F.max("_system_from").alias("last_seen"),
        F.count("_system_to").alias("n_superseded"),
    )


@register(
    "bitemp_polygon_rectangles",
    _ORACLE_EVENTS + """
    -- Degenerate geometry of this event shape (valid_from = system_from,
    -- valid_to = ∞, vf strictly increasing in system order): when the
    -- ceiling sweep reaches event i, the ceiling is two segments
    -- ([-∞, vf_{i+1}) → ∞, [vf_{i+1}, ∞) → sf_{i+1}), so each put with a
    -- successor yields exactly 2 rectangles ([vf_i, vf_{i+1}) × [sf_i, ∞)
    -- and [vf_{i+1}, ∞) × [sf_i, sf_{i+1})) and the entity-latest put
    -- yields 1 — with exactly one system-open rectangle per put.
    SELECT _id,
           CAST(SUM(CASE WHEN next_sf IS NULL THEN 1 ELSE 2 END) AS BIGINT)
             AS n_rects,
           MIN(_valid_from) AS min_vf,
           MAX(_system_from) AS max_sf,
           COUNT(*) AS n_open
    FROM (
      SELECT _id, _valid_from, _system_from, op,
             LEAD(_system_from) OVER (PARTITION BY _id
                                      ORDER BY _system_from) AS next_sf
      FROM ev) t
    WHERE op = 'put'
    GROUP BY _id
    """,
)
def polygon_rectangles(spark, sf_dir):
    """FOR ALL VALID_TIME FOR ALL SYSTEM_TIME — the full polygon
    enumeration (applyInPandas ceiling sweep, bitemporal.polygon_history)
    aggregated per entity, cross-checked against a closed-form oracle
    valid for this event shape (see SQL comment)."""
    ev = _as_event_log(spark, sf_dir)
    hist = bitemporal.polygon_history(ev, ["_id", "value", "event_type"])
    return hist.groupBy("_id").agg(
        F.count("*").alias("n_rects"),
        F.min("_valid_from").alias("min_vf"),
        F.max("_system_from").alias("max_sf"),
        F.count(F.when(F.col("_system_to").isNull(), 1)).alias("n_open"),
    )


@register(
    "bitemp_polygon_streamed",
    _ORACLE_EVENTS + """
    -- same closed-form oracle as bitemp_polygon_rectangles: the
    -- streaming sweep must emit IDENTICAL rectangles
    SELECT _id,
           CAST(SUM(CASE WHEN next_sf IS NULL THEN 1 ELSE 2 END) AS BIGINT)
             AS n_rects,
           MIN(_valid_from) AS min_vf,
           MAX(_system_from) AS max_sf,
           COUNT(*) AS n_open
    FROM (
      SELECT _id, _valid_from, _system_from, op,
             LEAD(_system_from) OVER (PARTITION BY _id
                                      ORDER BY _system_from) AS next_sf
      FROM ev) t
    WHERE op = 'put'
    GROUP BY _id
    """,
)
def polygon_rectangles_streamed(spark, sf_dir):
    """The round-7 bounded-memory polygon path
    (bitemporal.polygon_history_streamed: repartition + external sort
    + mapInPandas with ceiling carry-over across arrow batches)
    against the SAME closed-form oracle as the grouped sweep —
    driver-checked proof the scale path is rectangle-identical."""
    ev = _as_event_log(spark, sf_dir)
    hist = bitemporal.polygon_history_streamed(
        ev, ["_id", "value", "event_type"])
    return hist.groupBy("_id").agg(
        F.count("*").alias("n_rects"),
        F.min("_valid_from").alias("min_vf"),
        F.max("_system_from").alias("max_sf"),
        F.count(F.when(F.col("_system_to").isNull(), 1)).alias("n_open"),
    )


@register(
    "bitemp_valid_between",
    """
    WITH ev AS (
      SELECT user_id AS _id, value, ts AS _valid_from,
             CASE WHEN event_type = 'purchase'
                  THEN ts + INTERVAL 7 DAY ELSE NULL END AS _valid_to,
             ts AS _system_from,
             CASE WHEN event_type = 'error' THEN 'delete' ELSE 'put' END AS op
      FROM events),
    hist AS (
      SELECT _id, value, _valid_from, op,
             CASE WHEN next_vf IS NULL THEN _valid_to
                  ELSE LEAST(COALESCE(_valid_to, TIMESTAMP '9999-12-31'),
                             next_vf) END AS _valid_to_eff
      FROM (SELECT *, LEAD(_valid_from) OVER (PARTITION BY _id
                      ORDER BY _valid_from, _system_from) AS next_vf
            FROM ev))
    SELECT _id, value, _valid_from, _valid_to_eff
    FROM hist
    WHERE op = 'put'
      AND _valid_from < TIMESTAMP '2024-01-12'
      AND (_valid_to_eff IS NULL OR _valid_to_eff > TIMESTAMP '2024-01-10')
    """,
)
def valid_between(spark, sf_dir):
    """FOR VALID_TIME FROM '2024-01-10' TO '2024-01-12' — versions
    whose *effective* valid interval (own range clipped by successor
    events, bounded ranges for purchases) overlaps the query window
    (reference temporal-bounds eval, scan.clj:62-114). Exercises
    bounded AND open valid_to plus supersession gaps."""
    e = ld(spark, sf_dir, "events")
    ev = e.select(
        F.col("user_id").alias("_id"),
        F.col("value"),
        F.col("user_id").alias("_iid"),
        F.col("ts").alias("_valid_from"),
        F.when(F.col("event_type") == "purchase",
               F.col("ts") + F.expr("INTERVAL 7 DAY"))
        .otherwise(F.lit(None).cast("timestamp")).alias("_valid_to"),
        F.col("ts").alias("_system_from"),
        F.when(F.col("event_type") == "error", "delete")
        .otherwise("put").alias("op"),
    )
    h = bitemporal.valid_history(ev)
    a = F.lit("2024-01-10").cast("timestamp")
    b = F.lit("2024-01-12").cast("timestamp")
    return (h.filter((F.col("_valid_from") < b)
                     & (F.col("_valid_to_eff").isNull()
                        | (F.col("_valid_to_eff") > a)))
            .select("_id", "value", "_valid_from", "_valid_to_eff"))


@register(
    "bitemp_readings_rollup",
    """
    WITH ev AS (
      SELECT user_id AS _id, value, ts AS _valid_from,
             CASE WHEN event_type = 'purchase'
                  THEN ts + INTERVAL 7 DAY ELSE NULL END AS _valid_to,
             ts AS _system_from,
             CASE WHEN event_type = 'error' THEN 'delete' ELSE 'put' END AS op
      FROM events),
    hist AS (
      SELECT _id, value, _valid_from, op,
             CASE WHEN next_vf IS NULL THEN _valid_to
                  ELSE LEAST(COALESCE(_valid_to, TIMESTAMP '9999-12-31'),
                             next_vf) END AS _valid_to_eff
      FROM (SELECT *, LEAD(_valid_from) OVER (PARTITION BY _id
                      ORDER BY _valid_from, _system_from) AS next_vf
            FROM ev))
    SELECT _id,
           COUNT(*) AS n_readings,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
                 / COUNT(value), 6) AS avg_v,
           ROUND(MIN(value), 6) AS min_v,
           ROUND(MAX(value), 6) AS max_v
    FROM hist
    WHERE op = 'put'
      AND _valid_from < TIMESTAMP '2024-01-20'
      AND (_valid_to_eff IS NULL OR _valid_to_eff > TIMESTAMP '2024-01-05')
    GROUP BY _id
    """,
)
def readings_rollup(spark, sf_dir):
    """The reference's time-series bench query verbatim in shape
    (modules/bench/src/main/clojure/xtdb/bench/readings.clj:25-47:
    `SELECT AVG(value), MIN(value), MAX(value) FROM readings
    FOR VALID_TIME BETWEEN ? AND ? GROUP BY _id`): device readings
    modeled as bitemporal versions, aggregated over the valid-time
    window. Composition: valid_history (effective intervals after
    supersession) → overlap filter → per-entity aggregate — the
    temporal scan is one window over _id, the rollup one shuffle on
    _id, so the whole query is TWO exchanges at any scale (and the
    window and groupBy share the _id partitioning, so AQE reuses the
    exchange on a cluster)."""
    e = ld(spark, sf_dir, "events")
    ev = e.select(
        F.col("user_id").alias("_id"),
        F.col("value"),
        F.col("user_id").alias("_iid"),
        F.col("ts").alias("_valid_from"),
        F.when(F.col("event_type") == "purchase",
               F.col("ts") + F.expr("INTERVAL 7 DAY"))
        .otherwise(F.lit(None).cast("timestamp")).alias("_valid_to"),
        F.col("ts").alias("_system_from"),
        F.when(F.col("event_type") == "error", "delete")
        .otherwise("put").alias("op"),
    )
    h = bitemporal.valid_history(ev)
    a = F.lit("2024-01-05").cast("timestamp")
    b = F.lit("2024-01-20").cast("timestamp")
    vis = h.filter((F.col("_valid_from") < b)
                   & (F.col("_valid_to_eff").isNull()
                      | (F.col("_valid_to_eff") > a)))
    return vis.groupBy("_id").agg(
        F.count("*").alias("n_readings"),
        F.round(F.sum(F.col("value").cast("decimal(38,6)")).cast("double")
                / F.count("value"), 6).alias("avg_v"),
        F.round(F.min("value"), 6).alias("min_v"),
        F.round(F.max("value"), 6).alias("max_v"))


@register(
    "bitemp_prefilter_scan",
    _ORACLE_EVENTS + """
    SELECT _id, value FROM (
      SELECT _id, value, op,
             ROW_NUMBER() OVER (PARTITION BY _id
                                ORDER BY _system_from DESC) AS rn
      FROM ev)
    WHERE rn = 1 AND op = 'put' AND value > 50.0
    """,
)
def prefilter_scan(spark, sf_dir):
    """Candidate-iid prefilter pruning (tx.py scan(prefilter=...)):
    the predicate runs a cheap columnar candidate pass, events
    left-semi-join to candidates BEFORE resolution, and the same
    predicate re-applies on the resolved rows — the oracle is the
    plain resolved-then-filtered spelling, so the driver checks the
    superset property (history-only matches must be dropped by the
    outer filter, not leak past resolution)."""
    ev = _as_event_log(spark, sf_dir)
    pred = F.col("value") > 50.0
    cand = ev.where(pred).select("_iid").distinct()
    pruned = ev.join(cand, "_iid", "left_semi")
    return (bitemporal.resolve_asof(pruned)
            .filter(pred).select("_id", "value"))


@register(
    "bitemp_period_cols",
    """
    WITH ev AS (
      SELECT user_id AS _id, value, ts AS _valid_from,
             CASE WHEN event_type = 'purchase'
                  THEN ts + INTERVAL 7 DAY ELSE NULL END AS _valid_to,
             ts AS _system_from,
             CASE WHEN event_type = 'error' THEN 'delete' ELSE 'put' END AS op
      FROM events),
    hist AS (
      SELECT _id, value, _valid_from, op,
             CASE WHEN next_vf IS NULL THEN _valid_to
                  ELSE LEAST(COALESCE(_valid_to, TIMESTAMP '9999-12-31'),
                             next_vf) END AS _valid_to_eff
      FROM (SELECT *, LEAD(_valid_from) OVER (PARTITION BY _id
                      ORDER BY _valid_from, _system_from) AS next_vf
            FROM ev))
    SELECT _id,
           COUNT(*) AS n_slices,
           COUNT(CASE WHEN _valid_from <= TIMESTAMP '2024-01-10 12:00:00'
                       AND (_valid_to_eff IS NULL
                            OR TIMESTAMP '2024-01-10 12:00:00' < _valid_to_eff)
                      THEN 1 END) AS n_contain,
           MIN(_valid_from) AS first_from
    FROM hist WHERE op = 'put' GROUP BY _id
    """,
)
def period_cols(spark, sf_dir):
    """The `_VALID_TIME` period pseudo-column surface (round 11;
    reference: every table exposes _valid_time/_system_time periods,
    its period predicates and LOWER/UPPER consume them — Sql.g4
    periodPredicate/periodBoundFunction; direct-sql corpus): the
    validity timeline's slices carry a `_valid_time` struct, and the
    aggregation runs through the SQL dialect layer with a CONTAINS
    point predicate and a LOWER() bound — all translated to plain
    Column comparisons by sql/constructs.py (no UDF; the period is a
    named_struct, so the predicate stays in whole-stage codegen)."""
    from xtdb_spark.sql.constructs import translate

    e = ld(spark, sf_dir, "events")
    ev = e.select(
        F.col("user_id").alias("_id"),
        F.col("value"),
        F.col("user_id").alias("_iid"),
        F.col("ts").alias("_valid_from"),
        F.when(F.col("event_type") == "purchase",
               F.col("ts") + F.expr("INTERVAL 7 DAY"))
        .otherwise(F.lit(None).cast("timestamp")).alias("_valid_to"),
        F.col("ts").alias("_system_from"),
        F.when(F.col("event_type") == "error", "delete")
        .otherwise("put").alias("op"),
    )
    h = bitemporal.valid_history(ev)
    tl = h.select(
        "_id", "value", "_valid_from",
        F.col("_valid_to_eff").alias("_valid_to"),
        F.struct(F.col("_valid_from").alias("_from"),
                 F.col("_valid_to_eff").alias("_to"))
        .alias("_valid_time"))
    tl.createOrReplaceTempView("xt_period_tl")
    return spark.sql(translate("""
        SELECT _id,
               COUNT(*) AS n_slices,
               COUNT(CASE WHEN t._VALID_TIME CONTAINS
                               TIMESTAMP '2024-01-10 12:00:00'
                          THEN 1 END) AS n_contain,
               MIN(LOWER(t._VALID_TIME)) AS first_from
        FROM xt_period_tl AS t GROUP BY _id
    """))
