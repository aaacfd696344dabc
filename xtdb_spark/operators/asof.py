"""As-of (point-in-time) join and sessionization.

The reference has no dedicated range/as-of join — temporal joins are
theta predicates over period functions (SURVEY §2.3). These are the
standard time-series operators a Spark engine should provide natively,
so we exceed parity here with a *shuffle-optimal* implementation.

As-of join via union + carry-forward window (NO per-group UDF, no
range explosion): tag both sides, union, single window sorted by
(key, ts) with `last(..., ignorenulls)` carrying the right side's
latest values forward onto left rows. One shuffle on the join key,
linear work — survives any scale where a window over the key fits a
partition (same constraint as any as-of semantics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    `right_ts <= left_ts` (or `<` when strict) for the same key `on`.

    Right rows sort before left rows on ts ties (so `<=` semantics
    match DuckDB's ASOF JOIN); `strict=True` flips the tie order.
    """
    right_cols = right_cols or [c for c in right.columns
                                if c not in (on, right_ts)]
    lt = left.withColumn("__ts", F.col(left_ts)) \
        .withColumn("__side", F.lit(1 if not strict else 0))
    # carry ONE struct per right row, not per-column lasts: per-column
    # `last(c, ignorenulls)` would blend values from different right
    # rows when right columns carry genuine NULLs (rowA x=1,y=NULL then
    # rowB x=NULL,y=2 must NOT yield (1,2) — a row that never existed)
    rt = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0 if not strict else 1).alias("__side"),
        F.struct(F.col(right_ts).alias("__rts"),
                 *[F.col(c) for c in right_cols]).alias("__rrow"),
    )
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    w = (Window.partitionBy(on).orderBy("__ts", "__side")
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = unioned.withColumn(
        "__c", F.last("__rrow", ignorenulls=True).over(w))
    out = carried.filter(F.col("__side") == (1 if not strict else 0))
    for c in right_cols:
        out = out.withColumn(c, F.col("__c").getField(c))
    return (out.withColumn(f"asof_{right_ts}", F.col("__c.__rts"))
            .drop("__ts", "__side", "__rrow", "__c"))


def asof_join_same_source(
    events: DataFrame,
    on: str,
    ts: str,
    left_pred: Column,
    right_pred: Column,
    right_cols: list[str],
    strict: bool = False,
) -> DataFrame:
    """As-of join where BOTH sides are filters of the SAME relation
    (the common event-log case: clicks vs purchases of one table).

    r12 (guide §2.4): one window pass over the shared scan — the
    union spelling scans the relation twice (once per side's filter)
    and erases its output partitioning, forcing the window to
    re-shuffle every row; this spelling scans once and preserves any
    existing hash partitioning on `on` (zero-exchange over a
    key-clustered cache/bucketed table). Same tie semantics as
    `asof_join` (right rows sort before left on equal ts; `strict`
    flips it). `left_pred`/`right_pred` must be disjoint. Returns the
    left rows with `right_cols` (carried from the latest qualifying
    right row) and `asof_<ts>`; equality vs `asof_join` is pinned by
    tests/test_r12_opt.py. A/B: 1.22× at sf0.1, 1.09× at sf10 (where
    the driver-collect floor dilutes it); at cold 100 TB it halves
    the scan work."""
    # __side: right rows must sort BEFORE left at equal ts for `<=`
    # semantics (after left for strict `<`) — mirror asof_join
    tagged = (events.filter(left_pred | right_pred)
              .withColumn("__side",
                          F.when(right_pred,
                                 F.lit(0 if not strict else 1))
                          .otherwise(F.lit(1 if not strict else 0))))
    rstruct = F.when(right_pred,
                     F.struct(F.col(ts).alias("__rts"),
                              *[F.col(c) for c in right_cols]))
    w = (Window.partitionBy(on).orderBy(ts, "__side")
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = tagged.withColumn("__c", F.last(rstruct, ignorenulls=True).over(w))
    out = carried.filter(~right_pred)
    for c in right_cols:
        out = out.withColumn(c, F.col("__c").getField(c))
    return (out.withColumn(f"asof_{ts}", F.col("__c.__rts"))
            .drop("__side", "__c"))


def sessionize(
    events: DataFrame,
    key: str,
    ts: str,
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Assign session ids: a new session starts when the gap since the
    previous event of the same key exceeds `gap_minutes`. Classic
    lag + cumulative-sum window — one shuffle on the key.

    The gap compares in MICROSECONDS (unix_micros), not whole seconds:
    unix_timestamp truncates each endpoint's sub-second fraction, so a
    true gap of e.g. 1800.4 s could read as 1800 or 1801 depending on
    the endpoints' fractional alignment — diverging from fractional
    `epoch(ts) - epoch(prev) > gap` semantics exactly at the boundary
    (same bug class as the cb_minmax_ts span fix)."""
    w = Window.partitionBy(key).orderBy(ts)
    us = lambda c: F.unix_micros(c.cast("timestamp"))
    gap_us = us(F.col(ts)) - us(F.lag(ts).over(w))
    new_session = (gap_us.isNull()
                   | (gap_us > int(round(gap_minutes * 60 * 1000000)))).cast("long")
    return (events
            .withColumn("__new", new_session)
            .withColumn("session_seq",
                        F.sum("__new").over(
                            w.rowsBetween(Window.unboundedPreceding, 0)))
            .drop("__new"))
