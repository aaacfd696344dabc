"""Interval-overlap (range) join, bucketized for scale.

The reference expresses temporal overlap joins as theta predicates
over period functions (SURVEY §2.3; expression/temporal.clj Allen's
algebra) and relies on its mega-join to pick an order — on Spark a
bare `l_from < r_to AND r_from < l_to` join degenerates to a
BroadcastNestedLoopJoin / cartesian product, which is O(n·m) and dies
at scale. This operator turns interval overlap into an EQUI-join:

1. pick a bucket width `w` (≈ the typical interval length);
2. explode each interval into the epoch buckets it covers
   (`F.sequence` over `floor(from/w) .. floor((to-1µs)/w)` — pure
   column expressions, no UDF);
3. shuffle-join on (keys…, bucket) — a plain hash join Catalyst and
   AQE can reason about;
4. keep a pair only in its CANONICAL bucket — the bucket of
   `greatest(l_from, r_from)` (the overlap start, which both sides'
   bucket lists provably contain) — so every overlapping pair
   survives exactly once and no post-join `distinct` shuffle is
   needed;
5. apply the exact half-open overlap predicate `l_from < r_to AND
   r_from < l_to` as a residual filter.

Cost: |rows| × (interval_len / w) exploded rows per side, one shuffle
on (keys, bucket), map-side residual. This is the same bin-slicing
design production engines use for range-join optimization (e.g.
Databricks' range-join bin hints); with `on` keys it also inherits
their selectivity. Skewed buckets fall out of AQE skew handling like
any other hash join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_UNITS = {
    "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
    "week": 604800, "weeks": 604800,
}


def _width_micros(bucket: str) -> int:
    n, unit = bucket.strip().split()
    return int(n) * _UNITS[unit.lower()] * 1_000_000


def _us(c: Column) -> Column:
    """Epoch micros; parquet TIMESTAMP_NTZ sources cast through
    TIMESTAMP first (session tz is pinned UTC, so the cast is exact —
    same handling as streaming/ingest.py's watermark column)."""
    return F.unix_micros(c.cast("timestamp"))


def _buckets(from_c: Column, to_c: Column, w: int) -> Column:
    """Epoch-bucket ids covered by the half-open interval [from, to).
    A zero-length interval is a POINT under the standard overlap
    predicate (`l_from < r_to AND r_from < l_to` matches a point
    strictly inside the other side), so it gets its single containing
    bucket; from > to is empty. `sequence` with a descending range
    would silently generate a reversed list, so the guards are
    mandatory, not cosmetic."""
    f_us, t_us = _us(from_c), _us(to_c)
    return (
        F.when(f_us < t_us,
               F.sequence(F.floor(f_us / w), F.floor((t_us - 1) / w)))
         .when(f_us == t_us, F.array(F.floor(f_us / w)))
         .otherwise(F.array().cast("array<bigint>")))


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_from: str,
    left_to: str,
    right_from: str,
    right_to: str,
    on: list[str] | None = None,
    bucket: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join rows whose half-open intervals [left_from, left_to) and
    [right_from, right_to) overlap (and whose `on` keys match, if
    given). `bucket` sizes the epoch slices — choose it near the
    typical interval length: too small explodes rows, too large
    degrades toward all-pairs within a slice. Interval bounds must be
    non-null timestamps (resolve bitemporal ∞ to a sentinel before
    calling). `how` is 'inner' or 'left' (unmatched left rows kept
    with nulls).

    Right-side columns that collide with left-side names come back
    suffixed `_r`.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"range_join: how must be inner|left, got {how!r}")
    on = list(on or [])
    w = _width_micros(bucket)

    rename = {c: f"{c}_r" for c in right.columns
              if c in left.columns and c not in on}
    r = right
    for old, new in rename.items():
        r = r.withColumnRenamed(old, new)
    r_from, r_to = rename.get(right_from, right_from), rename.get(right_to, right_to)

    le = left.withColumn("__bkt", F.explode(_buckets(F.col(left_from), F.col(left_to), w)))
    re_ = r.withColumn("__bkt", F.explode(_buckets(F.col(r_from), F.col(r_to), w)))

    cond = [le["__bkt"] == re_["__bkt"]] + [le[k] == re_[k] for k in on]
    joined = le.join(re_, cond, "inner")
    canon = F.floor(_us(F.greatest(le[left_from], re_[r_from])) / w)
    matched = (
        joined
        .filter((le[left_from] < re_[r_to]) & (re_[r_from] < le[left_to])
                & (le["__bkt"] == canon))
        .select(*[le[c] for c in left.columns],
                *[re_[c] for c in r.columns if c not in on]))
    if how == "inner":
        return matched
    # left outer: add back left rows with no overlapping partner.
    # left-anti on the matched keys would need a unique left key; the
    # robust form re-runs the bucket join as a semi and anti-joins on
    # ALL left columns, which is exact because left rows are carried
    # through matched verbatim.
    hit = matched.select(*left.columns).distinct()
    miss = left.join(hit, [left[c].eqNullSafe(hit[c]) for c in left.columns],
                     "left_anti")
    pad = miss.select(
        *left.columns,
        *[F.lit(None).cast(dict(r.dtypes)[c]).alias(c)
          for c in r.columns if c not in on])
    return matched.unionByName(pad)
