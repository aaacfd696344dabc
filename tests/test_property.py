"""Property-based tests (hypothesis) — the port of the reference's
generative coverage (reference src/test/clojure/xtdb/expression_test.clj
and bitemporal kotlin tests use test.check; SURVEY.md §5).

Two invariant families:
- Allen's period algebra vs a pure-Python interval model.
- Bitemporal resolve_asof vs a brute-force visibility model.

Each hypothesis example ships one batched DataFrame through Spark
(not one row per example) so the suite stays fast.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from xtdb_spark import bitemporal
from xtdb_spark.functions import periods as P

BASE = datetime(2024, 1, 1)


def _t(i: int | None) -> datetime | None:
    return None if i is None else BASE + timedelta(hours=i)


# bounded starts 0..9, ends start..10 or None (∞)
period_strategy = st.tuples(
    st.integers(0, 9),
    st.one_of(st.none(), st.integers(0, 10)),
).map(lambda t: (t[0], None if t[1] is None or t[1] <= t[0] else t[1]))


def _model_preds(a_from, a_to, b_from, b_to):
    """Pure-Python [from, to) Allen model; None end = +inf."""
    INF = 10 ** 9
    ae = INF if a_to is None else a_to
    be = INF if b_to is None else b_to
    return {
        "contains": a_from <= b_from and be <= ae,
        "overlaps": a_from < be and b_from < ae,
        "equals": a_from == b_from and ae == be,
        "precedes": ae <= b_from,
        "succeeds": a_from >= be,
        "imm_precedes": ae == b_from,
        "imm_succeeds": a_from == be,
    }


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(period_strategy, period_strategy),
                min_size=1, max_size=25))
def test_allen_algebra_matches_model(spark, pairs):
    rows = [(i, _t(af), _t(at), _t(bf), _t(bt))
            for i, ((af, at), (bf, bt)) in enumerate(pairs)]
    df = spark.createDataFrame(
        rows, "i int, af timestamp, at timestamp, bf timestamp, bt timestamp")
    a = P.period(F.col("af"), F.col("at"))
    b = P.period(F.col("bf"), F.col("bt"))
    got = {r["i"]: r for r in df.select(
        "i",
        P.p_contains(a, b).alias("contains"),
        P.p_overlaps(a, b).alias("overlaps"),
        P.p_equals(a, b).alias("equals"),
        P.p_precedes(a, b).alias("precedes"),
        P.p_succeeds(a, b).alias("succeeds"),
        P.p_immediately_precedes(a, b).alias("imm_precedes"),
        P.p_immediately_succeeds(a, b).alias("imm_succeeds"),
    ).collect()}
    for i, ((af, at), (bf, bt)) in enumerate(pairs):
        want = _model_preds(af, at, bf, bt)
        for k, v in want.items():
            assert bool(got[i][k]) == v, (
                f"{k} mismatch for a=[{af},{at}) b=[{bf},{bt}): "
                f"spark={bool(got[i][k])} model={v}")


# --- bitemporal visibility ---------------------------------------------------

event_strategy = st.tuples(
    st.integers(1, 3),                      # _id
    st.integers(0, 9),                      # valid_from (hours)
    st.one_of(st.none(), st.integers(1, 11)),  # valid_to
    st.integers(0, 9),                      # system_from
    st.sampled_from(["put", "put", "put", "delete"]),
)


def _model_visible(events, vq, sq):
    """Brute-force XTDB visibility: per id, among events with
    system_from <= sq whose valid range covers vq, the one with the
    greatest system_from wins (ties: later list position — mirrors
    the deterministic row_number tiebreak); visible iff it's a put."""
    out = {}
    for pos, (eid, vf, vt, sf, op, val) in enumerate(events):
        if sf > sq:
            continue
        vt_eff = 10 ** 9 if (vt is None or vt <= vf) else vt
        if not (vf <= vq < vt_eff):
            continue
        cur = out.get(eid)
        if cur is None or (sf, pos) >= (cur[0], cur[1]):
            out[eid] = (sf, pos, op, val)
    return {eid: val for eid, (sf, pos, op, val) in out.items() if op == "put"}


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(event_strategy, min_size=1, max_size=12),
       st.integers(0, 10), st.integers(0, 10))
def test_resolve_asof_matches_model(spark, raw_events, vq, sq):
    # value = position, so every event is distinguishable; tiebreak on
    # equal (id, system_from) must be deterministic in BOTH model and
    # engine → make system_from unique per id by spreading minutes
    events = []
    seen = {}
    for pos, (eid, vf, vt, sf, op) in enumerate(raw_events):
        key = (eid, sf)
        bump = seen.get(key, 0)
        seen[key] = bump + 1
        events.append((eid, vf, vt, sf * 60 + bump, op, pos))

    rows = [(eid, val, eid,
             _t(vf), _t(None if (vt is None or vt <= vf) else vt),
             BASE + timedelta(minutes=sfm), op)
            for (eid, vf, vt, sfm, op, val) in events]
    df = spark.createDataFrame(
        rows, "_id int, value int, _iid int, _valid_from timestamp, "
              "_valid_to timestamp, _system_from timestamp, op string")
    got = {r["_id"]: r["value"]
           for r in bitemporal.resolve_asof(
               df, valid_time=_t(vq),
               system_time=BASE + timedelta(minutes=sq * 60 + 59),
           ).select("_id", "value").collect()}

    model_events = [(eid, vf, vt, sfm, op, val)
                    for (eid, vf, vt, sfm, op, val) in events]
    want = _model_visible(model_events, vq, sq * 60 + 59)
    assert got == want, f"events={events} vq={vq} sq={sq}"


# --- polygon enumeration vs 2D brute force -----------------------------------

@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(event_strategy, min_size=1, max_size=10))
def test_polygon_history_covers_plane_correctly(spark, raw_events):
    """For every (valid, system) grid point: the brute-force winner
    (system-latest covering put) must be covered by exactly one of
    that event's rectangles; delete-or-nothing points by none."""
    events = []
    seen = {}
    for pos, (eid, vf, vt, sf, op) in enumerate(raw_events):
        bump = seen.get((eid, sf), 0)
        seen[(eid, sf)] = bump + 1
        events.append((eid, vf, vt, sf * 60 + bump, op, pos))

    rows = [(eid, val, eid,
             _t(vf), _t(None if (vt is None or vt <= vf) else vt),
             BASE + timedelta(minutes=sfm), op)
            for (eid, vf, vt, sfm, op, val) in events]
    df = spark.createDataFrame(
        rows, "_id int, value int, _iid int, _valid_from timestamp, "
              "_valid_to timestamp, _system_from timestamp, op string")
    rects = bitemporal.polygon_history(df, ["value"]).collect()

    far = datetime(2200, 1, 1)
    by_point = {}
    for r in rects:
        vf, vt = r["_valid_from"], r["_valid_to"] or far
        sf, stt = r["_system_from"], r["_system_to"] or far
        for v in range(0, 12):
            for s in range(0, 11):
                V = _t(v)
                S = BASE + timedelta(minutes=s * 60 + 59)
                if vf <= V < vt and sf <= S < stt:
                    key = (r["_iid"], v, s)
                    assert key not in by_point, f"overlap at {key}"
                    by_point[key] = r["value"]

    for v in range(0, 12):
        for s in range(0, 11):
            want = _model_visible(events, v, s * 60 + 59)
            for eid in {e[0] for e in events}:
                got_val = by_point.get((eid, v, s))
                assert got_val == want.get(eid), (
                    f"(id={eid}, V={v}, S={s}): rects say {got_val}, "
                    f"model says {want.get(eid)}; events={events}")


# --- erase interleavings vs model --------------------------------------------

erase_event_strategy = st.tuples(
    st.integers(1, 3),                      # _id
    st.integers(0, 9),                      # valid_from (hours)
    st.one_of(st.none(), st.integers(1, 11)),  # valid_to
    st.integers(0, 9),                      # system_from
    st.sampled_from(["put", "put", "put", "delete", "erase"]),
)


def _model_visible_with_erase(events, vq, sq):
    """Erase wipes every event of the same id written at-or-before the
    LATEST erase (physical destruction — applies regardless of the
    query's system time); later re-puts survive (reference
    PolygonCalculator.kt newest-system-first sweep)."""
    emax = {}
    for (eid, vf, vt, sf, op, val) in events:
        if op == "erase":
            emax[eid] = max(emax.get(eid, -1), sf)
    survivors = [e for e in events if e[3] > emax.get(e[0], -1)]
    return _model_visible(survivors, vq, sq)


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(erase_event_strategy, min_size=1, max_size=12),
       st.integers(0, 10), st.integers(0, 10))
def test_resolve_asof_with_erase_matches_model(spark, raw_events, vq, sq):
    events = []
    seen = {}
    for pos, (eid, vf, vt, sf, op) in enumerate(raw_events):
        key = (eid, sf)
        bump = seen.get(key, 0)
        seen[key] = bump + 1
        events.append((eid, vf, vt, sf * 60 + bump, op, pos))

    rows = [(eid, val, eid,
             _t(vf), _t(None if (vt is None or vt <= vf) else vt),
             BASE + timedelta(minutes=sfm), op)
            for (eid, vf, vt, sfm, op, val) in events]
    df = spark.createDataFrame(
        rows, "_id int, value int, _iid int, _valid_from timestamp, "
              "_valid_to timestamp, _system_from timestamp, op string")
    got = {r["_id"]: r["value"]
           for r in bitemporal.resolve_asof(
               df, valid_time=_t(vq),
               system_time=BASE + timedelta(minutes=sq * 60 + 59),
           ).select("_id", "value").collect()}
    want = _model_visible_with_erase(events, vq, sq * 60 + 59)
    assert got == want, f"events={events} vq={vq} sq={sq}"
