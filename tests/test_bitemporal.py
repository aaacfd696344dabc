"""Bitemporal engine tests — modeled on the reference's as-of and
polygon test corpus (src/test/clojure/xtdb/as_of_test.clj,
core/src/test/kotlin/xtdb/bitemporal/)."""

from datetime import datetime

from pyspark.sql import functions as F

from xtdb_spark import bitemporal


def T(s):
    return datetime.fromisoformat(s)


def events_df(spark, rows):
    """rows: (iid, value, vf, vt, sf, op)"""
    data = [
        {"_iid": iid, "value": v,
         "_valid_from": T(vf), "_valid_to": T(vt) if vt else None,
         "_system_from": T(sf), "op": op}
        for iid, v, vf, vt, sf, op in rows
    ]
    schema = ("_iid long, value string, _valid_from timestamp, "
              "_valid_to timestamp, _system_from timestamp, op string")
    return spark.createDataFrame(data, schema=schema)


def test_current_state_put_update_delete(spark):
    ev = events_df(spark, [
        (1, "v1", "2024-01-01", None, "2024-01-01", "put"),
        (1, "v2", "2024-01-02", None, "2024-01-02", "put"),
        (2, "x1", "2024-01-01", None, "2024-01-01", "put"),
        (2, None, "2024-01-03", None, "2024-01-03", "delete"),
        (3, "y1", "2024-01-01", None, "2024-01-01", "put"),
        (3, None, "2024-01-02", None, "2024-01-02", "erase"),
    ])
    cur = bitemporal.resolve_asof(ev).orderBy("_iid").collect()
    assert [(r["_iid"], r["value"]) for r in cur] == [(1, "v2")]


def test_asof_system_time_travel(spark):
    ev = events_df(spark, [
        (1, "v1", "2024-01-01", None, "2024-01-01", "put"),
        (1, "v2", "2024-01-05", None, "2024-01-05", "put"),
    ])
    old = bitemporal.resolve_asof(ev, system_time="2024-01-03").collect()
    assert [(r["_iid"], r["value"]) for r in old] == [(1, "v1")]


def test_asof_valid_time(spark):
    # explicit valid ranges: v1 valid Jan, v2 valid Feb
    ev = events_df(spark, [
        (1, "jan", "2024-01-01", "2024-02-01", "2024-01-01", "put"),
        (1, "feb", "2024-02-01", "2024-03-01", "2024-01-01", "put"),
    ])
    jan = bitemporal.resolve_asof(ev, valid_time="2024-01-15").collect()
    feb = bitemporal.resolve_asof(ev, valid_time="2024-02-15").collect()
    mar = bitemporal.resolve_asof(ev, valid_time="2024-03-15").collect()
    assert [r["value"] for r in jan] == ["jan"]
    assert [r["value"] for r in feb] == ["feb"]
    assert mar == []


def test_later_event_supersedes_overlap(spark):
    # v2 (later system time) covers a sub-range of v1's valid time
    ev = events_df(spark, [
        (1, "v1", "2024-01-01", "2024-04-01", "2024-01-01", "put"),
        (1, "v2", "2024-02-01", "2024-03-01", "2024-01-10", "put"),
    ])
    assert bitemporal.resolve_asof(ev, valid_time="2024-01-15").collect()[0]["value"] == "v1"
    assert bitemporal.resolve_asof(ev, valid_time="2024-02-15").collect()[0]["value"] == "v2"
    assert bitemporal.resolve_asof(ev, valid_time="2024-03-15").collect()[0]["value"] == "v1"
    # before v2 was recorded, v1 ruled everywhere
    assert bitemporal.resolve_asof(ev, valid_time="2024-02-15",
                                   system_time="2024-01-05").collect()[0]["value"] == "v1"


def test_polygon_rectangles_staircase(spark):
    ev = events_df(spark, [
        (1, "v1", "2024-01-01", "2024-04-01", "2024-01-01", "put"),
        (1, "v2", "2024-02-01", "2024-03-01", "2024-01-10", "put"),
    ])
    hist = bitemporal.polygon_history(ev, ["value"])
    rows = {(r["value"], str(r["_valid_from"]), str(r["_valid_to"]),
             str(r["_system_to"])) for r in hist.collect()}
    # v2: one open rectangle
    assert ("v2", "2024-02-01 00:00:00", "2024-03-01 00:00:00", "None") in rows
    # v1: clipped into [Jan,Feb) open, [Feb,Mar) closed at sys=Jan10, [Mar,Apr) open
    assert ("v1", "2024-01-01 00:00:00", "2024-02-01 00:00:00", "None") in rows
    assert ("v1", "2024-02-01 00:00:00", "2024-03-01 00:00:00",
            "2024-01-10 00:00:00") in rows
    assert ("v1", "2024-03-01 00:00:00", "2024-04-01 00:00:00", "None") in rows
    assert len(rows) == 4


def test_polygon_delete_clips(spark):
    ev = events_df(spark, [
        (1, "v1", "2024-01-01", None, "2024-01-01", "put"),
        (1, None, "2024-02-01", None, "2024-02-01", "delete"),
    ])
    hist = bitemporal.polygon_history(ev, ["value"])
    rows = {(str(r["_valid_from"]), str(r["_valid_to"]), str(r["_system_to"]))
            for r in hist.collect()}
    # v1 alive for [Jan,Feb) forever; [Feb,∞) only until the delete landed
    assert ("2024-01-01 00:00:00", "2024-02-01 00:00:00", "None") in rows
    assert ("2024-02-01 00:00:00", "None", "2024-02-01 00:00:00") in rows
    assert len(rows) == 2


def test_store_roundtrip(store):
    store.put("users", [{"_id": 1, "name": "alice"}, {"_id": 2, "name": "bob"}],
              system_from="2024-01-01")
    store.put("users", [{"_id": 1, "name": "alicia"}], system_from="2024-01-02")
    store.delete("users", [2], system_from="2024-01-03")
    cur = store.scan("users").orderBy("_id").collect()
    assert [(r["_id"], r["name"]) for r in cur] == [(1, "alicia")]
    old = store.scan("users", system_time="2024-01-01 12:00:00").orderBy("_id").collect()
    assert [(r["_id"], r["name"]) for r in old] == [(1, "alice"), (2, "bob")]


def test_store_erase_and_patch(store):
    store.put("docs", [{"_id": 1, "a": 1, "b": 2}, {"_id": 2, "a": 10, "b": 20}],
              system_from="2024-01-01")
    store.patch("docs", [{"_id": 1, "b": 99}], system_from="2024-01-02")
    cur = {r["_id"]: (r["a"], r["b"]) for r in store.scan("docs").collect()}
    assert cur == {1: (1, 99), 2: (10, 20)}
    store.erase("docs", [1], system_from="2024-01-03")
    # erase removes the id from ALL system time
    assert [r["_id"] for r in store.scan("docs").collect()] == [2]
    assert [r["_id"] for r in
            store.scan("docs", system_time="2024-01-01 12:00:00").collect()] == [2]


def test_forbidden_schemas(store):
    import pytest

    for schema in ("xt", "information_schema", "pg_catalog"):
        with pytest.raises(ValueError):
            store.put(f"{schema}.t", [{"_id": 1}])


def test_polygon_hot_iid_skew_bound(spark):
    """Skew bound for the applyInPandas polygon sweep (the engine's
    only per-key serial state): ONE hot `_iid` carrying 100k versions
    among 200k events must complete without OOM — the hot group is a
    single arrow-batched pandas frame of 100k rows (~10 MB), and the
    full-cover update chain keeps the ceiling at O(1) segments so the
    sweep is linear in versions. Documents the bound asserted in
    bitemporal.polygon_history's docstring."""
    from pyspark.sql import functions as F

    from xtdb_spark.bitemporal import polygon_history

    hot_n, bg_n = 100_000, 100_000
    base = F.lit("2024-01-01 00:00:00").cast("timestamp")
    hot = (spark.range(hot_n)
           .select(F.lit(b"\x01" * 16).alias("_iid"),
                   F.col("id").alias("v"),
                   base.alias("_valid_from"),
                   F.lit(None).cast("timestamp").alias("_valid_to"),
                   (base + F.make_interval(secs=F.col("id"))
                    ).alias("_system_from"),
                   F.lit("put").alias("op")))
    # background: 100k events over 10k entities (10 versions each) —
    # group COUNT is a Python-call cost, group SIZE is the skew bound
    bg = (spark.range(bg_n)
          .select(F.unhex(F.md5((F.col("id") % 10_000).cast("string")))
                  .alias("_iid"),
                  F.col("id").alias("v"),
                  base.alias("_valid_from"),
                  F.lit(None).cast("timestamp").alias("_valid_to"),
                  (base + F.make_interval(secs=F.col("id"))
                   ).alias("_system_from"),
                  F.lit("put").alias("op")))
    events = hot.unionAll(bg)
    out = polygon_history(events, ["v"])
    counts = {r["k"]: r["n"] for r in
              out.groupBy((F.col("_iid") == F.lit(b"\x01" * 16))
                          .alias("k"))
              .agg(F.count("*").alias("n")).collect()}
    # hot chain: every version was current for one system slice
    assert counts[True] == hot_n
    # full-cover background chains: one rectangle per version
    assert counts[False] == bg_n
    # the latest hot version is open-ended on both axes
    latest = out.filter((F.col("_iid") == F.lit(b"\x01" * 16))
                        & F.col("_system_to").isNull()).collect()
    assert len(latest) == 1 and latest[0]["v"] == hot_n - 1


def test_polygon_staggered_rectangles_formula(spark):
    """Staggered-valid chains grow the ceiling: k versions with
    strictly increasing valid_from produce 2k-1 rectangles (each
    superseded version keeps a residual valid slice). Guards the
    O(V x S) sweep against silent quadratic blowup on the rectangle
    COUNT side."""
    from pyspark.sql import functions as F

    from xtdb_spark.bitemporal import polygon_history

    k = 500
    base = F.lit("2024-01-01 00:00:00").cast("timestamp")
    ev = (spark.range(k)
          .select(F.lit(b"\x02" * 16).alias("_iid"),
                  F.col("id").alias("v"),
                  (base + F.make_interval(secs=F.col("id"))
                   ).alias("_valid_from"),
                  F.lit(None).cast("timestamp").alias("_valid_to"),
                  (base + F.make_interval(secs=F.col("id"))
                   ).alias("_system_from"),
                  F.lit("put").alias("op")))
    assert polygon_history(ev, ["v"]).count() == 2 * k - 1


# --- round 7: streaming polygon sweep (bounded memory for hot iids) ---------

def _rect_set(df):
    return {tuple(str(r[c]) for c in
                  ("_iid", "value", "_valid_from", "_valid_to",
                   "_system_from", "_system_to"))
            for r in df.collect()}


def test_polygon_streamed_matches_grouped_staggered(spark):
    """Property: the streaming sweep emits EXACTLY the grouped
    sweep's rectangles on randomized staggered histories (the
    ceiling-growth worst case), across multiple entities and batch
    boundaries."""
    import random

    from xtdb_spark.bitemporal import (polygon_history,
                                       polygon_history_streamed)

    rng = random.Random(42)
    rows = []
    day = 24 * 3600
    for ent in range(7):
        t0 = 0
        for k in range(rng.randint(3, 40)):
            vf = rng.randint(0, 50)
            vlen = rng.randint(1, 40)
            t0 += rng.randint(1, 5)
            rows.append((ent, f"e{ent}v{k}",
                         f"2024-01-{vf % 27 + 1:02d}",
                         None if rng.random() < 0.3
                         else f"2024-03-{(vf + vlen) % 27 + 1:02d}",
                         f"2024-01-01 00:{t0 // 60:02d}:{t0 % 60:02d}",
                         "put" if rng.random() < 0.9 else "delete"))
    ev = events_df(spark, rows)
    grouped = _rect_set(polygon_history(ev, ["value"]))
    # batch_rows=16 forces MANY batch boundaries inside every entity
    streamed = _rect_set(polygon_history_streamed(ev, ["value"],
                                                  batch_rows=16))
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                   "10000")
    assert streamed == grouped and len(grouped) > 20


def test_polygon_single_version_fast_path_matches_sweep(spark):
    """Differential for the round-9 single-version fast path: a mix
    of append-once entities (plain put, put with a closed valid
    range, put with an EMPTY valid range, a lone delete) and
    multi-version entities must produce exactly the rectangles the
    independent STREAMED sweep does (which has no fast path)."""
    from xtdb_spark.bitemporal import (polygon_history,
                                       polygon_history_streamed)

    rows = [
        # single-version puts — the fast-path population
        (1, "a", "2024-01-01", None, "2024-01-01 00:00:01", "put"),
        (2, "b", "2024-01-05", "2024-02-01", "2024-01-05 00:00:01", "put"),
        # empty valid range: must emit NO rectangle
        (3, "c", "2024-01-10", "2024-01-10", "2024-01-10 00:00:01", "put"),
        # lone delete: no rectangle
        (4, "d", "2024-01-02", None, "2024-01-02 00:00:01", "delete"),
        # multi-version entity — stays on the sweep
        (5, "e1", "2024-01-01", None, "2024-01-01 00:00:01", "put"),
        (5, "e2", "2024-01-15", None, "2024-02-01 00:00:01", "put"),
        (5, "e3", "2024-01-10", "2024-01-20", "2024-03-01 00:00:01", "put"),
    ]
    ev = events_df(spark, rows)
    grouped = _rect_set(polygon_history(ev, ["value"]))
    streamed = _rect_set(polygon_history_streamed(ev, ["value"],
                                                  batch_rows=4))
    assert grouped == streamed
    vals = {r[1] for r in grouped}           # (_iid, value, ...)
    assert "a" in vals and "b" in vals       # singles present
    assert "c" not in vals and "d" not in vals
    # the single-version row is exactly one open-system-end rectangle
    a_rects = [r for r in grouped if r[1] == "a"]
    assert len(a_rects) == 1 and a_rects[0][5] == "None"


def test_polygon_streamed_million_version_iid_bounded(spark):
    """The hot-iid scale gate: ONE entity with 10⁶ versions sweeps
    through the streaming path in bounded arrow batches — working
    set O(batch), not O(V). (The grouped path materializes all 10⁶
    rows as one pandas frame; this path never does.)"""
    from pyspark.sql import functions as F

    from xtdb_spark.bitemporal import polygon_history_streamed

    n = 1_000_000
    base = F.lit("2024-01-01 00:00:00").cast("timestamp")
    hot = (spark.range(n)
           .select(F.lit(b"\x07" * 16).alias("_iid"),
                   F.col("id").alias("v"),
                   base.alias("_valid_from"),
                   F.lit(None).cast("timestamp").alias("_valid_to"),
                   (base + F.make_interval(secs=F.col("id"))
                    ).alias("_system_from"),
                   F.lit("put").alias("op")))
    out = polygon_history_streamed(hot, ["v"], batch_rows=16384)
    agg = out.agg(F.count("*").alias("n"),
                  F.sum(F.when(F.col("_system_to").isNull(), 1)
                        .otherwise(0)).alias("open")).collect()[0]
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                   "10000")
    # every version was current for one system slice; one open rect
    assert agg["n"] == n and agg["open"] == 1


def test_polygon_state_table_fast_path_matches_sweep(spark):
    """Differential for the round-10 STATE-TABLE fast path: iids
    whose put versions carry closed non-overlapping valid ranges
    keyed by _valid_from (SCD shape) take the pure-window chain
    projection, and monotone open update chains take the lead()
    two-rect path; retroactive overlaps, groups with mixed
    _valid_to, and iids with deletes must stay on the sweep. The
    independent streamed sweep (no fast paths) is the oracle."""
    from xtdb_spark.bitemporal import (polygon_history,
                                       polygon_history_streamed)

    rows = [
        # SCD chain: two closed day ranges, second range updated once
        (10, "r1", "2024-01-01", "2024-01-02", "2024-01-01 00:00:01", "put"),
        (10, "r2", "2024-01-02", "2024-01-03", "2024-01-02 00:00:01", "put"),
        (10, "r2b", "2024-01-02", "2024-01-03", "2024-01-02 12:00:01", "put"),
        # SCD chain whose LAST range is open-ended (allowed)
        (11, "s1", "2024-01-01", "2024-02-01", "2024-01-01 00:00:01", "put"),
        (11, "s2", "2024-02-01", None, "2024-02-01 00:00:01", "put"),
        # open-ended monotone UPDATE chain — lead() two-rect path
        (12, "u1", "2024-01-01", None, "2024-01-01 00:00:01", "put"),
        (12, "u2", "2024-01-15", None, "2024-01-15 00:00:01", "put"),
        (12, "u3", "2024-02-01", None, "2024-02-01 00:00:01", "put"),
        # same _valid_from group with DIFFERENT _valid_to — sweep
        (13, "m1", "2024-01-01", "2024-01-05", "2024-01-01 00:00:01", "put"),
        (13, "m2", "2024-01-01", "2024-01-09", "2024-01-02 00:00:01", "put"),
        # SCD-shaped but with a delete — sweep
        (14, "d1", "2024-01-01", "2024-01-02", "2024-01-01 00:00:01", "put"),
        (14, "d2", "2024-01-02", "2024-01-03", "2024-01-02 00:00:01", "put"),
        (14, None, "2024-01-02", "2024-01-03", "2024-01-03 00:00:01", "delete"),
        # retroactive overlap: second version starts BEFORE the first
        (15, "x1", "2024-02-01", "2024-03-01", "2024-01-01 00:00:01", "put"),
        (15, "x2", "2024-01-15", "2024-02-15", "2024-02-01 00:00:01", "put"),
    ]
    ev = events_df(spark, rows)
    grouped = _rect_set(polygon_history(ev, ["value"]))
    streamed = _rect_set(polygon_history_streamed(ev, ["value"],
                                                  batch_rows=4))
    assert grouped == streamed
    # the SCD chain produced the expected chain rectangles: r2 closed
    # at r2b's system time, r2b open
    r2 = [r for r in grouped if r[1] == "r2"]
    r2b = [r for r in grouped if r[1] == "r2b"]
    assert len(r2) == 1 and "12:00:01" in r2[0][5]
    assert len(r2b) == 1 and r2b[0][5] == "None"
