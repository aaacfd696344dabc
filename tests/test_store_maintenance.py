"""Compaction + skew-join tests."""

from pyspark.sql import functions as F

from xtdb_spark.operators.skew import salted_join


def test_optimize_preserves_results(store):
    for day in range(1, 6):
        store.put("m", [{"_id": i, "v": day * 100 + i} for i in range(20)],
                  system_from=f"2024-01-0{day}")
    before = sorted((r["_id"], r["v"]) for r in store.scan("m").collect())
    n_files = store.optimize("m", n_files=2)
    assert n_files == 2
    after = sorted((r["_id"], r["v"]) for r in store.scan("m").collect())
    assert before == after
    # history preserved too
    old = sorted((r["_id"], r["v"]) for r in
                 store.scan("m", system_time="2024-01-02 12:00:00").collect())
    assert all(v < 300 for _, v in old) and len(old) == 20


def test_salted_join_matches_plain_join(spark):
    facts = spark.createDataFrame(
        [(i % 3, f"row{i}") for i in range(100)], "k long, payload string")
    dim = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")],
                                "k long, name string")
    plain = sorted((r["k"], r["payload"], r["name"]) for r in
                   facts.join(dim, "k").collect())
    salted = sorted((r["k"], r["payload"], r["name"]) for r in
                    salted_join(facts, dim, "k", salt=4).collect())
    assert plain == salted
    assert len(salted) == 100


def test_reput_after_erase_is_visible(store):
    """Erase wipes only events written at-or-before it; a later put
    resurrects the entity (reference PolygonCalculator.kt iterates
    newest-system-first — an erase only skips the REMAINING, older,
    events)."""
    store.put("r", [{"_id": 1, "v": 10}], system_from="2024-01-01")
    store.erase("r", [1], system_from="2024-01-02")
    assert store.scan("r").count() == 0
    store.put("r", [{"_id": 1, "v": 20}], system_from="2024-01-03")
    rows = store.scan("r").collect()
    assert [(r["_id"], r["v"]) for r in rows] == [(1, 20)]
    # the pre-erase version stays gone, even FOR ALL SYSTEM_TIME
    hist = store.scan("r", all_valid_time=True, all_system_time=True).collect()
    assert {r["v"] for r in hist} == {20}


def test_optimize_physically_erases(store, tmp_path):
    """After erase + optimize, the erased bytes are GONE from the
    parquet files (read raw, not via scan) — reference
    erase-at-compaction (PolygonCalculator.kt:23-24 + compactor.clj)."""
    store.put("g", [{"_id": 1, "secret": "CLASSIFIED"},
                    {"_id": 2, "secret": "public"}],
              system_from="2024-01-01")
    store.erase("g", [1], system_from="2024-01-02")
    # before optimize: hidden at read time but still on disk
    # (mergeSchema: the erase-marker file has no `secret` column, and
    # a plain read may pick its footer for the schema)
    raw = store.spark.read.option("mergeSchema", "true") \
        .parquet(store._path("g"))
    assert raw.filter(F.col("secret") == "CLASSIFIED").count() == 1
    store.optimize("g", n_files=1)
    raw = store.spark.read.option("mergeSchema", "true") \
        .parquet(store._path("g"))
    assert raw.filter(F.col("secret") == "CLASSIFIED").count() == 0
    # the erase markers are applied and dropped too
    assert raw.filter(F.col("op") == "erase").count() == 0
    # surviving data intact, history preserved
    assert [r["secret"] for r in store.scan("g").collect()] == ["public"]


def test_iid_is_type_tagged(store):
    """{_id: 1} and {_id: "1"} must hash to DIFFERENT iids — the
    reference hashes the typed value (scan.clj:127-140)."""
    ev_int = store._events_df([{"_id": 1}], "put", None, None, "2024-01-01")
    ev_str = store._events_df([{"_id": "1"}], "put", None, None, "2024-01-01")
    iid_int = ev_int.select("_iid").collect()[0][0]
    iid_str = ev_str.select("_iid").collect()[0][0]
    assert iid_int != iid_str
    assert len(iid_int) == 16


def test_snapshot_isolation_mid_query_put(store):
    """A scan DataFrame is pinned to the files present when it was
    built: a put issued between two actions over the same scan does
    not change its results (reference basis.clj snapshot tokens)."""
    store.put("si", [{"_id": i, "v": 1} for i in range(5)],
              system_from="2024-01-01")
    df = store.scan("si")
    assert df.count() == 5
    store.put("si", [{"_id": 99, "v": 2}], system_from="2024-02-01")
    # same DataFrame, second action: still the old snapshot
    assert df.count() == 5
    assert sorted(r["_id"] for r in df.collect()) == [0, 1, 2, 3, 4]
    # a NEW scan sees the put
    assert store.scan("si").count() == 6


def test_copy_to_roundtrip(store, tmp_path):
    """copy_to exports the resolved current state (not raw events);
    copy_from reloads it as documents."""
    store.put("ex", [{"_id": i, "v": i * 2} for i in range(10)],
              system_from="2024-01-01")
    store.delete("ex", [9], system_from="2024-01-02")
    out = str(tmp_path / "export")
    store.copy_to("ex", out)
    store.copy_from("ex2", out)
    a = sorted((r["_id"], r["v"]) for r in store.scan("ex").collect())
    b = sorted((r["_id"], r["v"]) for r in store.scan("ex2").collect())
    assert a == b and len(a) == 9
