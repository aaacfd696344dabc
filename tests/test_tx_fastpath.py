"""Driver-side pyarrow append fast path (tx._append_local_fast):
byte-compatible with the Spark write path, ~5 ms instead of the
~300 ms Spark per-job floor — the reference's in-process append
latency class (LiveIndex.kt)."""

from datetime import date, datetime

import pytest


def spark_path_put(store, table, rows, **kw):
    """Force the Spark write path for equivalence comparison."""
    st = kw.pop("system_from", None) or store._next_system_time()
    store._append(table, store._events_df(rows, "put",
                                          kw.get("valid_from"),
                                          kw.get("valid_to"), st), st)
    store._record_tx(st)
    return st


def test_fastpath_equivalence_and_schema_merge(store):
    rows = [{"_id": 1, "name": "ada", "score": 10, "f": 1.5,
             "ok": True, "d": date(2024, 1, 15),
             "ts": datetime(2024, 1, 15, 10, 30, 0, 123456),
             "b": b"\x01\x02"},
            {"_id": 2, "name": "bob", "score": None, "f": 2.0,
             "ok": False, "d": None, "ts": None, "b": None}]
    # fast path accepts mixed int/float in one column (widens); the
    # Spark inference path cannot — keep comparison rows uniform
    store.put("fp", [dict(rows[0], f=1.5), rows[1]])  # fast path
    spark_path_put(store, "fp", [dict(r, _id=r["_id"] + 10)
                                 for r in rows])  # Spark path, same shape
    got = {r["_id"]: r for r in store.scan("fp").collect()}
    assert len(got) == 4
    # identical values through both paths (incl. mixed-file merge)
    for base in (1, 11):
        r = got[base]
        assert (r["name"], r["score"], r["f"], r["ok"]) == \
            ("ada", 10, 1.5, True)
        assert r["d"] == date(2024, 1, 15)
        assert r["ts"] == datetime(2024, 1, 15, 10, 30, 0, 123456)
        assert bytes(r["b"]) == b"\x01\x02"
    # int/float widening matches (score int64, f float64 both files)
    ev = store.events("fp")
    assert dict(ev.dtypes)["score"] == "bigint"
    assert dict(ev.dtypes)["f"] == "double"
    # _iid identical across paths for the same id
    iid_fast = store.events("fp").filter("_id = 1") \
        .select("_iid").collect()[0][0]
    assert bytes(iid_fast) == store.iid_py(1)


def test_fastpath_temporal_and_ops(store):
    store.put("fpt", [{"_id": 1, "v": "a"}], system_from="2024-01-01")
    store.put("fpt", [{"_id": 1, "v": "b"}], system_from="2024-02-01")
    assert [r["v"] for r in store.scan("fpt").collect()] == ["b"]
    old = store.scan("fpt", system_time="2024-01-15").collect()
    assert [r["v"] for r in old] == ["a"]
    # valid-time args parse identically ('2024-…' strings)
    store.put("fpt", [{"_id": 2, "v": "future"}],
              valid_from="2030-01-01")
    assert {r["_id"] for r in store.scan("fpt").collect()} == {1}
    # delete + erase go through the fast path too
    store.delete("fpt", [1])
    assert store.scan("fpt").count() == 0
    store.erase("fpt", [1])
    assert store.events("fpt").filter("op = 'erase'").count() == 1


def test_fastpath_fallback_cases(store):
    # nested values → Spark path (still works)
    store.put("fb", [{"_id": 1, "tags": ["a", "b"],
                      "addr": {"city": "Oslo"}}])
    r = store.scan("fb").collect()[0]
    assert list(r["tags"]) == ["a", "b"] and r["addr"]["city"] == "Oslo"
    # huge int → Spark path raises its own overflow/inference error
    with pytest.raises(Exception):
        store.put("fb2", [{"_id": 1, "n": 1 << 70}])
    # missing _id raises the same error either path
    with pytest.raises(ValueError, match="_id"):
        store.put("fb3", [{"x": 1}])


def test_fastpath_latency(store):
    """The point of the fast path: a tiny tx must not pay the Spark
    per-job floor. Generous bound (50x headroom over the ~5 ms
    measured) so CI noise can't flake it, but the ~300 ms Spark
    floor always fails it."""
    import time

    store.put("fl", [{"_id": 0, "v": "warm"}])
    t0 = time.perf_counter()
    for i in range(1, 6):
        store.put("fl", [{"_id": i, "v": f"r{i}"}])
    per_tx = (time.perf_counter() - t0) / 5
    assert per_tx < 0.25, f"fast path regressed: {per_tx:.3f}s/tx"
    assert store.scan("fl").count() == 6


def test_fastpath_partial_missing_id_falls_back(store):
    """SOME rows missing _id → Spark path (NULL _iid rows), never a
    KeyError mid-commit (review regression)."""
    store.put("fm", [{"_id": 1, "x": 1}, {"x": 2}])
    ev = store.events("fm")
    assert ev.count() == 2
    assert ev.filter("_iid IS NULL").count() == 1
    # and inside submit_tx: earlier ops must not be left half-applied
    store.submit_tx([("put", "fm2", [{"_id": 1, "x": 1}]),
                     ("put", "fm3", [{"_id": 1}, {"y": 2}])])
    assert store.events("fm2").count() == 1
    assert store.events("fm3").count() == 2
