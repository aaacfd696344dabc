"""Warehouse export/import round trip (reference export.clj: block +
catalog snapshot export importable into a fresh node). The snapshot
must carry the tx ledger, bitemporal history, declared schemas, and
compaction manifests — and exclude the commit-protocol bookkeeping."""

import os

import pytest

from xtdb_spark.tx import TableStore


def test_export_import_roundtrip(spark, tmp_path):
    s1 = TableStore(spark, str(tmp_path / "wh1"))
    s1.put("docs", [{"_id": 1, "v": "a"}], system_from="2024-01-01")
    s1.put("docs", [{"_id": 1, "v": "b"}], system_from="2024-06-01")
    s1.put("other", [{"_id": 10, "x": 1.5}], system_from="2024-02-01")
    s1.delete("other", [10], system_from="2024-07-01")
    s1.optimize("docs", full=True)           # levels/manifest state
    s1.put("docs", [{"_id": 2, "v": "c"}], system_from="2024-08-01")

    snap = s1.export_warehouse(str(tmp_path / "snap"))
    s2 = TableStore.import_warehouse(spark, snap, str(tmp_path / "wh2"))

    # tx ledger identical
    t1 = sorted(r["_id"] for r in s1.txs().collect())
    t2 = sorted(r["_id"] for r in s2.txs().collect())
    assert t1 == t2 and len(t1) == 5

    # current state and as-of travel identical
    assert {(r["_id"], r["v"]) for r in s2.scan("docs").collect()} == \
        {(1, "b"), (2, "c")}
    asof = s2.scan("docs", system_time="2024-03-01").collect()
    assert [(r["_id"], r["v"]) for r in asof] == [(1, "a")]
    assert s2.scan("other").collect() == []
    pre = s2.scan("other", system_time="2024-05-01").collect()
    assert [(r["_id"], r["x"]) for r in pre] == [(10, 1.5)]

    # bookkeeping did not travel
    assert not os.path.exists(os.path.join(str(tmp_path / "wh2"),
                                           "_journal"))
    # original store unaffected and still writable
    s1.put("docs", [{"_id": 3, "v": "d"}])
    assert len(s1.scan("docs").collect()) == 3
    assert len(s2.scan("docs").collect()) == 2


def test_incremental_export_roundtrip(spark, tmp_path):
    """Delta snapshots (export_warehouse(base=...)): base + deltas
    imported in order must be FILE-IDENTICAL to a full export taken
    at the last delta's point in time — including files the deltas
    had to prune (compaction consumed them after the base) — and
    as-of queries must agree."""
    s1 = TableStore(spark, str(tmp_path / "wh1"))
    s1.put("docs", [{"_id": 1, "v": "a"}], system_from="2024-01-01")
    s1.put("docs", [{"_id": 2, "v": "b"}], system_from="2024-02-01")
    base = s1.export_warehouse(str(tmp_path / "base"))

    # changes after the base: new txs, an update, a FULL rewrite
    # (consumes every part-xt file the base still carries), a delete
    s1.put("docs", [{"_id": 1, "v": "a2"}], system_from="2024-06-01")
    s1.put("other", [{"_id": 10, "x": 1}], system_from="2024-06-15")
    s1.optimize("docs", full=True)
    d1 = s1.export_warehouse(str(tmp_path / "d1"), base=base)

    s1.delete("other", [10], system_from="2024-08-01")
    s1.put("docs", [{"_id": 3, "v": "c"}], system_from="2024-09-01")
    # chained delta: a previous DELTA is a valid base (its live list
    # is the full state at that point)
    d2 = s1.export_warehouse(str(tmp_path / "d2"), base=d1)

    full = s1.export_warehouse(str(tmp_path / "full"))
    s2 = TableStore.import_warehouse(spark, base,
                                     str(tmp_path / "wh2"),
                                     deltas=[d1, d2])
    s3 = TableStore.import_warehouse(spark, full, str(tmp_path / "wh3"))

    # file-identical data trees
    assert TableStore._snapshot_data_files(str(tmp_path / "wh2")) == \
        TableStore._snapshot_data_files(str(tmp_path / "wh3"))
    # ledgers identical
    assert [tuple(r) for r in s2.txs().collect()] == \
        [tuple(r) for r in s3.txs().collect()]
    # current + as-of agreement with the source of truth
    for st in (s2, s3):
        assert {(r["_id"], r["v"]) for r in st.scan("docs").collect()} \
            == {(1, "a2"), (2, "b"), (3, "c")}
        assert st.scan("other").collect() == []
        pre = st.scan("other", system_time="2024-07-01").collect()
        assert [(r["_id"], r["x"]) for r in pre] == [(10, 1)]
        asof = st.scan("docs", system_time="2024-03-01").collect()
        assert {(r["_id"], r["v"]) for r in asof} == \
            {(1, "a"), (2, "b")}

    # a delta is rejected as a standalone import base companion
    with pytest.raises(ValueError, match="incremental"):
        TableStore.import_warehouse(spark, base,
                                    str(tmp_path / "wh4"),
                                    deltas=[str(tmp_path / "full")])


def test_import_refuses_nonempty_target(spark, tmp_path):
    s1 = TableStore(spark, str(tmp_path / "wh1"))
    s1.put("t", [{"_id": 1}])
    snap = s1.export_warehouse(str(tmp_path / "snap"))
    tgt = tmp_path / "wh2"
    tgt.mkdir()
    (tgt / "junk.txt").write_text("x")
    with pytest.raises(ValueError, match="not empty"):
        TableStore.import_warehouse(spark, snap, str(tgt))


def test_export_excludes_quarantine_and_staging(spark, tmp_path):
    s1 = TableStore(spark, str(tmp_path / "wh1"))
    s1.put("t", [{"_id": 1, "v": 1}])
    # simulate leftovers
    q = tmp_path / "wh1" / "_quarantine" / "123"
    q.mkdir(parents=True)
    (q / "t__part-xt123-x.parquet").write_bytes(b"junk")
    stage = tmp_path / "wh1" / "t" / ".stage-999-abc"
    stage.write_bytes(b"partial")
    snap = s1.export_warehouse(str(tmp_path / "snap"))
    assert not os.path.exists(os.path.join(snap, "_quarantine"))
    assert not any(f.startswith(".stage")
                   for f in os.listdir(os.path.join(snap, "t")))
    s2 = TableStore.import_warehouse(spark, snap, str(tmp_path / "wh2"))
    assert [r["_id"] for r in s2.scan("t").collect()] == [1]
