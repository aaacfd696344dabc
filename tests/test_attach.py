"""ATTACH/DETACH DATABASE (reference Sql.g4:55-56, db_catalog.clj):
multi-warehouse catalog with `db.schema.table` addressing."""

import pytest

from xtdb_spark.session import XtdbSession
from xtdb_spark.tx import TableStore


def make_xt(spark, path):
    xt = XtdbSession.__new__(XtdbSession)
    xt.spark = spark
    xt.store = TableStore(spark, str(path))
    xt.sql = XtdbSession.sql.__get__(xt)
    xt.scan = XtdbSession.scan.__get__(xt)
    return xt


def test_attach_insert_query_detach(spark, tmp_path):
    xt = make_xt(spark, tmp_path / "primary")
    other = str(tmp_path / "other_wh")
    xt.sql(f"ATTACH DATABASE archive WITH 'storage:\n  path: {other}'")
    assert xt.store.databases["archive"] == other

    # writes route to the attached warehouse
    xt.sql("INSERT INTO archive.old_orders (_id, total) VALUES (1, 10.0)")
    xt.sql("INSERT INTO archive.old_orders (_id, total) VALUES (2, 20.0)")
    import os
    assert os.path.isdir(os.path.join(other, "old_orders"))

    # primary table + cross-database join
    xt.sql("INSERT INTO orders (_id, total) VALUES (3, 30.0)")
    rows = xt.sql("""
        SELECT a._id AS aid, o._id AS oid
        FROM archive.old_orders a JOIN orders o ON a.total * 3 = o.total
    """).collect()
    assert [(r["aid"], r["oid"]) for r in rows] == [(1, 3)]

    # three-part db.schema.table addressing
    xt.sql("INSERT INTO archive.hr.people (_id, name) VALUES (1, 'ada')")
    assert os.path.isdir(os.path.join(other, "hr__people"))
    got = xt.sql("SELECT name FROM archive.hr.people").collect()
    assert got[0]["name"] == "ada"

    # detach: catalog entry gone, files remain
    xt.sql("DETACH DATABASE archive")
    assert "archive" not in xt.store.databases
    assert os.path.isdir(os.path.join(other, "old_orders"))
    with pytest.raises(Exception):
        xt.sql("DETACH DATABASE archive")


def test_attach_persists_across_sessions(spark, tmp_path):
    xt = make_xt(spark, tmp_path / "p2")
    xt.sql(f"ATTACH DATABASE dw WITH '{tmp_path / 'dw_wh'}'")
    xt.sql("INSERT INTO dw.facts (_id, n) VALUES (1, 7)")
    # a NEW store over the same primary warehouse sees the catalog
    xt2 = make_xt(spark, tmp_path / "p2")
    assert xt2.store.databases["dw"] == str(tmp_path / "dw_wh")
    assert xt2.sql("SELECT n FROM dw.facts").collect()[0]["n"] == 7


def test_attach_default_path_and_validation(spark, tmp_path):
    xt = make_xt(spark, tmp_path / "p3")
    path = xt.store.attach_database("scratch")
    assert path.startswith(str(tmp_path / "p3"))
    xt.sql("INSERT INTO scratch.t (_id) VALUES (1)")
    assert xt.sql("SELECT _id FROM scratch.t").collect()[0]["_id"] == 1
    # the managed _dbs dir must not surface as a table
    assert all(not t.startswith("_") for t in xt.store.tables())
    with pytest.raises(ValueError, match="reserved"):
        xt.store.attach_database("pg_catalog")
    with pytest.raises(ValueError, match="invalid"):
        xt.store.attach_database("no dots")
