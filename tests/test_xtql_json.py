"""Serialized-XTQL (JSON pipeline) tests — reference xtql.clj
parse/plan analogues over the bitemporal store."""

import pytest

from xtdb_spark.xtql_json import run


@pytest.fixture()
def xt(spark, tmp_path):
    from xtdb_spark.session import XtdbSession
    from xtdb_spark.tx import TableStore

    s = XtdbSession.__new__(XtdbSession)
    s.spark = spark
    s.store = TableStore(spark, str(tmp_path / "wh"))
    s.scan = XtdbSession.scan.__get__(s)
    return s


@pytest.fixture()
def seeded(xt):
    xt.store.put("orders", [
        {"_id": 1, "cust": 1, "price": 50.0},
        {"_id": 2, "cust": 1, "price": 150.0},
        {"_id": 3, "cust": 2, "price": 250.0},
        {"_id": 4, "cust": 2, "price": 350.0},
    ], system_from="2024-01-01")
    xt.store.put("custs", [
        {"_id": 1, "name": "ada"},
        {"_id": 2, "name": "bob"},
    ], system_from="2024-01-01")
    return xt


def test_pipeline_filter_aggregate_order(seeded):
    out = run(seeded, """
      ["pipeline",
        ["from", "orders", ["cust", "price"]],
        ["where", [">", "price", 100.0]],
        ["aggregate", ["cust"], {"n": ["count"], "total": ["sum", "price"]}],
        ["order-by", ["total", "desc"]],
        ["limit", 1]]
    """).collect()
    assert [(r["cust"], r["n"], r["total"]) for r in out] == [(2, 2, 600.0)]


def test_unify_joins_on_logic_vars(seeded):
    # orders binds cust → c, custs binds _id → c: natural join on c
    out = run(seeded, """
      ["pipeline",
        ["unify",
          ["from", "orders", [{"cust": "c"}, "price"]],
          ["from", "custs", [{"_id": "c"}, "name"]]],
        ["where", [">=", "price", 250.0]],
        ["return", "name", "price"],
        ["order-by", "price"]]
    """).collect()
    assert [(r["name"], r["price"]) for r in out] == [
        ("bob", 250.0), ("bob", 350.0)]


def test_with_return_exprs_and_literals(seeded):
    out = run(seeded, """
      ["pipeline",
        ["from", "orders", ["price"]],
        ["with", {"bucket": ["if", ["<", "price", 200.0],
                             {"lit": "small"}, {"lit": "large"}]}],
        ["aggregate", ["bucket"], {"n": ["count"]}],
        ["order-by", "bucket"]]
    """).collect()
    assert [(r["bucket"], r["n"]) for r in out] == [("large", 2), ("small", 2)]


def test_from_temporal_opts(xt):
    xt.store.put("v", [{"_id": 1, "x": 1}], system_from="2024-01-01")
    xt.store.put("v", [{"_id": 1, "x": 2}], system_from="2024-02-01")
    out = run(xt, """
      ["pipeline",
        ["from", "v", ["x"],
          {"for-system-time": ["at", "2024-01-15"]}]]
    """).collect()
    assert [r["x"] for r in out] == [1]
    hist = run(xt, '[ "from", "v", ["x"], {"for-system-time": "all-time"} ]')
    assert sorted(r["x"] for r in hist.collect()) == [1, 2]


def test_rel_literal_and_union_all(xt):
    out = run(xt, """
      ["pipeline",
        ["rel", [{"a": 1}, {"a": 2}]],
        ["union-all", ["rel", [{"a": 3}]]],
        ["order-by", "a"]]
    """).collect()
    assert [r["a"] for r in out] == [1, 2, 3]


def test_malformed_queries_raise(xt):
    for bad in ('["pipeline"]', '{"from": "t"}', '["frobnicate", "t"]',
                '["pipeline", ["from", "t"], ["mystery-op"]]'):
        with pytest.raises(ValueError):
            run(xt, bad)


def test_join_and_left_join_tails(seeded):
    out = run(seeded, """
      ["pipeline",
        ["from", "orders", [{"cust": "c"}, "price"]],
        ["join", ["from", "custs", [{"_id": "c"}, "name"]]],
        ["where", [">", "price", 200.0]],
        ["return", "name", "price"],
        ["order-by", "price"]]
    """).collect()
    assert [(r["name"], r["price"]) for r in out] == [
        ("bob", 250.0), ("bob", 350.0)]
    # left join keeps unmatched left rows
    out = run(seeded, """
      ["pipeline",
        ["from", "orders", [{"cust": "c"}, "price"]],
        ["left-join", ["rel", [{"c": 1, "vip": true}]]],
        ["aggregate", ["vip"], {"n": ["count"]}],
        ["order-by", "vip"]]
    """).collect()
    assert [(r["vip"], r["n"]) for r in out] == [(None, 2), (True, 2)]
