"""Serialized-XTQL (edn form) tests — the reference's primary wire
form (xtql.clj edn reader): `(-> (from :t [...]) (where ...))`
threading pipelines, symbols as logic vars, `:xt/id` system columns,
`#inst` temporal literals. The edn reader itself is also unit-tested
(it is fresh code, not a library)."""

import pytest

from xtdb_spark.xtql_edn import Keyword, Symbol, read_edn, run, to_json_form


# ---------------------------------------------------------- reader

def test_reader_atoms_and_collections():
    form = read_edn('(-> [1 2.5 nil true "s"] {:k v, :n 3} #{:a} ; c\n x)')
    assert isinstance(form, tuple) and str(form[0]) == "->"
    assert form[1] == [1, 2.5, None, True, "s"]
    assert form[2] == {Keyword("k"): Symbol("v"), Keyword("n"): 3}
    assert form[3] == [Keyword("a")]
    assert form[4] == Symbol("x")


def test_reader_tagged_discard_and_errors():
    assert read_edn('#inst "2024-01-01T00:00:00Z"') == "2024-01-01T00:00:00Z"
    assert read_edn("[1 #_2 3]") == [1, 3]
    for bad in ("(", "[1", '"abc', "{:a}", "#wat 1", "1 2"):
        with pytest.raises(ValueError):
            read_edn(bad)


def test_xt_namespace_maps_to_system_columns():
    form = to_json_form("(from :docs [xt/id {:xt/valid-from vf} name])")
    assert form == ["from", "docs", ["_id", {"_valid_from": "vf"}, "name"]]


# -------------------------------------------------------- execution

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
      (-> (from :orders [cust price])
          (where (> price 100.0))
          (aggregate cust {:n (row-count)} {:total (sum price)})
          (order-by {:val total, :dir :desc})
          (limit 1))
    """).collect()
    assert [(r["cust"], r["n"], r["total"]) for r in out] == [(2, 2, 600.0)]


def test_unify_and_string_literals_vs_vars(seeded):
    out = run(seeded, """
      (-> (unify (from :orders [{:cust c} price])
                 (from :custs [{:xt/id c} name]))
          (where (= name "bob") (>= price 250.0))
          (return name price)
          (order-by price))
    """).collect()
    assert [(r["name"], r["price"]) for r in out] == [
        ("bob", 250.0), ("bob", 350.0)]


def test_from_temporal_opts_inst(xt):
    xt.store.put("v", [{"_id": 1, "x": 1}], system_from="2024-01-01")
    xt.store.put("v", [{"_id": 1, "x": 2}], system_from="2024-02-01")
    out = run(xt, """
      (from :v {:bind [x]
                :for-system-time (at #inst "2024-01-15")})
    """).collect()
    assert [r["x"] for r in out] == [1]
    hist = run(xt, "(from :v {:bind [x] :for-system-time :all-time})")
    assert sorted(r["x"] for r in hist.collect()) == [1, 2]


def test_rel_union_all_join_tail(seeded):
    out = run(seeded, """
      (-> (rel [{:a 1} {:a 2}])
          (union-all (rel [{:a 3}]))
          (order-by a))
    """).collect()
    assert [r["a"] for r in out] == [1, 2, 3]
    out = run(seeded, """
      (-> (from :orders [{:cust c} price])
          (left-join (rel [{:c 1 :vip true}]))
          (aggregate vip {:n (row-count)})
          (order-by vip))
    """).collect()
    assert [(r["vip"], r["n"]) for r in out] == [(None, 2), (True, 2)]


def test_malformed_edn_queries_raise(xt):
    for bad in ("(->)", "[1 2]", "(frobnicate :t)",
                "(-> (from :t [x]) (mystery-op))"):
        with pytest.raises(ValueError):
            run(xt, bad)
