"""Dynamic/union type tests — the mixed-type column case from
FIXTURES.md §3 / reference types.clj dense unions, plus the
james-bond-style nested/sparse document fixture."""

from pyspark.sql import functions as F

from xtdb_spark import dyntypes as dt


def test_mixed_column_roundtrip(spark):
    rows = [
        {"_id": 1, "v": 42},
        {"_id": 2, "v": "hello"},
        {"_id": 3, "v": True},
        {"_id": 4, "v": None},
        {"_id": 5, "v": 7},
    ]
    df = dt.encode_rows(spark, rows)
    assert df.schema["v"].dataType.typeName() == "struct"
    got = {r["_id"]: (r["leg"], r["s"]) for r in df.select(
        "_id", dt.leg(F.col("v")).alias("leg"),
        dt.as_string(F.col("v")).alias("s")).collect()}
    assert got[1] == ("i64", "42")
    assert got[2] == ("str", "hello")
    assert got[3] == ("bool", "true")
    assert got[4] == (None, None)

    ints = df.filter(dt.dyn_equals(F.col("v"), 42)).select("_id").collect()
    assert [r["_id"] for r in ints] == [1]
    typed = df.select("_id", dt.get_leg(F.col("v"), "i64").alias("i")).collect()
    assert {r["_id"]: r["i"] for r in typed} == {1: 42, 2: None, 3: None,
                                                4: None, 5: 7}


def test_numeric_lub_widens(spark):
    df = dt.encode_rows(spark, [{"_id": 1, "x": 1}, {"_id": 2, "x": 2.5}])
    assert dict(df.dtypes)["x"] == "double"
    assert sorted(r["x"] for r in df.collect()) == [1.0, 2.5]


def test_homogeneous_stays_native(spark):
    df = dt.encode_rows(spark, [{"_id": 1, "n": 5}, {"_id": 2, "n": 6}])
    assert dict(df.dtypes)["n"] == "bigint"


def test_cross_type_sort_total_order(spark):
    rows = [{"_id": i, "v": v} for i, v in
            enumerate([3, "apple", True, 1, "zoo"])]
    df = dt.encode_rows(spark, rows)
    ordered = [r["_id"] for r in
               df.orderBy(dt.dyn_compare_key(F.col("v"))).collect()]
    # bool < i64 < str by leg name; values ordered within leg
    assert ordered == [2, 3, 0, 1, 4]


def test_sparse_nested_documents(store):
    """james_bond.edn-style fixture: nested arrays, sparse columns,
    absent-column null semantics (reference src/test/clojure/xtdb/
    james_bond.clj)."""
    films = [
        {"_id": "dr-no", "film_name": "Dr. No", "film_year": 1962,
         "film_vehicles": ["sunbeam-alpine"], "film_bond": "sean-connery"},
        {"_id": "goldfinger", "film_name": "Goldfinger", "film_year": 1964,
         "film_vehicles": ["aston-martin-db5", "ford-mustang"],
         "film_bond": "sean-connery"},
        # sparse: no vehicles column value
        {"_id": "spectre", "film_name": "Spectre", "film_year": 2015,
         "film_vehicles": None, "film_bond": "daniel-craig"},
    ]
    store.put("films", films, system_from="2024-01-01")
    cur = store.scan("films")
    assert cur.count() == 3
    # unnest with absent-column null semantics
    exploded = (cur.select("_id", F.explode_outer("film_vehicles").alias("v"))
                .collect())
    got = {(r["_id"], r["v"]) for r in exploded}
    assert ("goldfinger", "aston-martin-db5") in got
    assert ("spectre", None) in got
    by_bond = (cur.groupBy("film_bond").agg(F.count("*").alias("n"))
               .collect())
    assert {r["film_bond"]: r["n"] for r in by_bond} == {
        "sean-connery": 2, "daniel-craig": 1}


def test_extension_legs_uuid_uri_keyword(spark):
    """Extension-tagged values (reference types.clj:284-294 :keyword
    :uri :uuid): stored as utf8 with the tag preserved in _leg."""
    import uuid

    u = uuid.UUID("12345678-1234-5678-1234-567812345678")
    rows = [
        {"_id": 1, "v": u},
        {"_id": 2, "v": dt.Uri("https://example.com/x")},
        {"_id": 3, "v": dt.Keyword("status/active")},
        {"_id": 4, "v": "plain string"},
    ]
    df = dt.encode_rows(spark, rows)
    got = {r["_id"]: (r["leg"], r["s"]) for r in df.select(
        "_id", dt.leg(F.col("v")).alias("leg"),
        dt.as_string(F.col("v")).alias("s")).collect()}
    assert got[1] == ("uuid", str(u))
    assert got[2] == ("uri", "https://example.com/x")
    assert got[3] == ("kw", "status/active")
    assert got[4] == ("str", "plain string")
    # typed access: uuid leg only yields on uuid rows
    typed = {r["_id"]: r["u"] for r in df.select(
        "_id", dt.get_leg(F.col("v"), "uuid").alias("u")).collect()}
    assert typed[1] == str(u) and typed[4] is None


def test_decimal_date_binary_legs(spark):
    import datetime
    from decimal import Decimal

    rows = [
        {"_id": 1, "v": Decimal("123.450000000000000000")},
        {"_id": 2, "v": datetime.date(2024, 3, 5)},
        {"_id": 3, "v": b"\x01\x02"},
        {"_id": 4, "v": 7},
    ]
    df = dt.encode_rows(spark, rows)
    legs = {r["_id"]: r["leg"] for r in
            df.select("_id", dt.leg(F.col("v")).alias("leg")).collect()}
    assert legs == {1: "dec", 2: "date", 3: "bin", 4: "i64"}
    dec = df.select(dt.get_leg(F.col("v"), "dec").alias("d")) \
        .filter(F.col("d").isNotNull()).collect()
    assert dec[0]["d"] == Decimal("123.450000000000000000")


def test_nested_list_and_struct_legs(spark):
    """One-level nested dynamic values: arr = array of scalar
    legs-structs (heterogeneous elements), obj = map of dynamic
    fields (reference [:list t] / [:struct ...] legs)."""
    rows = [
        {"_id": 1, "v": [1, "two", 3.0]},
        {"_id": 2, "v": {"a": 1, "b": "x"}},
        {"_id": 3, "v": 42},
    ]
    df = dt.encode_rows(spark, rows)
    legs = {r["_id"]: r["leg"] for r in
            df.select("_id", dt.leg(F.col("v")).alias("leg")).collect()}
    assert legs == {1: "arr", 2: "obj", 3: "i64"}
    # element access keeps per-element tags
    el = df.filter(dt.leg(F.col("v")) == "arr") \
        .select(F.col("v.arr").getItem(1).getField("_leg").alias("t"),
                F.col("v.arr").getItem(1).getField("str").alias("s")) \
        .collect()[0]
    assert (el["t"], el["s"]) == ("str", "two")
    ob = df.filter(dt.leg(F.col("v")) == "obj") \
        .select(F.col("v.obj").getItem("b").getField("str").alias("b")) \
        .collect()[0]
    assert ob["b"] == "x"
    # deeper nesting in a dynamic column is refused loudly
    import pytest

    with pytest.raises(TypeError):
        dt.encode_rows(spark, [{"_id": 1, "v": [[1]]},
                               {"_id": 2, "v": "s"}])


# ---- nested 3VL equality (reference expression.clj:1962-2010, 2256-2301) ----

def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_eq3vl_pairs_min_fold(spark):
    N = F.lit(None).cast("boolean")
    T, Fl = F.lit(True), F.lit(False)
    # FALSE dominates NULL regardless of position (AND-fold, not
    # first-non-TRUE): [NULL, FALSE] must be FALSE.
    assert _one(spark, dt.eq3vl_pairs([N, Fl])) is False
    assert _one(spark, dt.eq3vl_pairs([Fl, N])) is False
    assert _one(spark, dt.eq3vl_pairs([T, N])) is None
    assert _one(spark, dt.eq3vl_pairs([N, T])) is None
    assert _one(spark, dt.eq3vl_pairs([T, T])) is True
    assert _one(spark, dt.eq3vl_pairs([T, Fl])) is False


def test_struct_eq_3vl(spark):
    def s(x, y):
        return F.struct(F.lit(x).cast("int").alias("x"),
                        F.lit(y).cast("int").alias("y"))
    # {x: NULL, y: 2} = {x: 1, y: 3} → FALSE (y pair decides)
    assert _one(spark, dt.struct_eq(s(None, 2), s(1, 3), ["x", "y"])) is False
    # {x: NULL, y: 2} = {x: 1, y: 2} → NULL
    assert _one(spark, dt.struct_eq(s(None, 2), s(1, 2), ["x", "y"])) is None
    assert _one(spark, dt.struct_eq(s(1, 2), s(1, 2), ["x", "y"])) is True
    assert _one(spark, dt.struct_eq(s(1, 2), s(1, 3), ["x", "y"])) is False
    # NULL struct → NULL
    ns = F.lit(None).cast("struct<x:int,y:int>")
    assert _one(spark, dt.struct_eq(ns, s(1, 2), ["x", "y"])) is None
    # differing key sets → FALSE (expression.clj:1967-1968)
    assert _one(spark, dt.struct_eq(s(1, 2), s(1, 2), ["x", "y"],
                                    right_fields=["x", "z"])) is False


def test_array_eq_3vl(spark):
    def a(*xs):
        return F.array(*[F.lit(x).cast("int") for x in xs])
    # length mismatch → FALSE even with NULL elements present
    assert _one(spark, dt.array_eq(a(None), a(1, 2))) is False
    # [NULL,5] = [1,6] → FALSE (second pair decides; min-fold)
    assert _one(spark, dt.array_eq(a(None, 5), a(1, 6))) is False
    # [NULL,1] = [2,1] → NULL (no FALSE pair)
    assert _one(spark, dt.array_eq(a(None, 1), a(2, 1))) is None
    assert _one(spark, dt.array_eq(a(1, 2), a(1, 2))) is True
    assert _one(spark, dt.array_eq(a(1, 2), a(1, 3))) is False
    na = F.lit(None).cast("array<int>")
    assert _one(spark, dt.array_eq(na, a(1))) is None


def test_array_eq_legs_numeric_cross_leg(spark):
    # [1] (i64 leg) = [1.0] (f64 leg) → TRUE via leg-aware element eq
    df = dt.encode_rows(spark, [
        {"_id": 1, "l": [1], "r": [1.0]},
        {"_id": 2, "l": [1], "r": [2.0]},
        {"_id": 3, "l": ["a"], "r": ["a"]},
        {"_id": 4, "l": ["a"], "r": [1]},
    ])
    got = {r["_id"]: r["e"] for r in df.select(
        "_id",
        dt.array_eq(F.col("l.arr"), F.col("r.arr"),
                    elem_eq=dt.legs_elem_eq).alias("e")).collect()}
    assert got == {1: True, 2: False, 3: True, 4: False}
