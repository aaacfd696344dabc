"""XTDB dialect-construct tests: object/array literals, RECORDS,
NEST_ONE/NEST_MANY (reference Sql.g4:283-284,386-393,524-531,802-813;
planned by sql.clj's ObjectExpr / RecordsQuery / NestOne/NestMany
visitors). Translation layer: xtdb_spark/sql/constructs.py."""

import pytest

from xtdb_spark.session import XtdbSession
from xtdb_spark.sql.constructs import translate
from xtdb_spark.sql.rewriter import rewrite_and_run


def make_xt(spark, tmp_path):
    xt = XtdbSession.__new__(XtdbSession)
    from xtdb_spark.tx import TableStore

    xt.spark = spark
    xt.store = TableStore(spark, str(tmp_path / "wh"))
    return xt


def test_translate_pure():
    # array access is ONE-based (reference/SQL standard; round 11 —
    # direct-sql/sl-a5 friends[2] is the SECOND element), so
    # subscripts lower to element_at instead of Spark's 0-based []
    assert translate("SELECT a[1] FROM t") == \
        "SELECT element_at(a, 1) FROM t"
    assert translate("SELECT {a: 1} AS r") == \
        "SELECT named_struct('a', 1) AS r"
    assert translate("SELECT [1, x] AS xs FROM t") == \
        "SELECT array(1, x) AS xs FROM t"
    assert translate("SELECT OBJECT(a: 1, b: {c: [2]}) AS r") == \
        "SELECT named_struct('a', 1, 'b', named_struct('c', array(2))) AS r"
    # subscripts keep working next to literals (1-based)
    assert translate("SELECT f([1,2])[1] FROM t") == \
        "SELECT element_at(f(array(1,2)), 1) FROM t"
    # chained access after a subscript
    assert translate("SELECT p.friends[2].user FROM p") == \
        "SELECT element_at(p.friends, 2).user FROM p"


def test_object_and_array_literals_run(spark, tmp_path):
    xt = make_xt(spark, tmp_path)
    r = rewrite_and_run(
        xt, "SELECT {a: 1 + 1, tags: ['x', 'y']} AS r").collect()[0]["r"]
    assert r["a"] == 2 and list(r["tags"]) == ["x", "y"]
    # OBJECT(...) spelling, nested
    r2 = rewrite_and_run(
        xt, "SELECT OBJECT(p: {q: [1, 2]}) AS r").collect()[0]["r"]
    assert list(r2["p"]["q"]) == [1, 2]


def test_records_query_and_insert(spark, tmp_path):
    xt = make_xt(spark, tmp_path)
    # standalone RECORDS query (RecordsQuery, Sql.g4:683)
    rows = rewrite_and_run(
        xt, "RECORDS {_id: 1, name: 'a'}, {_id: 2, age: 30}").collect()
    got = {(r["_id"], r["name"], r["age"]) for r in rows}
    assert got == {(1, "a", None), (2, None, 30)}

    # INSERT INTO … RECORDS (InsertRecords, Sql.g4:811) — dynamic
    # keys union; missing keys NULL
    rewrite_and_run(
        xt, "INSERT INTO people RECORDS "
            "{_id: 1, name: 'Alice', age: 30}, {_id: 2, name: 'Bob'}")
    out = rewrite_and_run(
        xt, "SELECT _id, name, age FROM people ORDER BY _id").collect()
    assert [(r["_id"], r["name"], r["age"]) for r in out] == \
        [(1, "Alice", 30), (2, "Bob", None)]

    # PATCH INTO … RECORDS (PatchRecords, Sql.g4:803): merge keys
    rewrite_and_run(
        xt, "PATCH INTO people RECORDS {_id: 2, age: 41}")
    out = rewrite_and_run(
        xt, "SELECT name, age FROM people WHERE _id = 2").collect()
    assert [(r["name"], r["age"]) for r in out] == [("Bob", 41)]


def test_nest_many_and_nest_one(spark, tmp_path):
    xt = make_xt(spark, tmp_path)
    rewrite_and_run(xt, "INSERT INTO customers RECORDS "
                        "{_id: 1, name: 'c1'}, {_id: 2, name: 'c2'}")
    rewrite_and_run(xt, "INSERT INTO orders RECORDS "
                        "{_id: 10, cust: 1, amt: 5.0}, "
                        "{_id: 11, cust: 1, amt: 7.0}, "
                        "{_id: 12, cust: 2, amt: 1.0}")

    # NEST_MANY: one array-of-records column per customer
    rows = rewrite_and_run(xt, """
        SELECT c._id AS cid,
               NEST_MANY (SELECT o._id AS oid, o.amt FROM orders o
                          WHERE o.cust = c._id) AS orders
        FROM customers c ORDER BY cid
    """).collect()
    nested = {r["cid"]: sorted((o["oid"], o["amt"]) for o in r["orders"])
              for r in rows}
    assert nested == {1: [(10, 5.0), (11, 7.0)], 2: [(12, 1.0)]}

    # NEST_ONE: single record (cardinality 1 here)
    rows = rewrite_and_run(xt, """
        SELECT c._id AS cid,
               NEST_ONE (SELECT o.amt FROM orders o
                         WHERE o.cust = c._id AND o.amt > 6) AS big
        FROM customers c ORDER BY cid
    """).collect()
    assert rows[0]["big"]["amt"] == 7.0
    assert rows[1]["big"] is None

    # NEST_ONE over a >1-row subquery errors (the reference's
    # single-join cardinality check; Spark's scalar-subquery guard)
    with pytest.raises(Exception):
        rewrite_and_run(xt, """
            SELECT c._id, NEST_ONE (SELECT o.amt FROM orders o
                                    WHERE o.cust = c._id) AS one
            FROM customers c
        """).collect()


def test_nest_many_grouped(spark, tmp_path):
    xt = make_xt(spark, tmp_path)
    rewrite_and_run(xt, "INSERT INTO ev RECORDS "
                        "{_id: 1, cat: 'a'}, {_id: 2, cat: 'a'}, "
                        "{_id: 3, cat: 'b'}")
    rows = rewrite_and_run(xt, """
        SELECT NEST_MANY (SELECT cat, COUNT(*) AS n FROM ev
                          GROUP BY cat) AS by_cat
    """).collect()
    got = sorted((o["cat"], o["n"]) for o in rows[0]["by_cat"])
    assert got == [("a", 2), ("b", 1)]


def test_nest_one_distinct_preserved(spark, tmp_path):
    """NEST_ONE must keep the subquery's DISTINCT: multiple rows with
    one distinct value is single-row under the reference's semantics,
    not a scalar-subquery cardinality error (regression)."""
    xt = make_xt(spark, tmp_path)
    rewrite_and_run(xt, "INSERT INTO emp RECORDS "
                        "{_id: 1, dept: 'eng'}, {_id: 2, dept: 'eng'}")
    rows = rewrite_and_run(
        xt, "SELECT NEST_ONE (SELECT DISTINCT dept FROM emp) AS d"
    ).collect()
    assert rows[0]["d"]["dept"] == "eng"
    # grouped NEST_MANY honors DISTINCT over the grouped output too
    rewrite_and_run(xt, "INSERT INTO emp2 RECORDS "
                        "{_id: 1, dept: 'eng', n: 1}, "
                        "{_id: 2, dept: 'eng', n: 1}")
    rows = rewrite_and_run(
        xt, "SELECT NEST_MANY (SELECT DISTINCT dept FROM emp2 "
            "GROUP BY dept, n) AS ds").collect()
    assert [o["dept"] for o in rows[0]["ds"]] == ["eng"]


def test_records_param_order_across_key_orders(spark, tmp_path):
    """Positional '?' params inside RECORDS bind in TEXTUAL order even
    when records spell their keys in different orders (regression:
    values were emitted in union-key order, swapping ?-slots)."""
    xt = make_xt(spark, tmp_path)
    rows = rewrite_and_run(
        xt, "RECORDS {a: 1, b: ?}, {b: ?, a: ?}",
        args=[10, 20, 30]).collect()
    got = sorted((r["a"], r["b"]) for r in rows)
    assert got == [(1, 10), (30, 20)]


def test_contains_point_spellings(spark, tmp_path):
    """CONTAINS point detection beyond bare literals: CAST(... AS
    TIMESTAMP/DATE) and point-producing functions are points, so a
    timestamp-typed column can be used via an explicit CAST."""
    xt = make_xt(spark, tmp_path)
    rewrite_and_run(xt, """
        INSERT INTO res2 RECORDS
          {_id: 1, vf: TIMESTAMP '2024-01-01', vt: TIMESTAMP '2024-01-10',
           at: TIMESTAMP '2024-01-05'},
          {_id: 2, vf: TIMESTAMP '2024-01-01', vt: TIMESTAMP '2024-01-10',
           at: TIMESTAMP '2024-03-01'}
    """)
    rows = rewrite_and_run(xt, """
        SELECT _id FROM res2
        WHERE PERIOD(vf, vt) CONTAINS CAST(at AS TIMESTAMP)
        ORDER BY _id
    """).collect()
    assert [r["_id"] for r in rows] == [1]
    rows = rewrite_and_run(xt, """
        SELECT _id FROM res2
        WHERE PERIOD(vf, vt) CONTAINS to_timestamp('2024-01-05')
        ORDER BY _id
    """).collect()
    assert [r["_id"] for r in rows] == [1, 2]


def test_period_predicates_sql(spark, tmp_path):
    """SQL-surface period constructors + infix predicates (reference
    Sql.g4:227-243,370-371; semantics = functions/periods.py, [from,
    to) with NULL = ∞)."""
    xt = make_xt(spark, tmp_path)
    rewrite_and_run(xt, """
        INSERT INTO res RECORDS
          {_id: 1, vf: TIMESTAMP '2024-01-01', vt: TIMESTAMP '2024-01-10'},
          {_id: 2, vf: TIMESTAMP '2024-01-08', vt: TIMESTAMP '2024-01-20'},
          {_id: 3, vf: TIMESTAMP '2024-02-01', vt: NULL}
    """)

    # OVERLAPS against a literal period; id 3 is open-ended → overlaps
    rows = rewrite_and_run(xt, """
        SELECT _id FROM res
        WHERE PERIOD(vf, vt) OVERLAPS
              PERIOD(TIMESTAMP '2024-01-09', TIMESTAMP '2024-03-01')
        ORDER BY _id
    """).collect()
    assert [r["_id"] for r in rows] == [1, 2, 3]

    # CONTAINS point form
    rows = rewrite_and_run(xt, """
        SELECT _id FROM res
        WHERE PERIOD(vf, vt) CONTAINS TIMESTAMP '2024-01-09'
        ORDER BY _id
    """).collect()
    assert [r["_id"] for r in rows] == [1, 2]

    # PRECEDES / IMMEDIATELY PRECEDES between row periods (self join)
    rows = rewrite_and_run(xt, """
        SELECT a._id AS ia, b._id AS ib FROM res a, res b
        WHERE PERIOD(a.vf, a.vt) STRICTLY PRECEDES PERIOD(b.vf, b.vt)
        ORDER BY ia, ib
    """).collect()
    assert [(r["ia"], r["ib"]) for r in rows] == [(1, 3), (2, 3)]

    # n-ary prefix OVERLAPS: common instant across three periods
    row = rewrite_and_run(xt, """
        SELECT OVERLAPS(PERIOD(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-10'),
                        PERIOD(TIMESTAMP '2024-01-05', TIMESTAMP '2024-01-20'),
                        PERIOD(TIMESTAMP '2024-01-08', NULL)) AS common
    """).collect()[0]
    assert row["common"] is True

    # EQUALS and accessor-style field read of a constructed period
    row = rewrite_and_run(xt, """
        SELECT PERIOD(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-02')
                 EQUALS
               PERIOD(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-02') AS eq,
               (PERIOD(TIMESTAMP '2024-01-01', NULL))._to IS NULL AS open_end
    """).collect()[0]
    assert row["eq"] is True and row["open_end"] is True


def test_xtql_embedded_in_sql(spark, tmp_path):
    """`XTQL '…'` query form over the SQL surface (reference
    Sql.g4:685 XtqlQuery) — routed to the edn pipeline."""
    xt = make_xt(spark, tmp_path)
    rewrite_and_run(xt, "INSERT INTO items RECORDS "
                        "{_id: 1, price: 5.0}, {_id: 2, price: 9.0}, "
                        "{_id: 3, price: 2.0}")
    rows = rewrite_and_run(xt, """
        XTQL '(-> (from :items [_id price])
                  (where (> price 3.0))
                  (order-by _id))'
    """).collect()
    assert [(r["_id"], r["price"]) for r in rows] == [(1, 5.0), (2, 9.0)]
    # parenthesized spelling
    rows = rewrite_and_run(
        xt, "XTQL('(-> (from :items [_id]) (order-by _id) (limit 1))')"
    ).collect()
    assert [r["_id"] for r in rows] == [1]


def test_star_exclude_rename_translate():
    """`* EXCLUDE` / `* RENAME` (Sql.g4:659-665, executed by
    sql.clj:889-922) → Spark `* EXCEPT` + aliased re-adds."""
    assert translate("SELECT * EXCLUDE b FROM t") == \
        "SELECT * EXCEPT (b) FROM t"
    assert translate("SELECT * EXCLUDE (b, c) FROM t") == \
        "SELECT * EXCEPT (b, c) FROM t"
    assert translate("SELECT t.* EXCLUDE a RENAME (b AS bb) FROM t") == \
        "SELECT t.* EXCEPT (a, b), t.b AS bb FROM t"
    assert translate("SELECT * RENAME a AS a2 FROM t") == \
        "SELECT * EXCEPT (a), a AS a2 FROM t"
    # multiplication by a *quoted* column named exclude is untouched
    assert translate('SELECT price * "exclude" FROM t') == \
        'SELECT price * "exclude" FROM t'


def test_from_first_translate():
    """FROM-first query terms (Sql.g4:681 `fromClause queryTail*`)
    fold tails left-to-right like the reference (sql.clj:2795)."""
    assert translate("FROM t") == "SELECT * FROM t"
    assert translate("FROM t WHERE a = 1 SELECT a, b") == \
        "SELECT a, b FROM t WHERE (a = 1)"
    # a WHERE tail *after* a projection wraps it (sees the aliases)
    assert translate("FROM t SELECT a*2 AS a2 WHERE a2 > 1") == \
        "SELECT * FROM (SELECT a*2 AS a2 FROM t) __xt_ff1 WHERE a2 > 1"
    # EXTRACT/SUBSTRING-style FROM inside calls is untouched
    sql = "SELECT EXTRACT(YEAR FROM ts), substring(s FROM 2 FOR 3) FROM t"
    assert translate(sql) == sql
    # DML FROM is untouched
    assert translate("DELETE FROM t WHERE a=1") == "DELETE FROM t WHERE a=1"
    # WITH MATERIALIZED hint is dropped
    assert translate("WITH MATERIALIZED x AS (SELECT 1 AS v) "
                     "SELECT v FROM x") == \
        "WITH x AS (SELECT 1 AS v) SELECT v FROM x"


def test_star_exclude_and_from_first_run(spark, tmp_path):
    xt = make_xt(spark, tmp_path)
    rewrite_and_run(xt, "INSERT INTO ft RECORDS "
                        "{_id: 1, a: 10, b: 'x'}, {_id: 2, a: 20, b: 'y'}")
    rows = rewrite_and_run(
        xt, "SELECT * EXCLUDE (_id) RENAME (a AS av) FROM ft "
            "ORDER BY av").collect()
    assert [set(r.asDict()) for r in rows] == [{"b", "av"}] * 2
    assert [r["av"] for r in rows] == [10, 20]

    # `_iid` is internal — SELECT * through SQL never exposes it
    # (reference sql.clj table-info: star expands to _id + doc cols)
    star = rewrite_and_run(xt, "SELECT * FROM ft").columns
    assert "_iid" not in star and "_id" in star

    rows = rewrite_and_run(
        xt, "FROM ft WHERE a > 5 GROUP BY b "
            "SELECT b, count(*) AS n ORDER BY b").collect()
    assert [(r["b"], r["n"]) for r in rows] == [("x", 1), ("y", 1)]

    # pipelined tails: project, then filter the projection
    rows = rewrite_and_run(
        xt, "FROM ft SELECT a * 2 AS a2 WHERE a2 > 25").collect()
    assert [r["a2"] for r in rows] == [40]

    # FROM-first inside EXISTS and as a UNION branch
    rows = rewrite_and_run(
        xt, "SELECT count(*) AS n FROM ft "
            "WHERE EXISTS (FROM ft x WHERE x.a > 15)").collect()
    assert rows[0]["n"] == 2
    rows = rewrite_and_run(
        xt, "FROM ft SELECT b UNION ALL FROM ft WHERE a > 15 SELECT b "
            "ORDER BY b").collect()
    assert [r["b"] for r in rows] == ["x", "y", "y"]


def test_unnest_and_series_tables(spark, tmp_path):
    """UNNEST / generate_series / range table refs (Sql.g4:546-547):
    LATERAL explode lowering, 1-based ordinality (operator/
    unnest.clj writes inc el-idx), generate_series inclusive vs
    range exclusive end."""
    xt = make_xt(spark, tmp_path)
    rows = rewrite_and_run(
        xt, "SELECT v FROM generate_series(1, 5) AS g(v) "
            "ORDER BY v").collect()
    assert [r["v"] for r in rows] == [1, 2, 3, 4, 5]
    rows = rewrite_and_run(
        xt, "SELECT v FROM range(1, 5) AS g(v) ORDER BY v").collect()
    assert [r["v"] for r in rows] == [1, 2, 3, 4]
    rows = rewrite_and_run(
        xt, "SELECT v, o FROM generate_series(2, 6, 2) "
            "WITH ORDINALITY AS g(v, o) ORDER BY o").collect()
    assert [(r["v"], r["o"]) for r in rows] == [(2, 1), (4, 2), (6, 3)]

    rewrite_and_run(xt, "INSERT INTO ut RECORDS "
                        "{_id: 1, tags: ['a', 'b']}, {_id: 2, tags: ['c']}")
    rows = rewrite_and_run(
        xt, "SELECT _id, u.tag, u.o FROM ut, "
            "UNNEST(ut.tags) WITH ORDINALITY AS u(tag, o) "
            "ORDER BY _id, o").collect()
    assert [(r["_id"], r["tag"], r["o"]) for r in rows] == \
        [(1, "a", 1), (1, "b", 2), (2, "c", 1)]
    # expression forms: array values
    rows = rewrite_and_run(
        xt, "SELECT size(generate_series(1, 4)) AS gs, "
            "size(range(1, 4)) AS rs").collect()
    assert (rows[0]["gs"], rows[0]["rs"]) == (4, 3)


def test_quantified_comparisons_3vl(spark, tmp_path):
    """E op ANY/SOME/ALL (subq) (Sql.g4:245; reference lowers ALL to
    NOT-negated-ANY over a mark-join, sql.clj:2127) — the lowering
    must keep the standard's 3VL across empty sets, NULL elements,
    and NULL left operands (incl. fixing Spark's semi-join-shaped
    IN-subquery which loses UNKNOWN)."""
    from xtdb_spark.sql.constructs import translate

    def run(sql):
        return spark.sql(translate(sql)).collect()[0]["r"]

    empty = "SELECT 1 AS x WHERE FALSE"
    withnull = "SELECT * FROM (VALUES (3), (NULL)) q(x)"
    cases = [
        (f"SELECT (5 = ANY ({empty})) AS r", False),
        (f"SELECT (5 = ALL ({empty})) AS r", True),
        (f"SELECT (5 = ANY ({withnull})) AS r", None),     # no match + NULL
        (f"SELECT (3 = ANY ({withnull})) AS r", True),
        (f"SELECT (5 <> ALL ({withnull})) AS r", None),
        (f"SELECT (5 > ANY ({withnull})) AS r", True),     # 5 > 3
        (f"SELECT (2 > ANY ({withnull})) AS r", None),     # only NULL left
        (f"SELECT (5 > ALL ({withnull})) AS r", None),
        (f"SELECT (2 > ALL ({withnull})) AS r", False),    # 2 > 3 fails
        (f"SELECT (CAST(NULL AS INT) = ANY ({withnull})) AS r", None),
        ("SELECT (5 = SOME (SELECT * FROM (VALUES (5)) q(x))) AS r", True),
    ]
    for sql, want in cases:
        assert run(sql) is want or run(sql) == want, (sql, want, run(sql))


def test_regex_ops_and_between_symmetric(spark, tmp_path):
    from xtdb_spark.sql.constructs import translate

    def run(sql):
        return [tuple(r) for r in spark.sql(translate(sql)).collect()]

    assert run("SELECT 'abc' LIKE_REGEX 'a.c' AS m") == [(True,)]
    assert run("SELECT 'ABC' LIKE_REGEX 'a.c' FLAG 'i' AS m") == [(True,)]
    assert run("SELECT 'abc' ~ 'a.c', 'ABC' ~* 'a.c', "
               "'abc' !~ 'zzz', ~5 AS bitnot") == [(True, True, True, -6)]
    assert run("SELECT 3 BETWEEN SYMMETRIC 5 AND 1 AS b, "
               "3 NOT BETWEEN SYMMETRIC 2 AND 1 AS nb") == [(True, True)]
    # pg-compat constants (reference sql.clj:1792-1797,2228-2234)
    assert run("SELECT has_table_privilege('u','t','s') AS a, "
               "pg_table_is_visible(1) AS b, pg_get_userbyid(10) AS c, "
               "pg_get_expr('x', 1) AS d") == [(True, True, "xtdb", None)]


def test_iso_intervals_and_xtdb_types(spark, tmp_path):
    """ISO-8601 interval literals (reference sql.clj:992
    parse-duration-literal) and the XTDB type spellings in CAST
    (URI/DURATION/t ARRAY/ROW, Sql.g4:181-196)."""
    from xtdb_spark.sql.constructs import translate

    def run(sql):
        return [tuple(r) for r in spark.sql(translate(sql)).collect()]

    assert run("SELECT DATE '2024-01-01' + INTERVAL 'P1Y2M' AS d") == \
        [(__import__("datetime").date(2025, 3, 1),)]
    got = run("SELECT TIMESTAMP '2024-01-01 00:00:00' "
              "+ INTERVAL 'PT1H30M' AS t")[0][0]
    assert (got.hour, got.minute) == (1, 30)
    # date + day-time interval widens to timestamp in Spark
    got = run("SELECT DATE '2024-01-22' + INTERVAL '-P3W' AS d")[0][0]
    assert got == __import__("datetime").datetime(2024, 1, 1, 0, 0)
    # mixed ym+dt (round 12): emitted as the legacy multi-unit
    # CalendarInterval literal — generate_series/range DECOMPOSE it
    # into per-index month + day-time addition (Spark's ANSI typed
    # intervals reject the literal elsewhere, its own loud error)
    assert "INTERVAL 14 MONTH 3 DAY 0 SECOND" in \
        translate("SELECT INTERVAL 'P1Y2M3D'")
    got = run("SELECT generate_series(TIMESTAMP '2020-01-01T00:00:00',"
              " TIMESTAMP '2020-08-01T00:00:00',"
              " INTERVAL 'P3M2DT3S') ts")[0][0]
    import datetime as _dt

    assert got == [_dt.datetime(2020, 1, 1, 0, 0, 0),
                   _dt.datetime(2020, 4, 3, 0, 0, 3),
                   _dt.datetime(2020, 7, 5, 0, 0, 6)]
    assert run("SELECT CAST('u://x' AS URI) AS u") == [("u://x",)]
    assert run("SELECT CAST(array(1, 2) AS INT ARRAY) AS a") == [([1, 2],)]
    r = run("SELECT CAST(named_struct('a', 1, 'b', 'x') "
            "AS ROW(a BIGINT, b VARCHAR)) AS r")[0][0]
    assert (r["a"], r["b"]) == (1, "x")
    # [] subscripts are ONE-based (reference/SQL standard, round 11:
    # they lower to element_at)
    assert run("SELECT ARRAY[1, 2][1] AS e") == [(1,)]
    assert run("SELECT ARRAY[1, 2][2] AS e") == [(2,)]


def test_typed_literals_and_string_spellings(spark, tmp_path):
    """Typed literals (Sql.g4:103-113: DURATION/UUID/URI/KEYWORD/
    TIME) and the extra string spellings (E'…' C-escapes, dollar
    quoting) — normalized by the tokenizer so Spark sees standard
    strings."""
    from xtdb_spark.sql.constructs import translate
    from xtdb_spark.sql.rewriter import _tokenize

    def run(sql):
        return [tuple(r) for r in spark.sql(translate(sql)).collect()]

    assert run("SELECT UUID '531A379E-31BB-4CE1-8690-158DCEB64BE6' AS u") \
        == [("531a379e-31bb-4ce1-8690-158dceb64be6",)]
    assert run("SELECT KEYWORD ':foo' AS k, URI 'http://x' AS r") == \
        [("foo", "http://x")]
    got = run("SELECT TIMESTAMP '2024-01-01 00:00:00' "
              "+ DURATION 'PT45M' AS t")[0][0]
    assert got.minute == 45
    assert run("SELECT TIME '10:30:00' < TIME '11:00:00' AS lt") == \
        [(True,)]
    # string spellings normalize at the tokenizer
    toks = _tokenize("SELECT E'a\\nb', $$it's$$, $q$x $ y$q$")
    strs = [t for k, t in toks if k == "str"]
    assert strs == ["'a\nb'", "'it''s'", "'x $ y'"]
    # a column named time followed by an aliased string is untouched
    assert translate("SELECT t.time 'x'") == "SELECT t.time 'x'"


def test_search_condition_comma_and(spark, tmp_path):
    """searchCondition commas are implicit AND (Sql.g4:749,
    sql.clj:1273 wraps the exprs in one `and`) — in WHERE, HAVING,
    DML WHERE, subqueries, and FROM-first tails."""
    xt = make_xt(spark, tmp_path)
    rewrite_and_run(xt, "INSERT INTO sc RECORDS "
                        "{_id: 1, a: 5, b: 1}, {_id: 2, a: 5, b: 9}, "
                        "{_id: 3, a: 0, b: 9}")
    rows = rewrite_and_run(
        xt, "SELECT _id FROM sc WHERE a > 1, b > 5").collect()
    assert [r["_id"] for r in rows] == [2]
    rows = rewrite_and_run(
        xt, "FROM sc WHERE a > 1, b < 5 SELECT _id").collect()
    assert [r["_id"] for r in rows] == [1]
    rows = rewrite_and_run(
        xt, "SELECT a, count(*) AS n FROM sc "
            "GROUP BY a HAVING count(*) > 1, a > 1").collect()
    assert [(r["a"], r["n"]) for r in rows] == [(5, 2)]
    rewrite_and_run(xt, "DELETE FROM sc WHERE a > 1, b > 5")
    rows = rewrite_and_run(xt, "SELECT _id FROM sc ORDER BY _id").collect()
    assert [r["_id"] for r in rows] == [1, 3]


def test_offset_fetch_spellings(spark, tmp_path):
    """offsetAndLimit (Sql.g4:698-711): FETCH FIRST/NEXT … ONLY, the
    ROW/ROWS noise words, and the offset-before-limit order all
    canonicalize to Spark's LIMIT … OFFSET …."""
    from xtdb_spark.sql.constructs import translate

    spark.createDataFrame([(i,) for i in range(10)], "a int") \
        .createOrReplaceTempView("of_t")

    def run(sql):
        return [r["a"] for r in spark.sql(translate(sql)).collect()]

    assert run("SELECT a FROM of_t ORDER BY a "
               "FETCH FIRST 3 ROWS ONLY") == [0, 1, 2]
    assert run("SELECT a FROM of_t ORDER BY a FETCH NEXT ROW ONLY") == [0]
    assert run("SELECT a FROM of_t ORDER BY a "
               "OFFSET 2 ROWS FETCH FIRST 3 ROWS ONLY") == [2, 3, 4]
    assert run("SELECT a FROM of_t ORDER BY a OFFSET 8 ROW") == [8, 9]
    assert run("SELECT a FROM of_t ORDER BY a OFFSET 2 LIMIT 3") == \
        [2, 3, 4]
    assert run("SELECT a FROM of_t ORDER BY a LIMIT 3 OFFSET 2") == \
        [2, 3, 4]


def test_quantified_over_arrays(spark, tmp_path):
    """`op ANY/ALL (array-expr)` (sql.clj:2155
    QuantifiedComparisonExpr — the postgres `= ANY(array)` form) →
    Spark exists/forall, which follow 3VL natively."""
    from xtdb_spark.sql.constructs import translate

    def run(sql):
        return spark.sql(translate(sql)).collect()[0]["r"]

    assert run("SELECT (5 = ANY (array(3, 5))) AS r") is True
    assert run("SELECT (5 = ANY (array(3, CAST(NULL AS INT)))) AS r") \
        is None
    assert run("SELECT (5 = ANY (array())) AS r") is False
    assert run("SELECT (5 > ALL (array(1, 2))) AS r") is True
    assert run("SELECT (5 > ALL (array(1, CAST(NULL AS INT)))) AS r") \
        is None
    assert run("SELECT (5 > ALL (array())) AS r") is True


def test_review_fix_regressions(spark, tmp_path):
    """Round-6 review findings, pinned: star-modifier multiplication
    guard, CASE…END left operands, keyword-prefixed array columns,
    ?-param refusal in reordering/duplicating rewrites, signed empty
    durations, concatenated regex patterns, tolerant C-escapes."""
    from xtdb_spark.sql.constructs import translate
    from xtdb_spark.sql.rewriter import _tokenize

    # multiplication by a bare column named exclude is untouched
    assert translate("SELECT price * exclude FROM t WHERE x > 0") == \
        "SELECT price * exclude FROM t WHERE x > 0"
    # CASE…END as the quantified left operand survives whole
    q = ("SELECT (CASE WHEN a = 1 THEN b ELSE c END "
         "= ANY (SELECT * FROM (VALUES (5), (9)) v(x))) AS r")
    spark.createDataFrame([(1, 5, 3)], "a int, b int, c int") \
        .createOrReplaceTempView("rr_t")
    got = spark.sql(translate(q + " FROM rr_t")).collect()[0]["r"]
    assert got is True
    # a column named `selections` is an ARRAY operand, not a subquery
    assert "exists(selections" in translate(
        "SELECT a FROM t WHERE x = ANY(selections)")
    # ?-params inside rewrites that duplicate/reorder refuse loudly
    with pytest.raises(ValueError):
        translate("SELECT a FROM t WHERE x = ANY(SELECT v FROM u "
                  "WHERE k = ?)")
    with pytest.raises(ValueError):
        translate("SELECT a FROM t ORDER BY a OFFSET ? ROWS "
                  "FETCH NEXT ? ROWS ONLY")
    with pytest.raises(ValueError):
        translate("SELECT INTERVAL '-P'")
    # || binds tighter than ~ (postgres precedence)
    assert spark.sql(translate("SELECT ('ab' ~ 'a' || 'b') AS m")) \
        .collect()[0]["m"] is True
    # PG-style 1-digit \x escape doesn't crash tokenization
    assert _tokenize(r"SELECT E'\x9!'")[-1] == ("str", "'\t!'")
