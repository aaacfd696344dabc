"""SQL temporal-dialect rewriter tests (reference
sql/temporal_test.clj analogue)."""

from xtdb_spark.session import XtdbSession
from xtdb_spark.sql.rewriter import parse_clauses


def make_xt(spark, tmp_path):
    xt = XtdbSession.__new__(XtdbSession)
    from xtdb_spark.tx import TableStore

    xt.spark = spark
    xt.store = TableStore(spark, str(tmp_path / "wh"))
    return xt


def test_parse_clauses():
    b = parse_clauses("FOR VALID_TIME AS OF '2024-01-15' "
                      "FOR SYSTEM_TIME AS OF TIMESTAMP '2024-02-01'")
    assert b.valid_asof == "2024-01-15"
    assert b.system_asof == "2024-02-01"
    b2 = parse_clauses("FOR ALL VALID_TIME FOR ALL SYSTEM_TIME")
    assert b2.all_valid and b2.all_system
    b3 = parse_clauses("FOR VALID_TIME BETWEEN '2024-01-01' AND '2024-02-01'")
    assert b3.valid_range == ("2024-01-01", "2024-02-01")


def test_sql_current_and_asof(spark, tmp_path):
    xt = make_xt(spark, tmp_path)
    xt.store.put("users", [{"_id": 1, "name": "ada"}], system_from="2024-01-01")
    xt.store.put("users", [{"_id": 1, "name": "ada2"}], system_from="2024-02-01")

    from xtdb_spark.sql.rewriter import rewrite_and_run

    cur = rewrite_and_run(xt, "SELECT name FROM users").collect()
    assert [r["name"] for r in cur] == ["ada2"]

    old = rewrite_and_run(
        xt, "SELECT name FROM users FOR SYSTEM_TIME AS OF '2024-01-15'"
    ).collect()
    assert [r["name"] for r in old] == ["ada"]

    hist = rewrite_and_run(
        xt, "SELECT COUNT(*) AS n FROM users FOR ALL SYSTEM_TIME").collect()
    assert hist[0]["n"] == 2


def test_sql_join_and_passthrough(spark, tmp_path):
    xt = make_xt(spark, tmp_path)
    xt.store.put("a_tbl", [{"_id": 1, "k": 1, "x": "l"}], system_from="2024-01-01")
    xt.store.put("b_tbl", [{"_id": 1, "k": 1, "y": "r"}], system_from="2024-01-01")
    out = rewrite_sql(xt, """
        SELECT a_tbl.x, b_tbl.y
        FROM a_tbl JOIN b_tbl ON a_tbl.k = b_tbl.k
    """)
    assert [(r["x"], r["y"]) for r in out.collect()] == [("l", "r")]


def rewrite_sql(xt, q):
    from xtdb_spark.sql.rewriter import rewrite_and_run

    return rewrite_and_run(xt, q)


def test_info_schema_views(spark, tmp_path):
    xt = make_xt(spark, tmp_path)
    xt.store.put("users", [{"_id": 1, "name": "ada"}], system_from="2024-01-01")
    from xtdb_spark.sources.info_schema import register_all

    register_all(spark, xt.store)
    tables = spark.sql("SELECT table_name FROM information_schema_tables").collect()
    assert "users" in {r["table_name"] for r in tables}
    cols = spark.sql("SELECT column_name FROM information_schema_columns "
                     "WHERE table_name = 'users'").collect()
    assert {"_id", "name", "_iid"} <= {r["column_name"] for r in cols}
    stats = {r["table_name"]: r for r in
             spark.sql("SELECT * FROM xt_table_stats").collect()}
    assert stats["users"]["n_events"] == 1
    assert stats["users"]["n_files"] >= 1
    assert stats["users"]["n_bytes"] > 0


def test_sql_system_time_between(spark, tmp_path):
    """FOR SYSTEM_TIME FROM a TO b: every belief held about the
    current valid point during the span (audit query)."""
    xt = make_xt(spark, tmp_path)
    xt.store.put("acct", [{"_id": 1, "bal": 10}], system_from="2024-01-01")
    xt.store.put("acct", [{"_id": 1, "bal": 20}], system_from="2024-02-01")
    xt.store.put("acct", [{"_id": 1, "bal": 30}], system_from="2024-03-01")

    from xtdb_spark.sql.rewriter import parse_clauses, rewrite_and_run

    b = parse_clauses("FOR SYSTEM_TIME BETWEEN '2024-01-15' AND '2024-02-15'")
    assert b.system_range == ("2024-01-15", "2024-02-15")

    rows = rewrite_and_run(
        xt, "SELECT bal FROM acct "
            "FOR SYSTEM_TIME FROM '2024-01-15' TO '2024-02-15'").collect()
    # bal=10 was believed until 02-01, bal=20 from 02-01; bal=30 is
    # outside the window
    assert sorted(r["bal"] for r in rows) == [10, 20]


def test_sql_explain_and_explain_analyze(spark, tmp_path):
    xt = make_xt(spark, tmp_path)
    xt.store.put("t", [{"_id": i, "v": i * 10} for i in range(5)])

    from xtdb_spark.sql.rewriter import rewrite_and_run

    plan = rewrite_and_run(xt, "EXPLAIN SELECT v FROM t WHERE v > 10") \
        .collect()[0]["plan"]
    assert "Physical Plan" in plan

    analyzed = rewrite_and_run(
        xt, "EXPLAIN ANALYZE SELECT v FROM t WHERE v > 10") \
        .collect()[0]["plan"]
    assert "Runtime metrics" in analyzed and "numOutputRows" in analyzed
