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


def test_sql_alias_preserved(spark, tmp_path):
    """`FROM users AS u` / `FROM users u` keep the alias on the
    substituted view (round-1 regex rewriter mangled these)."""
    xt = make_xt(spark, tmp_path)
    xt.store.put("users", [{"_id": 1, "name": "ada"}], system_from="2024-01-01")
    for q in ("SELECT u.name FROM users AS u",
              "SELECT u.name FROM users u",
              "SELECT u.name FROM users AS u WHERE u.name = 'ada'"):
        assert [r["name"] for r in rewrite_sql(xt, q).collect()] == ["ada"]


def test_sql_comma_from_list_both_rewritten(spark, tmp_path):
    """`FROM a FOR …, b FOR SYSTEM_TIME AS OF …` — BOTH comma-separated
    refs resolve with their own bounds (reference grammar allows a
    temporal spec on every table primary, Sql.g4:540-568)."""
    xt = make_xt(spark, tmp_path)
    xt.store.put("ords", [{"_id": 1, "uid": 1, "amt": 5}], system_from="2024-01-01")
    xt.store.put("usrs", [{"_id": 1, "name": "old"}], system_from="2024-01-01")
    xt.store.put("usrs", [{"_id": 1, "name": "new"}], system_from="2024-02-01")
    rows = rewrite_sql(xt, """
        SELECT o.amt, u.name
        FROM ords o, usrs FOR SYSTEM_TIME AS OF '2024-01-15' AS u
        WHERE o.uid = u._id
    """).collect()
    assert [(r["amt"], r["name"]) for r in rows] == [(5, "old")]


def test_sql_temporal_in_subquery(spark, tmp_path):
    xt = make_xt(spark, tmp_path)
    xt.store.put("ev", [{"_id": 1, "v": 1}], system_from="2024-01-01")
    xt.store.put("ev", [{"_id": 1, "v": 2}], system_from="2024-02-01")
    rows = rewrite_sql(xt, """
        SELECT mx FROM (
          SELECT MAX(v) AS mx FROM ev FOR SYSTEM_TIME AS OF '2024-01-10'
        ) s
    """).collect()
    assert rows[0]["mx"] == 1


def test_sql_asof_param(spark, tmp_path):
    """`FOR SYSTEM_TIME AS OF ?` binds a positional argument at
    rewrite time (reference: params in temporal specs over pgwire
    prepared statements); other ?s still reach Spark."""
    xt = make_xt(spark, tmp_path)
    xt.store.put("p", [{"_id": 1, "v": 1}], system_from="2024-01-01")
    xt.store.put("p", [{"_id": 1, "v": 2}], system_from="2024-02-01")
    from xtdb_spark.sql.rewriter import rewrite_and_run

    rows = rewrite_and_run(
        xt, "SELECT v FROM p FOR SYSTEM_TIME AS OF ? WHERE v < ?",
        args=["2024-01-15", 100]).collect()
    assert [r["v"] for r in rows] == [1]


def test_sql_from_inside_functions_untouched(spark, tmp_path):
    xt = make_xt(spark, tmp_path)
    xt.store.put("fx", [{"_id": 1, "s": "hello", "ts": "2024-03-05"}],
                 system_from="2024-01-01")
    rows = rewrite_sql(xt, """
        SELECT extract(year FROM cast(ts AS date)) AS yr,
               substring(s FROM 1 FOR 2) AS s2,
               trim(LEADING 'h' FROM s) AS st
        FROM fx
    """).collect()
    assert (rows[0]["yr"], rows[0]["s2"], rows[0]["st"]) == (2024, "he", "ello")


def test_sql_quoted_table_and_alias(spark, tmp_path):
    xt = make_xt(spark, tmp_path)
    xt.store.put("qt", [{"_id": 1, "v": 7}], system_from="2024-01-01")
    rows = rewrite_sql(xt, 'SELECT q.v FROM "qt" AS q').collect()
    assert rows[0]["v"] == 7


def test_pg_catalog_views(spark, tmp_path):
    """pg_namespace/pg_class/pg_attribute from the store manifest
    (reference information_schema.clj:59-146)."""
    xt = make_xt(spark, tmp_path)
    xt.store.put("users", [{"_id": 1, "name": "ada", "age": 30}],
                 system_from="2024-01-01")
    xt.store.put("hr.emps", [{"_id": 1, "dept": "eng"}],
                 system_from="2024-01-01")
    from xtdb_spark.sources.info_schema import register_all

    register_all(spark, xt.store)
    ns = {r["nspname"] for r in
          spark.sql("SELECT nspname FROM pg_catalog_pg_namespace").collect()}
    assert {"public", "pg_catalog", "information_schema", "hr"} <= ns
    cls = {r["relname"]: r for r in
           spark.sql("SELECT * FROM pg_catalog_pg_class").collect()}
    assert "users" in cls and "emps" in cls
    assert cls["users"]["relkind"] == "r"
    # attribute rows join back on oid, typed and ordered
    rows = spark.sql("""
        SELECT c.relname, a.attname, a.attnum, t.typname
        FROM pg_catalog_pg_attribute a
        JOIN pg_catalog_pg_class c ON a.attrelid = c.oid
        JOIN pg_catalog_pg_type t ON a.atttypid = t.oid
        WHERE c.relname = 'users' ORDER BY a.attnum
    """).collect()
    by_name = {r["attname"]: r for r in rows}
    assert by_name["name"]["typname"] == "text"
    assert by_name["age"]["typname"] == "int8"
    assert [r["attnum"] for r in rows] == list(range(1, len(rows) + 1))


def test_rewrite_is_identity_without_store_tables(spark, tmp_path):
    """SQL referencing no store tables must pass through BYTE-
    IDENTICAL — including strings, comments, quoted identifiers,
    params, and FROM/FOR inside function calls."""
    from xtdb_spark.sql.rewriter import rewrite

    xt = make_xt(spark, tmp_path)
    cases = [
        "SELECT 1",
        "SELECT a, b FROM memtbl WHERE x = 'FROM users FOR ALL VALID_TIME'",
        "SELECT extract(year FROM ts), substring(s FROM 1 FOR 2) FROM v1",
        "-- comment with FROM users\nSELECT * FROM v2 /* FOR ALL */",
        'SELECT "weird col" FROM "weird table" AS w',
        "SELECT * FROM (VALUES (1), (2)) AS t(x)",
        "WITH c AS (SELECT 1 AS x) SELECT * FROM c JOIN c c2 ON c.x = c2.x",
        "SELECT * FROM a_view WHERE ts > ? AND id IN (?, ?)",
        "SELECT trim(LEADING 'x' FROM s) || 'FOR' FROM t1, t2 WHERE t1.a = t2.a",
    ]
    for q in cases:
        assert rewrite(xt, q) == q, q
    # generate_series is an XTDB construct (Sql.g4:292) — it lowers
    # to Spark's sequence, deliberately NOT identity (round 7: with a
    # direction guard so generate_series(10, 3) → [], matching
    # generate_series_test.clj)
    low = rewrite(xt, "SELECT generate_series(1, 10) AS g")
    assert "sequence" in low and "filter(" in low and "<=" in low


def test_rewrite_param_ordinals_stay_aligned(spark, tmp_path):
    """A consumed temporal ? must not shift the remaining args."""
    from xtdb_spark.sql.rewriter import rewrite_with_args

    xt = make_xt(spark, tmp_path)
    xt.store.put("pp", [{"_id": 1, "v": 5}], system_from="2024-01-01")
    sql, remaining = rewrite_with_args(
        xt, "SELECT * FROM pp FOR SYSTEM_TIME AS OF ? WHERE v = ? AND v < ?",
        ["2024-06-01", 5, 99])
    assert remaining == [5, 99]
    assert "FOR SYSTEM_TIME" not in sql and sql.count("?") == 2


def test_dotted_system_catalog_spellings(spark, tmp_path):
    """`information_schema.tables` / `pg_catalog.pg_class` / bare
    `pg_tables` resolve through the rewriter (reference routes system
    tables through :scan; ORMs and psql use the dotted spellings)."""
    xt = make_xt(spark, tmp_path)
    xt.store.put("users", [{"_id": 1, "name": "ada"}], system_from="2024-01-01")
    from xtdb_spark.sql.rewriter import rewrite_and_run

    t = rewrite_and_run(
        xt, "SELECT table_name FROM information_schema.tables").collect()
    assert "users" in {r["table_name"] for r in t}
    c = rewrite_and_run(xt, """
        SELECT a.attname
        FROM pg_catalog.pg_attribute a
        JOIN pg_catalog.pg_class c ON a.attrelid = c.oid
        WHERE c.relname = 'users'
    """).collect()
    assert {"_id", "name"} <= {r["attname"] for r in c}
    bare = rewrite_and_run(
        xt, "SELECT tablename FROM pg_tables").collect()
    assert "users" in {r["tablename"] for r in bare}


def test_pg_catalog_depth_and_xt_views(spark, tmp_path):
    """The BI-probe complement: pg_proc/pg_index/pg_description/
    pg_views/pg_roles plus xt.trie_stats and xt.metrics (reference
    information_schema.clj:59-146,231-508; metrics.clj:1-80) — all
    reachable through the dotted SQL spellings."""
    xt = make_xt(spark, tmp_path)
    xt.store.put("mt", [{"_id": i, "v": i} for i in range(4)],
                 system_from="2024-01-01")
    xt.store.put("mt", [{"_id": 0, "v": 9}], system_from="2024-02-01")

    procs = {r["proname"] for r in
             rewrite_sql(xt, "SELECT proname FROM pg_catalog.pg_proc")
             .collect()}
    assert {"version", "current_schema", "generate_series"} <= procs
    # empty-but-queryable: introspection must not error
    assert rewrite_sql(xt, "SELECT * FROM pg_index").count() == 0
    assert rewrite_sql(xt, "SELECT * FROM pg_catalog.pg_description") \
        .count() == 0
    assert rewrite_sql(xt, "SELECT * FROM pg_views").count() == 0
    roles = rewrite_sql(xt, "SELECT rolname FROM pg_roles").collect()
    assert roles[0]["rolname"] == "xtdb"
    tz = rewrite_sql(xt, "SELECT setting FROM pg_catalog.pg_settings "
                         "WHERE name = 'TimeZone'").collect()
    assert tz[0]["setting"] == "UTC"

    trie = rewrite_sql(
        xt, "SELECT * FROM xt.trie_stats WHERE table_name = 'mt'").collect()
    assert len(trie) == 2          # one row per event file
    assert all(r["n_rows"] >= 1 and r["n_bytes"] > 0 for r in trie)
    # system_from_min/max come from footer stats when present; Spark's
    # INT96 timestamp encoding records none, so NULL is legitimate —
    # the columns must exist either way
    assert {"system_from_min", "system_from_max"} <= set(trie[0].asDict())

    metrics = {r["metric"]: r["value"] for r in
               rewrite_sql(xt, "SELECT * FROM xt.metrics").collect()}
    assert metrics["txs_total"] == 2.0
    assert metrics["tables_total"] == 1.0
    assert metrics["storage_files_total"] == 2.0


def test_setting_default_system_time(spark, tmp_path):
    """SETTING DEFAULT VALID_TIME/SYSTEM_TIME query prefix (reference
    Sql.g4:79-83): defaults apply to tables without their own FOR
    clause; an explicit FOR clause overrides per dimension."""
    from xtdb_spark.sql.rewriter import rewrite_and_run

    xt = make_xt(spark, tmp_path)
    xt.store.put("st_users", [{"_id": 1, "name": "v1"}],
                 system_from="2024-01-01")
    xt.store.put("st_users", [{"_id": 1, "name": "v2"}],
                 system_from="2024-02-01")

    old = rewrite_and_run(
        xt, "SETTING DEFAULT SYSTEM_TIME TO AS OF '2024-01-15' "
            "SELECT name FROM st_users").collect()
    assert [r["name"] for r in old] == ["v1"]

    # explicit FOR beats the default
    cur = rewrite_and_run(
        xt, "SETTING DEFAULT SYSTEM_TIME TO AS OF '2024-01-15' "
            "SELECT name FROM st_users FOR SYSTEM_TIME AS OF "
            "'2024-02-15'").collect()
    assert [r["name"] for r in cur] == ["v2"]

    # ALL-dimension default: both versions visible
    hist = rewrite_and_run(
        xt, "SETTING DEFAULT SYSTEM_TIME ALL "
            "SELECT COUNT(*) AS n FROM st_users").collect()
    assert hist[0]["n"] == 2

    # comma-separated two-dimension prefix parses
    both = rewrite_and_run(
        xt, "SETTING DEFAULT VALID_TIME TO AS OF '2024-03-01', "
            "DEFAULT SYSTEM_TIME ALL "
            "SELECT COUNT(*) AS n FROM st_users").collect()
    assert both[0]["n"] == 2

    # leading whitespace/newline before SETTING must not disable the
    # prefix (regression: the first capture consumed the ws token
    # instead of SETTING and the raw prefix leaked through to Spark)
    ws = rewrite_and_run(
        xt, "\n  SETTING DEFAULT SYSTEM_TIME TO AS OF '2024-01-15' "
            "SELECT name FROM st_users").collect()
    assert [r["name"] for r in ws] == ["v1"]


def test_setting_snapshot_token_repeatable_read(spark, tmp_path):
    """SETTING SNAPSHOT_TOKEN / SNAPSHOT_TIME (Sql.g4:84-85;
    reference basis.clj, query.clj:429-440): re-running a query with
    the token captured BEFORE later writes returns the original rows
    — repeatable read. Our token is the tx id = commit system time
    in epoch microseconds, so it lowers to a DEFAULT SYSTEM_TIME AS
    OF bound."""
    import json
    import os

    from xtdb_spark.sql.rewriter import rewrite_and_run

    xt = make_xt(spark, tmp_path)
    xt.store.put("sn_docs", [{"_id": 1, "name": "v1"}])

    def latest_token():
        with open(os.path.join(xt.store.warehouse, "_txs.jsonl")) as f:
            return str(json.loads(f.read().splitlines()[-1])["tx_id"])

    tok = latest_token()
    before = rewrite_and_run(
        xt, "SELECT name FROM sn_docs ORDER BY _id").collect()
    assert [r["name"] for r in before] == ["v1"]

    xt.store.put("sn_docs", [{"_id": 1, "name": "v2"},
                             {"_id": 2, "name": "new"}])

    # pinned: identical to the pre-write read
    pinned = rewrite_and_run(
        xt, f"SETTING SNAPSHOT_TOKEN TO '{tok}' "
            "SELECT name FROM sn_docs ORDER BY _id").collect()
    assert [r["name"] for r in pinned] == ["v1"]
    # = spelling and parameter binding both parse
    eq = rewrite_and_run(
        xt, f"SETTING SNAPSHOT_TOKEN = {tok} "
            "SELECT COUNT(*) AS n FROM sn_docs").collect()
    assert eq[0]["n"] == 1
    par = rewrite_and_run(
        xt, "SETTING SNAPSHOT_TOKEN TO ? "
            "SELECT COUNT(*) AS n FROM sn_docs", [tok]).collect()
    assert par[0]["n"] == 1
    # unpinned sees the new state
    cur = rewrite_and_run(
        xt, "SELECT COUNT(*) AS n FROM sn_docs").collect()
    assert cur[0]["n"] == 2

    # SNAPSHOT_TIME: a timestamp basis works the same way
    from datetime import datetime, timedelta, timezone

    ts = (datetime(1970, 1, 1) + timedelta(microseconds=int(tok))) \
        .isoformat(sep=" ")
    st = rewrite_and_run(
        xt, f"SETTING SNAPSHOT_TIME TO TIMESTAMP '{ts}' "
            "SELECT name FROM sn_docs ORDER BY _id").collect()
    assert [r["name"] for r in st] == ["v1"]


def test_setting_clock_time_pins_now(spark, tmp_path):
    """SETTING CLOCK_TIME (Sql.g4:86; query.clj:429 expr/*clock*):
    CURRENT_TIMESTAMP / CURRENT_DATE / NOW() evaluate at the pinned
    instant, and a column named `now` is NOT clobbered."""
    from xtdb_spark.sql.rewriter import apply_clock, rewrite_and_run

    xt = make_xt(spark, tmp_path)
    r = rewrite_and_run(
        xt, "SETTING CLOCK_TIME TO TIMESTAMP '2024-05-04 12:30:00' "
            "SELECT CURRENT_TIMESTAMP AS ts, CURRENT_DATE AS d, "
            "NOW() AS n").collect()[0]
    assert str(r["ts"]) == "2024-05-04 12:30:00"
    assert str(r["d"]) == "2024-05-04"
    assert str(r["n"]) == "2024-05-04 12:30:00"
    # combined with a DEFAULT option after a comma
    xt.store.put("ck_docs", [{"_id": 1, "name": "a"}],
                 system_from="2024-01-01")
    r2 = rewrite_and_run(
        xt, "SETTING CLOCK_TIME TO TIMESTAMP '2024-05-04 12:30:00', "
            "DEFAULT SYSTEM_TIME TO AS OF '2024-06-01' "
            "SELECT name, CURRENT_DATE AS d FROM ck_docs").collect()[0]
    assert (r2["name"], str(r2["d"])) == ("a", "2024-05-04")
    # identifier `now` without parens is left alone
    assert "now" in apply_clock("SELECT now FROM t", "2024-05-04")
    assert "TIMESTAMP" in apply_clock("SELECT now() FROM t",
                                      "2024-05-04 00:00:00")


def test_create_table_and_roles(spark, tmp_path):
    """CREATE [OR ALTER] TABLE (Sql.g4:61 — catalog metadata; types
    arrive with the first INSERT) and GRANT/REVOKE role membership
    (Sql.g4:58-59, surfaced via pg_roles/pg_auth_members)."""
    from xtdb_spark.sql.rewriter import rewrite_and_run

    xt = make_xt(spark, tmp_path)
    assert rewrite_and_run(xt, "CREATE TABLE fresh (a, b)") is None
    assert "fresh" in xt.store.tables()
    # declared-but-empty table scans as an empty relation
    rows = rewrite_and_run(xt, "SELECT * FROM fresh").collect()
    assert rows == []
    assert xt.store.declared_columns("fresh") == ["a", "b"]
    # types spring from the first INSERT, as before
    rewrite_and_run(xt, "INSERT INTO fresh (_id, a) VALUES (1, 'x')")
    got = rewrite_and_run(xt, "SELECT a FROM fresh").collect()
    assert got[0]["a"] == "x"
    # CREATE OR ALTER re-registers without error
    rewrite_and_run(xt, "CREATE OR ALTER TABLE fresh (a, b, c)")

    rewrite_and_run(xt, "GRANT analyst TO erin")
    rewrite_and_run(xt, "GRANT admin TO erin")
    roles = {r["rolname"]: r["rolcanlogin"] for r in rewrite_and_run(
        xt, "SELECT rolname, rolcanlogin FROM pg_roles").collect()}
    assert roles["erin"] is True and roles["analyst"] is False
    n = rewrite_and_run(
        xt, "SELECT COUNT(*) AS n FROM pg_auth_members").collect()[0]["n"]
    assert n == 2
    rewrite_and_run(xt, "REVOKE admin FROM erin")
    assert xt.store.user_roles()["erin"] == ["analyst"]


def test_prepare_execute(spark, tmp_path):
    """PREPARE name AS <stmt> / EXECUTE name (args) (Sql.g4:37-38):
    session prepared statements with literal args bound to the
    ?-params in order — queries, temporal params, and DML."""
    from xtdb_spark.sql.rewriter import rewrite_and_run

    xt = make_xt(spark, tmp_path)
    xt.store.put("pe", [{"_id": 1, "v": 10}, {"_id": 2, "v": 20}],
                 system_from="2024-01-01")
    rewrite_and_run(xt, "PREPARE get_big AS "
                        "SELECT _id, v FROM pe WHERE v > ? ORDER BY _id")
    rows = rewrite_and_run(xt, "EXECUTE get_big (15)").collect()
    assert [(r["_id"], r["v"]) for r in rows] == [(2, 20)]
    rows = rewrite_and_run(xt, "EXECUTE get_big (5)").collect()
    assert len(rows) == 2

    # temporal param through EXECUTE
    xt.store.put("pe", [{"_id": 1, "v": 99}], system_from="2024-02-01")
    rewrite_and_run(xt, "PREPARE asof AS "
                        "SELECT v FROM pe FOR SYSTEM_TIME AS OF ? "
                        "WHERE _id = 1")
    rows = rewrite_and_run(xt, "EXECUTE asof ('2024-01-15')").collect()
    assert [r["v"] for r in rows] == [10]

    # prepared DML executes
    rewrite_and_run(xt, "PREPARE addrow AS "
                        "INSERT INTO pe (_id, v) VALUES (9, 90)")
    rewrite_and_run(xt, "EXECUTE addrow")
    assert xt.store.scan("pe").filter("_id = 9").count() == 1

    import pytest
    with pytest.raises(ValueError, match="does not exist"):
        rewrite_and_run(xt, "EXECUTE nope (1)")


def test_create_table_typed_columns_and_prepared_dml_over_wire(spark, tmp_path):
    """Review regressions: CREATE TABLE with TYPED column defs keeps
    only the names; EXECUTE of a prepared DML over pgwire completes
    with a tag instead of crashing on the returned tx time."""
    from xtdb_spark.sql.rewriter import rewrite_and_run

    xt = make_xt(spark, tmp_path)
    xt.sql = __import__("xtdb_spark.session",
                        fromlist=["XtdbSession"]).XtdbSession.sql.__get__(xt)
    rewrite_and_run(xt, 'CREATE TABLE typed (_id BIGINT, name TEXT, '
                        '"odd name" DOUBLE PRECISION)')
    assert xt.store.declared_columns("typed") == \
        ["_id", "name", "odd name"]
    rows = rewrite_and_run(xt, "SELECT _id, name FROM typed").collect()
    assert rows == []

    from xtdb_spark.pgwire import PgWireServer
    from tests.test_pgwire import PgClient

    srv = PgWireServer(xt, port=0).start()
    try:
        c = PgClient(srv.port)
        c.startup()
        c.query("PREPARE addone AS INSERT INTO typed (_id, name) "
                "VALUES (1, 'x')")
        _, tags = c.query("EXECUTE addone")
        assert tags == ["OK 0"]
        res, _ = c.query("SELECT name FROM typed")
        assert res[0][1] == [["x"]]
        c.close()
    finally:
        srv.stop()


def test_pg_catalog_full_surface(spark, tmp_path):
    """The remaining pg_catalog tables the reference models
    (information_schema.clj pg-catalog-tables): pg_database/pg_user/
    pg_am populated, pg_stat_user_tables with footer-derived row
    counts, and the empty-by-design probe targets."""
    from xtdb_spark.sql.rewriter import rewrite_and_run

    xt = make_xt(spark, tmp_path)
    xt.store.put("pgt", [{"_id": 1}, {"_id": 2}, {"_id": 3}])
    assert [r["amname"] for r in
            rewrite_and_run(xt, "SELECT amname FROM pg_am "
                                "ORDER BY oid").collect()] == \
        ["heap", "btree", "hash"]
    assert rewrite_and_run(
        xt, "SELECT datname FROM pg_catalog.pg_database"
    ).collect()[0]["datname"] == "xtdb"
    r = rewrite_and_run(
        xt, "SELECT relname, n_live_tup FROM pg_stat_user_tables "
            "WHERE relname = 'pgt'").collect()
    assert [(x["relname"], x["n_live_tup"]) for x in r] == [("pgt", 3)]
    for empty in ("pg_matviews", "pg_enum", "pg_constraint",
                  "pg_extension", "pg_attrdef"):
        assert rewrite_and_run(
            xt, f"SELECT count(*) AS n FROM {empty}"
        ).collect()[0]["n"] == 0
    assert rewrite_and_run(
        xt, "SELECT usesuper FROM pg_user WHERE usename = 'xtdb'"
    ).collect()[0]["usesuper"] is True


def test_xt_derived_tables(spark, tmp_path):
    """xt.live_tables / xt.live_columns / xt.metrics_* (reference
    information_schema.clj xt-derived-tables)."""
    from xtdb_spark.sql.rewriter import rewrite_and_run

    xt = make_xt(spark, tmp_path)
    xt.store.put("lv", [{"_id": 1, "v": "a"}, {"_id": 2, "v": "b"}])
    r = rewrite_and_run(
        xt, "SELECT table_name, row_count FROM xt.live_tables "
            "WHERE table_name = 'lv'").collect()
    assert [(x["table_name"], x["row_count"]) for x in r] == [("lv", 2)]
    cols = {x["col_name"] for x in rewrite_and_run(
        xt, "SELECT col_name FROM xt.live_columns "
            "WHERE table_name = 'lv'").collect()}
    assert {"_id", "v"} <= cols
    c = rewrite_and_run(
        xt, "SELECT count, tags.source AS src FROM xt.metrics_counters "
            "WHERE name = 'txs_committed'").collect()
    assert c[0]["count"] >= 1.0 and c[0]["src"] == "store"
    assert rewrite_and_run(
        xt, "SELECT count(*) AS n FROM xt.metrics_timers"
    ).collect()[0]["n"] == 0


def test_from_list_registration_gaps(spark, tmp_path):
    """Round-10 SLT-surfaced registration fixes: tables inside a
    parenthesized FROM relation, and after a FROM-list comma that
    follows a JOIN (with or without an intervening ON expression),
    must all resolve."""
    from xtdb_spark.sql.rewriter import rewrite_and_run

    xt = make_xt(spark, tmp_path)
    xt.store.put("fa", [{"_id": 1, "x": 1}])
    xt.store.put("fb", [{"_id": 2, "y": 2}])
    xt.store.put("fc", [{"_id": 3, "z": 3}])

    # parenthesized joined table: the FIRST table inside the parens
    r = rewrite_and_run(
        xt, "SELECT count(*) AS n FROM ( fa AS a CROSS JOIN fb b )"
    ).collect()
    assert r[0]["n"] == 1
    # comma-continuation directly after a JOIN's table
    r = rewrite_and_run(
        xt, "SELECT count(*) AS n FROM fa CROSS JOIN fb, fc"
    ).collect()
    assert r[0]["n"] == 1
    # comma-continuation after an ON expression
    r = rewrite_and_run(
        xt, "SELECT count(*) AS n "
            "FROM fa a JOIN fb b ON 1 IS NOT NULL, fc AS c"
    ).collect()
    assert r[0]["n"] == 1
    # expression commas after the FROM list must NOT re-enter table
    # parsing (GROUP/ORDER keywords end the list)
    r = rewrite_and_run(
        xt, "SELECT x, count(*) AS n FROM fa GROUP BY x, _id "
            "ORDER BY x, n").collect()
    assert r[0]["n"] == 1


def test_paren_join_then_fromlist_comma(spark, tmp_path):
    """Round-11 ADVICE: the '(' consumed by the parenthesized-join
    branch must stay visible to the main walk's depth counter — its
    matching ')' previously drove depth to -1 and discarded the open
    FROM list, so a comma-continued table after the paren group was
    never registered."""
    from xtdb_spark.sql.rewriter import rewrite_and_run

    xt = make_xt(spark, tmp_path)
    xt.store.put("fa", [{"_id": 1, "x": 1}])
    xt.store.put("fb", [{"_id": 2, "y": 2}])
    xt.store.put("fc", [{"_id": 3, "z": 3}])

    # paren-join followed by an outer FROM-list comma
    r = rewrite_and_run(
        xt, "SELECT count(*) AS n FROM (fa a JOIN fb b ON 1=1), fc"
    ).collect()
    assert r[0]["n"] == 1
    # same, with the comma-continued table carrying columns we select
    r = rewrite_and_run(
        xt, "SELECT a.x, c.z FROM (fa a JOIN fb b ON 1=1), fc c"
    ).collect()
    assert (r[0]["x"], r[0]["z"]) == (1, 3)
    # paren-join inside a subquery, outer FROM-list comma after it
    r = rewrite_and_run(
        xt, "SELECT count(*) AS n FROM "
            "(SELECT a.x FROM (fa a JOIN fb b ON 1=1)) s, fc"
    ).collect()
    assert r[0]["n"] == 1
    # doubly-nested parenthesized join: innermost first table must
    # register, and the trailing comma table too
    r = rewrite_and_run(
        xt, "SELECT count(*) AS n FROM "
            "((fa a JOIN fb b ON 1=1) JOIN fc c ON 1=1), fa z"
    ).collect()
    assert r[0]["n"] == 1


def test_tokenizer_scientific_notation():
    """Round-11 ADVICE: `1e5` must lex as ONE num token — the old
    pattern split it into num `1` + word `e5`, which the SLT int-div
    rewrite then mangled into SQL referencing a nonexistent column."""
    from xtdb_spark.sql.rewriter import _tokenize

    nums = [t for k, t in _tokenize("1e5 + 1.5e-3 - .5E+2 * 1.e5 / 7")
            if k == "num"]
    assert nums == ["1e5", "1.5e-3", ".5E+2", "1.e5", "7"]
    # E-strings and identifiers are untouched
    toks = _tokenize("e5 E'x' t1e5")
    assert ("word", "e5") in toks and ("word", "t1e5") in toks
    assert any(k == "str" for k, _ in toks)


def test_intdiv_scientific_notation(spark):
    """`SELECT 1e5 / 2` through the SLT int-div rewrite stays valid
    SQL (float literal -> runtime typeof guard takes the float-division
    branch, SQLite semantics)."""
    from xtdb_spark.slt.intdiv import rewrite_int_div

    out = rewrite_int_div("SELECT 1e5 / 2 AS r")
    assert "typeof(e5)" not in out
    r = spark.sql(out).collect()[0]["r"]
    assert r == 50000.0
    # int literals still truncate
    out2 = rewrite_int_div("SELECT 7 / 2 AS r")
    assert spark.sql(out2).collect()[0]["r"] == 3.0


def test_meta_switch_is_per_alias(spark, tmp_path):
    """ADVICE r11: one temporal reference used to switch EVERY scan
    to the meta-carrying view, so `SELECT *` leaked _valid_from etc.
    and an unrelated join side grew meta columns. Now: qualified
    temporal refs switch only their own alias's scan, and star
    expansion over a meta-switched scan is re-narrowed to document
    columns (the reference always excludes temporal columns from *,
    sql.clj table-info)."""
    xt = make_xt(spark, tmp_path)
    xt.store.put("mt_a", [{"_id": 1, "v": "x"}], system_from="2024-01-01")
    xt.store.put("mt_b", [{"_id": 1, "w": "y"}], system_from="2024-01-01")

    # bare * with a temporal WHERE ref: meta columns must NOT appear
    out = rewrite_sql(
        xt, "SELECT * FROM mt_a WHERE _valid_from < TIMESTAMP '2099-01-01'")
    assert sorted(out.columns) == ["_id", "v"]
    assert out.count() == 1

    # qualified star over the meta-switched alias: same narrowing
    out2 = rewrite_sql(
        xt, "SELECT a.* FROM mt_a a "
            "WHERE a._valid_from < TIMESTAMP '2099-01-01'")
    assert sorted(out2.columns) == ["_id", "v"]

    # join: only the referenced alias's scan is meta-switched — the
    # OTHER side's star stays its document columns
    out3 = rewrite_sql(
        xt, "SELECT b.*, a._valid_from AS vf FROM mt_a a "
            "JOIN mt_b b ON a._id = b._id")
    assert sorted(out3.columns) == ["_id", "vf", "w"]
    assert out3.count() == 1

    # explicit selection still works, and COUNT(*) is untouched
    out4 = rewrite_sql(
        xt, "SELECT COUNT(*) AS n FROM mt_a "
            "WHERE _system_from <= CURRENT_TIMESTAMP")
    assert out4.collect()[0]["n"] == 1


def test_meta_period_cols_still_queryable(spark, tmp_path):
    xt = make_xt(spark, tmp_path)
    xt.store.put("mt_c", [{"_id": 7, "v": 1}], system_from="2024-01-01")
    out = rewrite_sql(
        xt, "SELECT _id, _valid_from, _valid_to FROM mt_c")
    row = out.collect()[0]
    assert row["_id"] == 7 and row["_valid_from"] is not None


def test_bare_alias_derived_table_disables_null_missing(spark, tmp_path):
    """ADVICE r11: a BARE-alias derived table (`FROM (SELECT …) t1`,
    no AS) sharing a store-scan alias used to be invisible to the
    alias-redefinition guard, so its `t1.c` was NULLed instead of
    resolving to the subquery column."""
    xt = make_xt(spark, tmp_path)
    xt.store.put("t1", [{"_id": 1, "k": 1}], system_from="2024-01-01")
    out = rewrite_sql(
        xt, "SELECT (SELECT t1.c FROM (SELECT 5 AS c) t1) AS v FROM t1")
    assert [r["v"] for r in out.collect()] == [5]

    # the NULL-for-missing-key behavior itself still works
    out2 = rewrite_sql(xt, "SELECT t1.nosuchkey AS x FROM t1")
    assert [r["x"] for r in out2.collect()] == [None]
