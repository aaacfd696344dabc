"""Automatic prefilter injection in the SQL path: selective
top-level WHERE conjuncts over temporal store tables become a
candidate-iid semi-join under the resolution window (the reference's
automatic bloom sideways pushdown, join.clj:172-226) — results
unchanged by construction, conservative bail-outs for every shape
the extractor can't prove."""

import pytest
from pyspark.sql import functions as F

from xtdb_spark.session import XtdbSession
from xtdb_spark.tx import TableStore


@pytest.fixture()
def xt(spark, tmp_path):
    s = XtdbSession.__new__(XtdbSession)
    s.spark = spark
    s.store = TableStore(spark, str(tmp_path / "wh"))
    s.sql = XtdbSession.sql.__get__(s)
    s.scan = XtdbSession.scan.__get__(s)
    s.store.put("ap", [{"_id": i, "x": i, "s": f"s{i % 3}"}
                       for i in range(300)], system_from="2024-01-01")
    s.store.put("ap", [{"_id": i, "x": i + 1000, "s": f"s{i % 3}"}
                       for i in range(100)], system_from="2024-06-01")
    s.store.put("ap_dim", [{"_id": i, "x": i, "grp": i % 5}
                           for i in range(50)], system_from="2024-01-01")
    return s


def _plan(df):
    return df._jdf.queryExecution().optimizedPlan().toString()


def _ids(df):
    return sorted(r["_id"] for r in df.collect())


def test_selective_conjunct_injects_semi_join(xt):
    # footer stats: _id = 7 ≈ 1/300 — well under the 0.5% threshold
    df = xt.sql("SELECT _id, x FROM ap WHERE _id = 7")
    assert "LeftSemi" in _plan(df)
    assert [(r["_id"], r["x"]) for r in df.collect()] == [(7, 1007)]
    # qualified by alias too
    df = xt.sql("SELECT a._id FROM ap AS a WHERE a._id = 7 "
                "AND a.x >= 0")
    assert "LeftSemi" in _plan(df)
    assert _ids(df) == [7]


def test_broad_conjunct_leaves_plain_scan(xt):
    df = xt.sql("SELECT _id FROM ap WHERE x >= 0")
    assert "LeftSemi" not in _plan(df)
    assert len(_ids(df)) == 300


def test_unsafe_shapes_bail_out(xt):
    # OR at conjunction level
    assert "LeftSemi" not in _plan(
        xt.sql("SELECT _id FROM ap WHERE _id = 7 OR _id = 9"))
    # two WHEREs (subquery scoping)
    assert "LeftSemi" not in _plan(
        xt.sql("SELECT _id FROM ap WHERE _id = (SELECT MIN(_id) "
               "FROM ap_dim WHERE x = 3)"))
    # unqualified conjunct with two relations: the extractor can't
    # know which table owns `grp` (Spark can — it's dim-only), so no
    # injection anywhere
    assert "LeftSemi" not in _plan(
        xt.sql("SELECT a._id FROM ap a JOIN ap_dim d ON a._id = d._id "
               "WHERE grp = 2"))
    # self-join with DISTINCT aliases: safe since the race fix —
    # each ref rewrites to its own query-unique __pf view, so a's
    # selective conjunct injects without touching b's scan (before
    # unique names, both refs shared one view and injection had to
    # bail). Results unchanged either way.
    df = xt.sql("SELECT a._id AS ia, b._id AS ib FROM ap a, ap b "
                "WHERE a._id = 7 AND b._id >= 0")
    assert "LeftSemi" in _plan(df)
    assert df.count() == 300


def test_prefilter_views_are_query_unique_no_interleave_race(xt):
    """Regression (round-9 ADVICE): an interleaved second rewrite of
    the same table+bounds must not replace the first query's
    prefiltered view. Rewrite A, then rewrite+run B with a different
    predicate, then run A's emitted SQL — before the query-unique
    __pf names, B's registration clobbered the shared view and A
    silently returned B's rows."""
    from xtdb_spark.sql.rewriter import rewrite

    sql_a = rewrite(xt, "SELECT _id FROM ap WHERE _id = 7")
    # interleaved query B on the same table+bounds, different filter
    assert _ids(xt.sql("SELECT _id FROM ap WHERE _id = 9")) == [9]
    df_a = xt.spark.sql(sql_a)
    assert "__pf" in sql_a
    assert _ids(df_a) == [7]
    # the shared plain view stays a full scan for non-injected users
    assert len(_ids(xt.sql("SELECT _id FROM ap WHERE x >= 0"))) == 300


def test_qualified_conjuncts_attribute_per_table(xt):
    # d.grp = 2 is selective on the dim per footer stats (1/5 > 0.5%
    # → actually broad); a._id = 7 is selective on the fact
    df = xt.sql("SELECT a._id FROM ap a JOIN ap_dim d "
                "ON a._id = d._id WHERE a._id = 7 AND d.grp >= 0")
    assert "LeftSemi" in _plan(df)
    assert _ids(df) == [7]


def test_temporal_bounds_compose_with_injection(xt):
    df = xt.sql("SELECT _id, x FROM ap FOR SYSTEM_TIME AS OF "
                "TIMESTAMP '2024-03-01' WHERE _id = 7")
    assert "LeftSemi" in _plan(df)
    assert [(r["_id"], r["x"]) for r in df.collect()] == [(7, 7)]


def test_temporal_column_predicates_never_inject(xt):
    # only ALL-history scans expose temporal columns to SQL; scan()'s
    # prefilter guard rejects them (resolution rewrites them) and the
    # injector falls back to the plain view — the query still runs
    df = xt.sql("SELECT _id FROM ap FOR ALL SYSTEM_TIME "
                "WHERE _system_from <= TIMESTAMP '2030-01-01' "
                "AND _id = 7")
    # plan-text LeftSemi is no longer a valid injection proxy — the
    # polygon fast-path eligibility routing adds its own semi/anti
    # joins on _iid; the injection diagnostic is authoritative
    from xtdb_spark.sql.rewriter import LAST_PREFILTERS

    assert LAST_PREFILTERS == []
    assert _ids(df) == [7, 7]          # both versions of id 7


def test_kill_switch(xt):
    xt.store.sql_auto_prefilter = False
    try:
        df = xt.sql("SELECT _id FROM ap WHERE _id = 7")
        assert "LeftSemi" not in _plan(df)
        assert _ids(df) == [7]
    finally:
        xt.store.sql_auto_prefilter = True


def test_results_identical_on_off_battery(xt):
    queries = [
        "SELECT _id, x FROM ap WHERE _id = 7",
        "SELECT _id FROM ap WHERE x = 1007",
        "SELECT _id FROM ap WHERE _id <= 3 AND s = 's1'",
        "SELECT a._id FROM ap a JOIN ap_dim d ON a._id = d._id "
        "WHERE a._id = 7",
        "SELECT _id FROM ap FOR SYSTEM_TIME AS OF "
        "TIMESTAMP '2024-03-01' WHERE _id = 250",
    ]
    for q in queries:
        on = sorted(map(tuple, xt.sql(q).collect()))
        xt.store.sql_auto_prefilter = False
        try:
            off = sorted(map(tuple, xt.sql(q).collect()))
        finally:
            xt.store.sql_auto_prefilter = True
        assert on == off, q
