"""Subquery-in-JOIN-ON decorrelation (sql/decorr.py, round 12).

Execution coverage lives in tests/test_slt_direct.py (the
reference's own qualified_joins.test — 54/54 through this pass) and
the `sql_join_on_subquery` oracle entry; this file pins the
rewrite's SHAPE decisions: when it fires, what it emits, and the
conservative bails that keep it from ever touching a query Spark
could already run differently.
"""

import re

import pytest

from xtdb_spark.sql.decorr import decorrelate_join_on as D


def norm(s):
    return re.sub(r"\s+", " ", s).strip()


def test_left_join_scalar_subquery_rewrites():
    q = ("SELECT foo.x, bar.x bar_x FROM foo LEFT JOIN bar "
         "ON bar.x = (SELECT baz.x FROM baz WHERE baz.x = foo.x)")
    out = norm(D(q))
    assert "CROSS JOIN" in out
    assert "__dj_m.__djk_r = bar._id" in out
    assert "__dj_m.__djk_0 <=> foo._id" in out
    assert out.startswith("SELECT foo.x, bar.x bar_x FROM foo LEFT JOIN")
    # the condition moved into a WHERE inside the skeleton
    assert re.search(r"WHERE bar\.x = \(SELECT baz\.x", out)


def test_right_join_flips_to_left():
    q = ("SELECT foo.x, bar.x FROM foo RIGHT JOIN bar "
         "ON foo.x = (SELECT baz.x FROM baz)")
    out = norm(D(q))
    # preserved side leads; the probe side is spliced via the skeleton
    assert "FROM bar LEFT JOIN" in out
    assert "__dj_m.__djk_r = bar._id" in out


def test_chain_middle_join_rewrites_and_keeps_tail():
    q = ("SELECT foo.x, bar.x, baz.x, bibble.x FROM foo "
         "JOIN bar ON foo.x = bar.x "
         "RIGHT JOIN baz ON bar.x = (SELECT b.x FROM baz b) "
         "LEFT JOIN bibble ON bar.x = bibble.x")
    out = norm(D(q))
    assert "FROM baz LEFT JOIN" in out
    # both tree refs keyed
    assert "__dj_m.__djk_0 <=> foo._id" in out
    assert "__dj_m.__djk_1 <=> bar._id" in out
    # the tail join survives verbatim
    assert out.endswith("LEFT JOIN bibble ON bar.x = bibble.x")


@pytest.mark.parametrize("q", [
    # no subquery in ON — untouched
    "SELECT a.x FROM a LEFT JOIN b ON a.x = b.x WHERE b.y IN (SELECT 1)",
    # projection star — expansion would change
    "SELECT * FROM a LEFT JOIN b ON a.x = (SELECT 1)",
    "SELECT a.* FROM a LEFT JOIN b ON a.x = (SELECT 1)",
    # positional params — binding order/duplication
    "SELECT a.x FROM a LEFT JOIN b ON a.x = (SELECT c.x FROM c WHERE c.y = ?)",
    # FULL join — out of scope
    "SELECT a.x FROM a FULL JOIN b ON a.x = (SELECT 1)",
    # USING — out of scope
    "SELECT a.x FROM a LEFT JOIN b USING (x)",
    # set operation at top level
    "SELECT a.x FROM a JOIN b ON a.x = (SELECT 1) UNION SELECT 1",
    # derived preserved side without _id — no unique key
    "SELECT t.x FROM (SELECT y AS x FROM a) t LEFT JOIN b ON b.x = (SELECT 1)",
    # FROM-list continuation after the join
    "SELECT a.x FROM a LEFT JOIN b ON a.x = (SELECT 1), c",
    # temporal FOR clause on a ref
    ("SELECT a.x FROM a FOR VALID_TIME AS OF TIMESTAMP '2020-01-01' "
     "LEFT JOIN b ON a.x = (SELECT 1)"),
])
def test_bails_leave_sql_untouched(q):
    assert D(q) == q


def test_derived_refs_with_id_rewrite():
    q = ("SELECT foo.x, bar.x bar_x "
         "FROM (SELECT foo._id, foo.x FROM foo) AS foo "
         "LEFT JOIN (SELECT bar._id, bar.x FROM bar) AS bar "
         "ON bar.x = (SELECT baz.x FROM baz)")
    out = norm(D(q))
    assert "__dj_m" in out and "CROSS JOIN" in out
