"""SQL-surface scalar function registrations
(xtdb_spark/functions/sqlfns.py): raw SQL text resolves the xtdb
function family (age, range_bins, uri_*, parse_ident, keyword fns,
LOCAL_* forms, period bound predicates) as inlined JVM expressions."""

from xtdb_spark.session import XtdbSession
from xtdb_spark.tx import TableStore


def make_xt(spark, tmp_path):
    xt = XtdbSession.__new__(XtdbSession)
    xt.spark = spark
    xt.store = TableStore(spark, str(tmp_path / "wh"))
    xt.sql = XtdbSession.sql.__get__(xt)
    return xt


def test_age_and_range_bins(spark, tmp_path):
    xt = make_xt(spark, tmp_path)
    r = xt.sql("""
        SELECT age(TIMESTAMP '2024-03-10', TIMESTAMP '2022-01-25') AS a,
               age(TIMESTAMP '2022-01-25', TIMESTAMP '2024-03-10') AS neg,
               range_bins(TIMESTAMP '2024-01-15 10:37:00', 3600) AS bin
    """).collect()[0]
    assert (r["a"]["years"], r["a"]["months"], r["a"]["days"]) == (2, 1, 16)
    assert (r["neg"]["years"], r["neg"]["months"]) == (-2, -1)
    assert str(r["bin"]["_from"]).startswith("2024-01-15 10:00:00")
    assert str(r["bin"]["_to"]).startswith("2024-01-15 11:00:00")


def test_uri_accessors(spark, tmp_path):
    xt = make_xt(spark, tmp_path)
    r = xt.sql("""
        SELECT uri_scheme(u) AS s, uri_host(u) AS h, uri_port(u) AS p,
               uri_path(u) AS pa, uri_query(u) AS q,
               uri_fragment(u) AS f, uri_user_info(u) AS ui
        FROM (SELECT 'https://bob@example.com:8443/a/b?x=1#top' AS u)
    """).collect()[0]
    assert (r["s"], r["h"], r["p"], r["pa"], r["q"], r["f"], r["ui"]) == \
        ("https", "example.com", 8443, "/a/b", "x=1", "top", "bob")


def test_pg_and_keyword_fns(spark, tmp_path):
    xt = make_xt(spark, tmp_path)
    r = xt.sql("""
        SELECT parse_ident('public."My Table"') AS pi,
               quote_ident('My Table') AS qi, quote_ident('ok_name') AS qi2,
               col_description(1, 2) AS cd,
               namespace('xt/id') AS ns, local_name('xt/id') AS ln,
               local_name('bare') AS ln2,
               lower_inf(named_struct('_from', CAST(NULL AS TIMESTAMP),
                                      '_to', TIMESTAMP '2024-01-01')) AS li,
               upper_inf(named_struct('_from', TIMESTAMP '2024-01-01',
                                      '_to', CAST(NULL AS TIMESTAMP))) AS ui
    """).collect()[0]
    assert list(r["pi"]) == ["public", "My Table"]
    assert r["qi"] == '"My Table"' and r["qi2"] == "ok_name"
    assert r["cd"] is None
    assert (r["ns"], r["ln"], r["ln2"]) == ("xt", "id", "bare")
    assert r["li"] is True and r["ui"] is True


def test_local_forms(spark, tmp_path):
    xt = make_xt(spark, tmp_path)
    r = xt.sql("SELECT local_timestamp() AS ts, local_date() AS d, "
               "local_time() AS t").collect()[0]
    assert r["ts"] is not None and r["d"] is not None
    assert len(r["t"]) == 8  # HH:mm:ss
