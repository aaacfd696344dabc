"""ClickBench LITERAL query-text parity: the reference's own 43
bench queries (modules/bench/src/main/resources/xtdb/bench/
clickbench.sql — read at runtime, not vendored) run VERBATIM through
`xt.sql` over a synthesized hits-schema store table, cross-checked
against DuckDB on the same rows.

This upgrades the cb_* shape battery (queries/clickbench.py): there
the SHAPES are oracle-checked on the driver's synthetic tables; here
the exact reference SQL — `FOR ALL VALID_TIME`, unquoted
`DATE_TRUNC(minute, …)`, derived-table column aliases `(SELECT 1) AS
t (one)`, deep OFFSETs — must parse, plan, and agree with DuckDB.

Comparison tiers (determinism, not effort):
- queries with NO LIMIT → full sorted-row value comparison (ties in
  ORDER BY don't matter once rows are sorted);
- queries with LIMIT → row-count comparison (count-tied top-k
  boundaries legitimately differ between engines);
- q24 (SELECT *: the store exposes extra meta columns) and q29
  (regex replacement backreference spelling differs between Java
  and RE2) → row-count comparison, documented.
"""

import datetime as dt
import math
import os
import re

import numpy as np
import pytest

from xtdb_spark.session import XtdbSession
from xtdb_spark.tx import TableStore

REF_SQL = ("/root/reference/modules/bench/src/main/resources/"
           "xtdb/bench/clickbench.sql")

N = 300_000
SEED = 42

# queries whose result SET is nondeterministic (LIMIT with count
# ties) or engine-incomparable → row-count tier. Everything else is
# fully value-compared.
COUNT_ONLY_REASON = {
    "q24": "SELECT *: store exposes _id/meta columns",
    "q29": r"Java vs RE2 replacement: '\1' is a literal in Spark",
}


def _queries():
    txt = open(REF_SQL).read()
    out = {}
    for m in re.finditer(r"--\s*:name\s+(q\d+)[^\n]*\n(.*?)(?=\n--|\Z)",
                         txt, re.DOTALL):
        out[m.group(1)] = m.group(2).strip().rstrip(";")
    return out


def _gen_hits():
    rng = np.random.default_rng(SEED)
    n = N
    counter_id = np.where(rng.random(n) < 0.5, 62,
                          rng.integers(1, 100, n))
    day = rng.integers(0, 46, n)          # 2013-07-01 .. 2013-08-15
    base = dt.date(2013, 7, 1).toordinal()
    event_date = [dt.date.fromordinal(base + int(d)) for d in day]
    secs = rng.integers(0, 86_400, n)
    event_time = [dt.datetime.combine(d, dt.time()) +
                  dt.timedelta(seconds=int(s))
                  for d, s in zip(event_date, secs)]
    user_id = rng.integers(1, 50_000, n).astype("int64") * 977
    user_id[0] = 435090932899640449      # q20's point lookup
    phrase_pool = np.array([f"phrase {i}" for i in range(300)])
    search_phrase = np.where(rng.random(n) < 0.6, "",
                             phrase_pool[rng.integers(0, 300, n)])
    adv = np.where(rng.random(n) < 0.8, 0, rng.integers(1, 10, n))
    urls = np.array(
        [f"http://site{i % 40}.com/page{i}" for i in range(500)]
        + [f"http://www.google.com/search{i}" for i in range(25)]
        + [f"http://maps.google.de/view{i}" for i in range(10)])
    url = urls[rng.integers(0, len(urls), n)]
    titles = np.array([f"Title {i}" for i in range(200)]
                      + [f"Google results {i}" for i in range(10)])
    title = titles[rng.integers(0, len(titles), n)]
    # q29 needs one referer domain crossing HAVING COUNT(*) > 100000
    ref_pool = np.array(["http://www.big-domain.com/a"]
                        + [f"http://dom{i}.org/p{i}" for i in range(60)])
    ref_idx = np.where(rng.random(n) < 0.5, 0,
                       rng.integers(1, len(ref_pool), n))
    referer = np.where(rng.random(n) < 0.1, "", ref_pool[ref_idx])
    url_hash = rng.integers(1, 1_000_000, n).astype("int64")
    url_hash[rng.random(n) < 0.01] = 2868770270353813622
    referer_hash = rng.integers(1, 1_000_000, n).astype("int64")
    referer_hash[rng.random(n) < 0.01] = 3594120000172545465
    import pandas as pd

    return pd.DataFrame({
        "_id": np.arange(n, dtype="int64"),
        "counter_id": counter_id.astype("int64"),
        "event_date": event_date,
        "event_time": event_time,
        "user_id": user_id,
        "search_phrase": search_phrase,
        "adv_engine_id": adv.astype("int64"),
        "resolution_width": rng.integers(800, 2561, n).astype("int64"),
        "region_id": rng.integers(1, 51, n).astype("int64"),
        "mobile_phone": rng.integers(0, 6, n).astype("int64"),
        "mobile_phone_model": np.where(
            rng.random(n) < 0.5, "",
            np.array([f"model-{i}" for i in range(20)])[
                rng.integers(0, 20, n)]),
        "search_engine_id": rng.integers(0, 6, n).astype("int64"),
        "url": url,
        "title": title,
        "referer": referer,
        "client_ip": rng.integers(0, 100_000, n).astype("int64"),
        "watch_id": rng.integers(0, 10_000_000, n).astype("int64"),
        "is_refresh": (rng.random(n) < 0.1).astype("int64"),
        "dont_count_hits": (rng.random(n) < 0.1).astype("int64"),
        "is_link": (rng.random(n) < 0.3).astype("int64"),
        "is_download": (rng.random(n) < 0.05).astype("int64"),
        "trafic_source_id": rng.integers(-1, 11, n).astype("int64"),
        "url_hash": url_hash,
        "referer_hash": referer_hash,
        "window_client_width": (rng.integers(0, 10, n) * 100 + 800)
        .astype("int64"),
        "window_client_height": (rng.integers(0, 10, n) * 100 + 600)
        .astype("int64"),
    })


@pytest.fixture(scope="module")
def hits(spark, tmp_path_factory):
    if not os.path.exists(REF_SQL):
        pytest.skip("reference clickbench.sql not present")
    pdf = _gen_hits()
    xt = XtdbSession.__new__(XtdbSession)
    xt.spark = spark
    xt.store = TableStore(
        spark, str(tmp_path_factory.mktemp("cbwh") / "wh"))
    xt.sql = XtdbSession.sql.__get__(xt)
    sdf = spark.createDataFrame(pdf)
    xt.store.put("hits", sdf)

    import duckdb

    con = duckdb.connect()
    con.register("hits", pdf.drop(columns=["_id"]))
    return xt, con


def _norm(v):
    if isinstance(v, float):
        return round(v, 6)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None)
    return v


def _key(row):
    return tuple((x is None, str(type(x)), str(_norm(x)))
                 for x in row)


def _close(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return (math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
                or (math.isnan(a) and math.isnan(b)))
    return _norm(a) == _norm(b)


def _rows_equal(sp, du):
    if len(sp) != len(du):
        return False
    for r1, r2 in zip(sorted(sp, key=_key), sorted(du, key=_key)):
        if len(r1) != len(r2):
            return False
        if not all(_close(a, b) for a, b in zip(r1, r2)):
            return False
    return True


def test_all_43_reference_queries_run_and_agree(hits):
    xt, con = hits
    from xtdb_spark.sql.constructs import _quote_date_trunc

    qs = _queries()
    assert len(qs) == 43
    value_checked = count_checked = 0
    failures = []
    for name, sql in sorted(qs.items(), key=lambda kv: int(kv[0][1:])):
        sp_rows = [tuple(r) for r in xt.sql(sql).collect()]
        duck_sql = _quote_date_trunc(
            re.sub(r"\bFOR\s+ALL\s+VALID_TIME\b", "", sql,
                   flags=re.IGNORECASE))
        du_rows = con.execute(duck_sql).fetchall()
        has_limit = re.search(r"\bLIMIT\b", sql, re.IGNORECASE)
        if name in COUNT_ONLY_REASON or has_limit:
            ok = len(sp_rows) == len(du_rows)
            count_checked += 1
        else:
            ok = _rows_equal(sp_rows, du_rows)
            value_checked += 1
        if not ok:
            failures.append(
                (name, len(sp_rows), len(du_rows),
                 sp_rows[:2], du_rows[:2]))
    assert not failures, failures
    # the deterministic tier must stay meaningfully large
    assert value_checked >= 10 and value_checked + count_checked == 43


def test_point_lookup_and_scalar_aggs_nonempty(hits):
    """The synthesized data exercises the queries' literals: the q20
    point user exists, the q37-style counter-62 July window is
    populated, and the LIKE scans actually match."""
    xt, _ = hits
    qs = _queries()
    assert len(xt.sql(qs["q20"]).collect()) >= 1
    assert xt.sql(qs["q21"]).collect()[0][0] > 0       # %google%
    assert len(xt.sql(qs["q37"]).collect()) == 10      # July window
    assert len(xt.sql(qs["q28"]).collect()) >= 1       # HAVING >100k
