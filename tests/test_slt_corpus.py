"""Reference SLT corpus battery (CI-scale sample).

Runs the reference's own sqllogictest files VERBATIM through the SLT
adapter (xtdb_spark/slt/) — the reference's main correctness battery
(its CI: slt.yml + build.gradle.kts:722-767). CI-mode here samples:
xtdb.test fully (41 queries, the reference-authored file) plus a
bounded query-prefix of one file per corpus class; the full sampled
corpus runs in the round-close soak (tools/slt_run.py, results in
COVERAGE.md).

Budgets: the reference's OWN gate allows 295 failures / 4 errors
over its slt-test file set and 10 failures over its index set; this
battery requires ZERO failures and ZERO errors on the sampled
prefixes — the round-10 fixes (spaced CAST, unary plus, FROM-list
registration, int-div folding, non-ANSI NULL semantics) made the
sampled files fully clean, so any regression fails loudly.
"""

import os

import pytest

CORPUS = "/root/reference/sqlite-test"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(CORPUS), reason="reference SLT corpus not present")


def _run(spark, path, limit=None):
    import tempfile

    from xtdb_spark.slt.runner import run_files

    res = run_files(spark, [os.path.join(CORPUS, path)], threads=1,
                    query_limit=limit,
                    warehouse_root=tempfile.mkdtemp(prefix="slt_ci_"),
                    collect_failures=3)
    return res[0]


def test_xtdb_test_full(spark):
    r = _run(spark, "xtdb.test")
    assert (r["failure"], r["error"]) == (0, 0), r.get("failures")
    assert r["success"] == 41


@pytest.mark.parametrize("path,limit", [
    ("random/aggregates/slt_good_0.test", 250),
    ("random/select/slt_good_0.test", 250),
    ("random/groupby/slt_good_0.test", 250),
    # random/expr: the dir the reference's own CI DISABLES (62-error
    # budget, slt.yml:18) — clean here since the round-11 static
    # int-ness analysis
    ("random/expr/slt_good_0.test", 250),
    ("random/expr/slt_good_57.test", 250),
    ("index/random/10/slt_good_0.test", 250),
    ("index/between/1/slt_good_0.test", 250),
    ("index/commute/10/slt_good_0.test", 250),
    ("index/commute/100/slt_good_0.test", 250),
    ("index/orderby/10/slt_good_0.test", 250),
    # round 12: prefixes for every remaining full-dir-soaked class,
    # so a regression in a newly-clean surface fails fast in CI
    ("index/orderby_nosort/10/slt_good_0.test", 250),
    ("index/orderby_nosort/100/slt_good_0.test", 250),
    ("index/delete/10/slt_good_0.test", 250),
    ("index/view/10/slt_good_1.test", 250),
    ("select2.test", 250),
])
def test_corpus_prefix_clean(spark, path, limit):
    r = _run(spark, path, limit=limit)
    assert (r["failure"], r["error"]) == (0, 0), \
        (path, r.get("failures"))
    assert r["queries_run"] > 0
