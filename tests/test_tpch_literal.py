"""TPC-H LITERAL query-text + GOLDEN-RESULT parity: the reference's
own 22 query texts (src/test/resources/xtdb/sql/tpch/q01-22.sql —
FROM-first pipeline dialect, `_id`-keyed joins, read at runtime, not
vendored) run VERBATIM through `xt.sql` over dbgen data transformed
exactly like the reference's loader (modules/datasets tpch.clj:
IDENTIFIER→uuid, doc `_id` from the pk), compared against the
reference's OWN golden results (results-sf-001.edn, tpch_test.clj
is-equal? semantics: ordered rows, epsilon 0.001, null columns
absent).

Tiers (generator facts, not effort — see tools/tpch_literal.py):
- golden      — exact vs the reference's edn (19 of 22 at sf0.001)
- golden-mod  — exact after dropping the V-string/comment columns
  where airlift (golden's generator) deliberately deviates from C
  dbgen (our generator): q10 c_address, q15 s_address — projection
  text only, every other column exact
- duckdb      — q13 filters ON generated comment text, so golden is
  unreachable from dbgen data; instead DuckDB's own q13 runs over
  the identical tables and must agree exactly

This battery also locks the within-tx later-op-wins semantics: dbgen
sf0.001 partsupp has 100 duplicate composite keys and the golden
results only match when the LAST duplicate survives ingestion
(q09 sum_profit is the witness).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.tpch_literal import (REF_GOLDEN, REF_SQL_DIR,  # noqa: E402
                                dbgen_connection, load_store, run_battery)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_SQL_DIR) or not os.path.exists(REF_GOLDEN[0.001]),
    reason="reference TPC-H resources not present")

# the only acceptable non-exact tiers, with the generator fact that
# forces each (anything else failing the golden tier is a regression)
EXPECTED_TIERS = {
    10: "golden-mod",   # c_address: airlift V-string != dbgen V-string
    15: "golden-mod",   # s_address: same
    13: "duckdb",       # filters on o_comment (text pool diverges)
}


def test_literal_tpch_sf001_golden(spark, tmp_path):
    from xtdb_spark.session import XtdbSession

    xt = XtdbSession.__new__(XtdbSession)
    xt.spark = spark
    from xtdb_spark.tx import TableStore

    xt.store = TableStore(spark, str(tmp_path / "wh"))
    xt.sql = XtdbSession.sql.__get__(xt)
    xt.put = lambda t, rows: xt.store.put(t, rows)

    con = dbgen_connection(0.001)
    load_store(xt, 0.001, con=con)
    results = run_battery(xt, con, 0.001, verbose=False)
    assert set(results) == set(range(1, 23))
    bad = {n: r for n, r in results.items()
           if r[0] != EXPECTED_TIERS.get(n, "golden")}
    assert not bad, f"literal TPC-H regressions: {bad}"
