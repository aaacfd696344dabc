"""Randomized SLT battery in the test suite (seeded, so
deterministic in CI): 40 generated ANSI-SQL queries run on both
Spark and DuckDB over sf0.001, value-hash compared. The reference's
sqllogictest analogue (SURVEY §5); the full battery is
`python tools/slt_random.py 100 <seed>`."""

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo/tools")

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck(spark):
    from slt_random import register_views

    con = duckdb.connect()
    register_views(spark, con, SF_DIR)
    return con


def test_random_sql_battery_matches_duckdb(spark, duck):
    from slt_random import run_battery

    failures = run_battery(spark, duck, n_queries=40, seed=20260813,
                           verbose=False)
    assert not failures, failures
