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
    from slt_random import TABLES

    from xtdb_spark.queries.registry import ld

    con = duckdb.connect()
    for t in TABLES:
        ld(spark, SF_DIR, t).createOrReplaceTempView(t)
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def test_random_sql_battery_matches_duckdb(spark, duck):
    from slt_random import run_battery

    failures = run_battery(spark, duck, n_queries=40, seed=20260813,
                           verbose=False)
    assert not failures, failures
