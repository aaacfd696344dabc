"""Driver contract for the spark-graft builder (PySpark target).

`queries()` / `oracle_sql()` are backed by the xtdb_spark query
catalog (xtdb_spark/queries/*) — one entry per implemented operator
from SURVEY.md §2, each oracle-checked against DuckDB where
SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q1 pricing
    summary (the reference's own golden-output headliner,
    src/test/clojure/xtdb/tpch_test.clj)."""
    from xtdb_spark.queries import QUERIES

    return QUERIES["tpch_q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from xtdb_spark.queries import query_map

    return query_map()


def oracle_sql() -> dict[str, str]:
    from xtdb_spark.queries import oracle_map

    return oracle_map()
