"""Query catalog: every implemented operator exposed as a named query
over the driver's testdata tables, each paired (where SQL-expressible)
with an ANSI-SQL oracle string for the DuckDB cross-check.

This is the Spark analogue of the reference's operator test corpus
(reference src/test/clojure/xtdb/operator/*_test.clj + sqllogictest
runner, SURVEY.md §5): instead of literal expected rows we assert
equivalence against an independent engine on identical parquet.
"""

from xtdb_spark.queries.registry import QUERIES, oracle_map, query_map, register

# import for registration side effects
from xtdb_spark.queries import tpch  # noqa: F401
from xtdb_spark.queries import tpch2  # noqa: F401
from xtdb_spark.queries import operators  # noqa: F401
from xtdb_spark.queries import functions  # noqa: F401
from xtdb_spark.queries import functions2  # noqa: F401
from xtdb_spark.queries import bitemporal  # noqa: F401
from xtdb_spark.queries import timeseries  # noqa: F401
from xtdb_spark.queries import analytics  # noqa: F401
from xtdb_spark.queries import clickbench  # noqa: F401
from xtdb_spark.queries import dialect  # noqa: F401
from xtdb_spark.queries import pipeline  # noqa: F401
from xtdb_spark.queries import streaming  # noqa: F401
from xtdb_spark.queries import meta  # noqa: F401
from xtdb_spark.queries import xtql_entries  # noqa: F401

__all__ = ["QUERIES", "register", "query_map", "oracle_map"]
