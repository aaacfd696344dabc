"""xtdb_spark — a PySpark-native bitemporal analytics engine.

A from-scratch rebuild of the query & data-processing capabilities of
XTDB v2 (reference: /root/reference, an Arrow-based single-node
bitemporal SQL engine) re-expressed Spark-first:

- tables are parquet event logs with bitemporal columns
  (`_iid _valid_from _valid_to _system_from op`), resolved at scan
  time by window computations instead of XTDB's Polygon/Ceiling
  cursor kernels (reference core/src/main/kotlin/xtdb/bitemporal/Polygon.kt)
- the relational operator surface (reference
  core/src/main/clojure/xtdb/operator/*.clj) maps onto the DataFrame
  API so Catalyst/Tungsten/AQE pick physical strategies
- scale-out (shuffle, spill, broadcast, skew) is delegated to Spark —
  the reference is single-threaded by design (SURVEY.md §3).

Public entry points:
    from xtdb_spark import connect
    xt = connect()                       # tuned SparkSession wrapper
    xt.put("users", rows)                # bitemporal event append
    xt.scan("users")                     # current-state DataFrame
    xt.scan("users", valid_time=..., system_time=...)
    xt.sql("SELECT ... FOR VALID_TIME AS OF ...")
"""

from xtdb_spark.session import build_spark, connect, XtdbSession

__version__ = "0.1.0"

__all__ = ["build_spark", "connect", "XtdbSession", "__version__"]
