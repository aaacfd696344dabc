"""information_schema / pg_catalog views.

Reference: core/src/main/clojure/xtdb/information_schema.clj:59-146
(schemas), :231-508 (generators) — information_schema.{tables,columns,
schemata}, pg_catalog.{pg_tables,pg_type,pg_class,pg_attribute}, plus
xt.* introspection tables, all routed through :scan
(operator/scan.clj:277-285).

Spark design: tiny DataFrames built from the TableStore manifest +
each table's merged parquet schema; registered as temp views so
`spark.sql("SELECT * FROM information_schema_tables")` works. (Dots
aren't legal in Spark temp-view names, so views use `_` separators —
the SQL rewriter maps the dotted spellings.)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from xtdb_spark.bitemporal import META_COLS

_PG_TYPE_MAP = {
    "bigint": ("int8", 20), "int": ("int4", 23), "smallint": ("int2", 21),
    "double": ("float8", 701), "float": ("float4", 700),
    "string": ("text", 25), "boolean": ("bool", 16),
    "timestamp": ("timestamp", 1114), "timestamp_ntz": ("timestamp", 1114),
    "date": ("date", 1082), "binary": ("bytea", 17),
}


def _tables(store) -> list[tuple[str, str]]:
    out = []
    if os.path.isdir(store.warehouse):
        for d in sorted(os.listdir(store.warehouse)):
            if os.path.isdir(os.path.join(store.warehouse, d)):
                name = d.replace("__", ".")
                schema, _, tbl = name.rpartition(".")
                out.append((schema or "public", tbl))
    return out


def information_schema_tables(spark: SparkSession, store) -> DataFrame:
    rows = [(("xtdb"), s, t, "BASE TABLE") for s, t in _tables(store)]
    return spark.createDataFrame(
        rows or [("xtdb", "", "", "")],
        "table_catalog string, table_schema string, table_name string, "
        "table_type string").filter("table_name != ''")


def information_schema_columns(spark: SparkSession, store) -> DataFrame:
    rows = []
    for s, t in _tables(store):
        full = f"{s}.{t}" if s != "public" else t
        df = store.events(full)
        for i, f in enumerate(df.schema.fields):
            if f.name in META_COLS and f.name != "_iid":
                continue
            rows.append(("xtdb", s, t, f.name, i + 1,
                         f.dataType.simpleString(), f.nullable))
    return spark.createDataFrame(
        rows or [("", "", "", "", 0, "", True)],
        "table_catalog string, table_schema string, table_name string, "
        "column_name string, ordinal_position int, data_type string, "
        "is_nullable boolean").filter("table_name != ''")


def information_schema_schemata(spark: SparkSession, store) -> DataFrame:
    schemas = sorted({s for s, _ in _tables(store)} | {"public", "information_schema",
                                                       "pg_catalog"})
    return spark.createDataFrame([("xtdb", s) for s in schemas],
                                 "catalog_name string, schema_name string")


def pg_tables(spark: SparkSession, store) -> DataFrame:
    return spark.createDataFrame(
        [(s, t, "xtdb") for s, t in _tables(store)] or [("", "", "")],
        "schemaname string, tablename string, tableowner string"
    ).filter("tablename != ''")


def pg_type(spark: SparkSession, store=None) -> DataFrame:
    rows = [(oid, name) for _, (name, oid) in sorted(_PG_TYPE_MAP.items())]
    return spark.createDataFrame(rows, "oid int, typname string").distinct()


def xt_table_stats(spark: SparkSession, store) -> DataFrame:
    """Storage introspection: per-table file/byte/event counts — the
    analogue of the reference's `xt.trie_stats` / `xt.live_tables`
    views (information_schema.clj:231-508). Counts come from the
    filesystem manifest, not a scan."""
    rows = []
    for s, t in _tables(store):
        full = f"{s}.{t}" if s != "public" else t
        d = store._path(full)
        files = [f for f in os.listdir(d) if f.endswith(".parquet")] \
            if os.path.isdir(d) else []
        n_bytes = sum(os.path.getsize(os.path.join(d, f)) for f in files)
        n_events = store.events(full).count()
        rows.append((s, t, len(files), n_bytes, n_events))
    return spark.createDataFrame(
        rows or [("", "", 0, 0, 0)],
        "schema string, table_name string, n_files int, n_bytes long, "
        "n_events long").filter("table_name != ''")


def register_all(spark: SparkSession, store) -> None:
    """Register every introspection view (underscore spellings)."""
    information_schema_tables(spark, store) \
        .createOrReplaceTempView("information_schema_tables")
    information_schema_columns(spark, store) \
        .createOrReplaceTempView("information_schema_columns")
    information_schema_schemata(spark, store) \
        .createOrReplaceTempView("information_schema_schemata")
    pg_tables(spark, store).createOrReplaceTempView("pg_catalog_pg_tables")
    pg_type(spark).createOrReplaceTempView("pg_catalog_pg_type")
    xt_table_stats(spark, store).createOrReplaceTempView("xt_table_stats")
