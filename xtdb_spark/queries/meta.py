"""Introspection + multimodal-plumbing catalog entries.

- src_info_schema_columns: the engine's information_schema.columns
  surface (reference core/src/main/clojure/xtdb/information_schema.clj
  :231-508) demonstrated over the testdata tables and cross-checked
  against DuckDB's own information_schema — an *independent* catalog
  implementation agreeing on (table, column, position).
- mm_media_features: the multimodal decode pipeline
  (xtdb_spark/pipeline/multimodal.py, mapInPandas over binary
  columns). The deterministic stub decoder is replicated in ANSI SQL
  so even the Python-UDF path is value-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from xtdb_spark.queries.registry import ld, register

_TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
           "lineitem", "events", "documents", "embeddings"]


@register(
    "src_info_schema_columns",
    f"""
    SELECT table_name, column_name, CAST(ordinal_position AS INTEGER)
             AS ordinal_position
    FROM information_schema.columns
    WHERE table_name IN ({', '.join(repr(t) for t in _TABLES)})
    ORDER BY table_name, ordinal_position
    """,
)
def info_schema_columns(spark, sf_dir):
    """information_schema.columns over the scanned tables: tiny
    driver-built metadata relation (the reference routes these
    through :scan the same way, information_schema.clj:231-508).
    Metadata-only — no data read beyond parquet footers."""
    rows = []
    for t in _TABLES:
        for i, name in enumerate(ld(spark, sf_dir, t).columns):
            rows.append((t, name, i + 1))
    return spark.createDataFrame(
        rows, "table_name string, column_name string, ordinal_position int")


@register(
    "mm_media_features",
    """
    WITH m AS (
      SELECT i AS media_id,
             CASE WHEN i % 3 = 0 THEN 'image'
                  WHEN i % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
             'media-payload-' || CAST(i AS VARCHAR)
               || repeat('x', CAST(i % 17 + 1 AS INT)) AS s
      FROM generate_series(0, 199) t(i))
    SELECT media_id, kind,
           CAST(length(s) AS BIGINT) AS n_bytes,
           md5(s) AS checksum,
           (length(s) + ascii(substr(s, 1, 1)) + ascii(substr(s, length(s), 1))
            + list_sum([ascii(c) FOR c IN string_split(substr(s, 1, 16), '')])
              % 256) / 4.0 AS feat_mean,
           4 AS feat_dim
    FROM m
    """,
)
def media_features(spark, sf_dir):
    """Multimodal decode/featurize over binary media columns via
    mapInPandas (arrow-batched). The stub decoder's byte-math is
    reproduced in the DuckDB oracle, so the whole Python-UDF payload
    path (binary column → pandas batch → struct rows) is
    value-checked, not just row-counted."""
    from xtdb_spark.pipeline.multimodal import extract_features, make_fake_media

    media = make_fake_media(spark, 200)
    # batch_size=None: don't shrink the session-wide arrow batch conf
    # inside a shared catalog run
    return extract_features(media, batch_size=None, fake_decode=True)


@register(
    "src_pg_catalog_attrs",
    f"""
    SELECT c.relname, a.attname, CAST(a.attnum AS INTEGER) AS attnum
    FROM pg_catalog.pg_attribute a
    JOIN pg_catalog.pg_class c ON a.attrelid = c.oid
    WHERE c.relname IN ({', '.join(repr(t) for t in _TABLES)})
      AND a.attnum > 0
    ORDER BY c.relname, attnum
    """,
)
def pg_catalog_attrs(spark, sf_dir):
    """pg_catalog.pg_class ⋈ pg_attribute (reference
    information_schema.clj:59-146 — the views `\\d` and ORM
    introspection read): per-table attribute rows keyed by a
    deterministic relation oid, cross-checked against DuckDB's own
    pg_catalog over the same tables. The store-backed implementation
    (sources/info_schema.py pg_class/pg_attribute/pg_namespace) is
    covered by tests/test_sql_rewriter.py."""
    rows = []
    for i, t in enumerate(_TABLES):
        oid = 16384 + i
        for j, name in enumerate(ld(spark, sf_dir, t).columns):
            rows.append((oid, t, name, j + 1))
    df = spark.createDataFrame(
        rows, "oid int, relname string, attname string, attnum int")
    cls = df.select("oid", "relname").distinct()
    att = df.select(F.col("oid").alias("attrelid"), "attname", "attnum")
    return (att.join(cls, att.attrelid == cls.oid)
            .select("relname", "attname", "attnum")
            .orderBy("relname", "attnum"))
