"""Catalog entries exercising the SQL DIALECT surface itself: the
query text goes through `sql/constructs.py` translation and
`spark.sql`, not the DataFrame API — so the translator sits under
the driver's DuckDB value-hash gate, with the oracle written in
DuckDB's native spellings (struct literals, 1-based subscripts, raw
period comparisons)."""

from __future__ import annotations

from xtdb_spark.queries.registry import ld, register


@register(
    "sql_dialect_battery",
    """
    SELECT COUNT(CASE WHEN ts <= TIMESTAMP '2024-01-15'
                       AND TIMESTAMP '2024-01-15' < ts + INTERVAL 3 DAY
                      THEN 1 END) AS n_contains,
           COUNT(CASE WHEN ts < TIMESTAMP '2024-01-20'
                       AND TIMESTAMP '2024-01-10' < ts + INTERVAL 2 DAY
                      THEN 1 END) AS n_overlaps,
           COUNT(CASE WHEN ts + INTERVAL 2 DAY < TIMESTAMP '2024-01-05'
                      THEN 1 END) AS n_precedes,
           MAX(({'k': 7, 's': 'x'}).k) AS obj_field,
           MAX([10, 20, 30][2]) AS arr_elem
    FROM events
    """,
)
def sql_dialect_battery(spark, sf_dir):
    """XTDB dialect constructs end-to-end through the SQL string
    surface: PERIOD constructors + CONTAINS/OVERLAPS/STRICTLY
    PRECEDES infix predicates, object literals with field access,
    array literals with element extraction — translated by
    sql/constructs.py (reference Sql.g4:227-243,283+,370-371,
    386-393) and verified against DuckDB's native spellings of the
    same computations."""
    from xtdb_spark.sql.constructs import translate

    ld(spark, sf_dir, "events").createOrReplaceTempView("xt_dialect_events")
    q = """
    SELECT COUNT(CASE WHEN PERIOD(ts, ts + INTERVAL 3 DAY)
                          CONTAINS TIMESTAMP '2024-01-15'
                      THEN 1 END) AS n_contains,
           COUNT(CASE WHEN PERIOD(ts, ts + INTERVAL 2 DAY) OVERLAPS
                          PERIOD(TIMESTAMP '2024-01-10',
                                 TIMESTAMP '2024-01-20')
                      THEN 1 END) AS n_overlaps,
           COUNT(CASE WHEN PERIOD(ts, ts + INTERVAL 2 DAY)
                          STRICTLY PRECEDES
                          PERIOD(TIMESTAMP '2024-01-05', NULL)
                      THEN 1 END) AS n_precedes,
           MAX(({k: 7, s: 'x'}).k) AS obj_field,
           MAX(element_at([10, 20, 30], 2)) AS arr_elem
    FROM xt_dialect_events
    """
    return spark.sql(translate(q))
