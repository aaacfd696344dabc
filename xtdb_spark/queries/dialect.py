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


@register(
    "sql_star_exclude_rename",
    """
    SELECT n_nationkey, n_name AS nation_name
    FROM nation ORDER BY n_nationkey
    """,
)
def sql_star_exclude_rename(spark, sf_dir):
    """Select-star modifiers ``* EXCLUDE``/``* RENAME`` (reference
    Sql.g4:653-665 excludeClause/renameClause, executed by
    sql.clj:889-922) through the translator: EXCLUDE drops from the
    star expansion, RENAME re-labels — mapped to Spark's
    ``* EXCEPT (…)`` plus aliased re-adds; the oracle spells the
    surviving columns explicitly."""
    from xtdb_spark.sql.constructs import translate

    ld(spark, sf_dir, "nation").createOrReplaceTempView("xt_ser_nation")
    q = """
    SELECT n.* EXCLUDE (n_regionkey) RENAME (n_name AS nation_name)
    FROM xt_ser_nation n ORDER BY n_nationkey
    """
    return spark.sql(translate(q))


@register(
    "sql_from_first_pipeline",
    """
    SELECT * FROM (
      SELECT o_orderpriority, COUNT(*) AS n,
             ROUND(SUM(o_totalprice), 2) AS total
      FROM orders WHERE o_orderstatus = 'O'
      GROUP BY o_orderpriority
    ) q WHERE n > 10 ORDER BY o_orderpriority
    """,
)
def sql_from_first_pipeline(spark, sf_dir):
    """FROM-first query term with pipelined tails (reference
    Sql.g4:681-693 ``fromClause queryTail*``, folded left-to-right by
    sql.clj:2795-2809): ``FROM … WHERE … GROUP BY … SELECT …`` then a
    second WHERE over the projection — our fold keeps pre-projection
    tails in the same query block (from-aliases stay in scope) and
    wraps post-projection tails in derived tables."""
    from xtdb_spark.sql.constructs import translate

    ld(spark, sf_dir, "orders").createOrReplaceTempView("xt_ff_orders")
    q = """
    FROM xt_ff_orders o WHERE o.o_orderstatus = 'O'
    GROUP BY o_orderpriority
    SELECT o_orderpriority, COUNT(*) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    WHERE n > 10
    ORDER BY o_orderpriority
    """
    return spark.sql(translate(q))
