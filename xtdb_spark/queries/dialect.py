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


@register(
    "sql_series_table_ordinality",
    """
    SELECT s.v AS v, s.ord AS ord, COUNT(*) AS n
    FROM orders, (SELECT CAST(v AS BIGINT) AS v,
                         CAST((v - 2) / 2 + 1 AS INTEGER) AS ord
                  FROM generate_series(2, 6, 2) t(v)) s
    WHERE o_orderkey % s.v = 0
    GROUP BY s.v, s.ord ORDER BY v
    """,
)
def sql_series_table_ordinality(spark, sf_dir):
    """generate_series as a TABLE reference with WITH ORDINALITY
    (Sql.g4:547 GenerateSeriesTable; ordinality 1-based per
    operator/unnest.clj) → LATERAL posexplode lowering; oracle
    derives the ordinal arithmetically from the series values."""
    from xtdb_spark.sql.constructs import translate

    ld(spark, sf_dir, "orders").createOrReplaceTempView("xt_gs_orders")
    q = """
    SELECT CAST(g.v AS BIGINT) AS v, g.ord AS ord, COUNT(*) AS n
    FROM xt_gs_orders, generate_series(2, 6, 2)
         WITH ORDINALITY AS g(v, ord)
    WHERE o_orderkey % g.v = 0
    GROUP BY g.v, g.ord ORDER BY v
    """
    return spark.sql(translate(q))


@register(
    "sql_unnest_table_ordinality",
    """
    SELECT n_nationkey, n_nationkey AS v, 1 AS o FROM nation
    UNION ALL
    SELECT n_nationkey, CAST(n_regionkey AS BIGINT), 2 FROM nation
    ORDER BY n_nationkey, o
    """,
)
def sql_unnest_table_ordinality(spark, sf_dir):
    """UNNEST(expr) WITH ORDINALITY table reference (Sql.g4:546
    CollectionDerivedTable) → correlated LATERAL posexplode with the
    1-based ordinal re-added; oracle spells the two array positions
    as a UNION ALL."""
    from xtdb_spark.sql.constructs import translate

    ld(spark, sf_dir, "nation").createOrReplaceTempView("xt_un_nation")
    q = """
    SELECT n_nationkey, u.v AS v, u.o AS o
    FROM xt_un_nation,
         UNNEST(array(n_nationkey, CAST(n_regionkey AS BIGINT)))
         WITH ORDINALITY AS u(v, o)
    ORDER BY n_nationkey, o
    """
    return spark.sql(translate(q))


@register(
    "sql_quantified_comparisons",
    """
    SELECT c_mktsegment,
           COUNT(CASE WHEN c_acctbal > ANY (SELECT s_acctbal
                                            FROM supplier
                                            WHERE s_nationkey = 3)
                      THEN 1 END) AS n_any,
           COUNT(CASE WHEN c_acctbal >= ALL (SELECT s_acctbal
                                             FROM supplier
                                             WHERE s_nationkey = 3)
                      THEN 1 END) AS n_all,
           COUNT(CASE WHEN c_nationkey = SOME (SELECT n_regionkey
                                               FROM nation)
                      THEN 1 END) AS n_some
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def sql_quantified_comparisons(spark, sf_dir):
    """Quantified comparisons (Sql.g4:245; reference lowers ALL to
    NOT-negated-ANY over a mark-join, sql.clj:2127-2151) through the
    translator's 3VL-faithful scalar-aggregate lowering — DuckDB runs
    its NATIVE quantified operators as the oracle."""
    from xtdb_spark.sql.constructs import translate

    for t in ("customer", "supplier", "nation"):
        ld(spark, sf_dir, t).createOrReplaceTempView(f"xt_qc_{t}")
    q = """
    SELECT c_mktsegment,
           COUNT(CASE WHEN c_acctbal > ANY (SELECT s_acctbal
                                            FROM xt_qc_supplier
                                            WHERE s_nationkey = 3)
                      THEN 1 END) AS n_any,
           COUNT(CASE WHEN c_acctbal >= ALL (SELECT s_acctbal
                                             FROM xt_qc_supplier
                                             WHERE s_nationkey = 3)
                      THEN 1 END) AS n_all,
           COUNT(CASE WHEN c_nationkey = SOME (SELECT n_regionkey
                                               FROM xt_qc_nation)
                      THEN 1 END) AS n_some
    FROM xt_qc_customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """
    return spark.sql(translate(q))


@register(
    "sql_series_direction",
    """
    -- DuckDB's generate_series natively returns [] on wrong-direction
    -- ranges (the reference's semantics, generate_series_test.clj)
    SELECT len(generate_series(10, 3)) AS n_desc_nostep,
           len(generate_series(1, 5, -1)) AS n_wrong_step,
           len(generate_series(5, 1, -2)) AS n_desc_ok,
           len(generate_series(3, 3)) AS n_point,
           CAST(generate_series(4, 1, -1)[1] AS BIGINT) AS first_desc,
           len(range(4, 1)) AS n_range_desc,
           len(range(1, 4)) AS n_range_asc
    """,
)
def sql_series_direction(spark, sf_dir):
    """generate_series/range direction semantics through the dialect
    translator (round-7 fix: Spark's `sequence` auto-descends or
    throws where the reference returns [] — guarded lowering in
    sql/constructs.py:_guarded_seq, verified against DuckDB's native
    generate_series which shares the reference's semantics
    (generate_series_test.clj))."""
    from xtdb_spark.sql.constructs import translate

    q = """
    SELECT CAST(cardinality(generate_series(10, 3)) AS INT)
             AS n_desc_nostep,
           CAST(cardinality(generate_series(1, 5, -1)) AS INT)
             AS n_wrong_step,
           CAST(cardinality(generate_series(5, 1, -2)) AS INT)
             AS n_desc_ok,
           CAST(cardinality(generate_series(3, 3)) AS INT) AS n_point,
           CAST(element_at(generate_series(4, 1, -1), 1) AS BIGINT)
             AS first_desc,
           CAST(cardinality(range(4, 1)) AS INT) AS n_range_desc,
           CAST(cardinality(range(1, 4)) AS INT) AS n_range_asc
    """
    return spark.sql(translate(q))


@register(
    "sql_join_on_subquery",
    """
    SELECT n.n_name AS n_name, r.r_name AS r_name
    FROM nation n LEFT JOIN region r
      ON r.r_regionkey = (SELECT r2.r_regionkey FROM region r2
                          WHERE r2.r_regionkey = n.n_regionkey
                            AND n.n_nationkey < 10)
    ORDER BY n_name
    """,
)
def sql_join_on_subquery(spark, sf_dir):
    """Correlated scalar subquery in a JOIN ... ON condition — the
    reference decorrelates these through its apply rules (reference
    logical_plan.clj:991-1210); Spark rejects the category, so the
    dialect layer rewrites to the key-skeleton form (sql/decorr.py,
    round 12: matched-pair `_id` tuples computed under a WHERE —
    where Spark DOES evaluate correlated scalars — then equi-spliced
    back to restore outer-join multiplicity and NULL-extension).
    DuckDB decorrelates natively, so the oracle runs the same query
    verbatim."""
    from xtdb_spark.sql.decorr import decorrelate_join_on

    ld(spark, sf_dir, "nation").selectExpr(
        "n_nationkey AS _id", "n_name", "n_regionkey"
    ).createOrReplaceTempView("xt_djo_nation")
    ld(spark, sf_dir, "region").selectExpr(
        "r_regionkey AS _id", "r_name"
    ).createOrReplaceTempView("xt_djo_region")
    q = """
    SELECT n.n_name AS n_name, r.r_name AS r_name
    FROM xt_djo_nation n LEFT JOIN xt_djo_region r
      ON r._id = (SELECT r2._id FROM xt_djo_region r2
                  WHERE r2._id = n.n_regionkey AND n._id < 10)
    ORDER BY n_name
    """
    out = decorrelate_join_on(q)
    assert out != q, "decorrelation pass did not fire"
    return spark.sql(out)
