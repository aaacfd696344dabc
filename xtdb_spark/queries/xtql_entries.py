"""XTQL entry-point + literal-relation catalog entries.

The reference's second query language (XTQL, reference
core/src/main/clojure/xtdb/xtql.clj:293-593) plans to the same
logical plan as SQL; here the DSL (xtdb_spark/xtql.py) builds the
same DataFrames the SQL path would, so these entries prove the
second entry point produces oracle-identical results.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from xtdb_spark.queries.registry import dsum, ld, register, sql_dsum
from xtdb_spark.xtql import (
    aggregate, from_df, limit, order_by, q, return_, unify, where,
)


@register(
    "xtql_pipeline_agg",
    f"""
    SELECT o_custkey, COUNT(*) AS n_orders, {sql_dsum('o_totalprice', 'spend')}
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_custkey
    ORDER BY spend DESC, o_custkey
    LIMIT 50
    """,
)
def pipeline_agg(spark, sf_dir):
    """XTQL pipeline: from → where → aggregate → order-by → limit
    (reference xtql.clj Pipeline/From/Where/Aggregate/OrderBy/Limit)."""
    return q(None,
             from_df(ld(spark, sf_dir, "orders")),
             where(F.col("o_orderstatus") == "F"),
             aggregate("o_custkey",
                       n_orders=F.count("*"),
                       spend=dsum(F.col("o_totalprice"), "spend")),
             order_by(F.desc("spend"), "o_custkey"),
             limit(50))


@register(
    "xtql_unify_join",
    """
    SELECT n_name, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS total_bal
    FROM customer, nation
    WHERE c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def unify_join(spark, sf_dir):
    """XTQL unify: datalog-style join on a shared logic variable
    (reference xtql.clj Unify → natural join on shared columns).
    `nk` is the shared var binding c_nationkey ↔ n_nationkey."""
    return q(None,
             unify(
                 from_df(ld(spark, sf_dir, "customer"),
                         bind={"c_nationkey": "nk"}),
                 from_df(ld(spark, sf_dir, "nation"),
                         bind={"n_nationkey": "nk"}),
             ),
             aggregate("n_name",
                       n_customers=F.count("*"),
                       total_bal=F.sum(F.col("c_acctbal").cast("decimal(38,6)"))
                       .cast("double").alias("total_bal")),
             order_by("n_name"))


@register(
    "op_table_values",
    """
    SELECT t.r_regionkey, CAST(t.bonus AS DOUBLE) AS bonus, r.r_name
    FROM (VALUES (0, 1.5), (1, 2.5), (2, 3.5), (3, 4.5), (4, 5.5))
         AS t(r_regionkey, bonus)
    JOIN region r ON r.r_regionkey = t.r_regionkey
    ORDER BY t.r_regionkey
    """,
)
def table_values(spark, sf_dir):
    """:table literal-rows operator (reference operator/table.clj:25-206)
    joined against a scanned table — literal rels broadcast."""
    rows = [(i, 1.5 + i) for i in range(5)]
    t = spark.createDataFrame(rows, "r_regionkey int, bonus double")
    r = ld(spark, sf_dir, "region")
    return (F.broadcast(t)
            .join(r.withColumnRenamed("r_regionkey", "rk"),
                  F.col("rk") == t.r_regionkey)
            .select("r_regionkey", "bonus", "r_name")
            .orderBy("r_regionkey"))


@register(
    "xtql_nest_many",
    """
    SELECT c_custkey, c_name,
           (SELECT COALESCE(list(o_orderkey ORDER BY o_orderkey), [])
            FROM orders WHERE o_custkey = c_custkey
              AND o_totalprice > 40000) AS big_orders
    FROM customer
    WHERE c_custkey < 100
    ORDER BY c_custkey
    """,
)
def nest_many_entry(spark, sf_dir):
    """NEST_MANY — XTDB's nested-document SQL sugar (SURVEY §7 step
    4): correlated subquery becomes an array column. Decorrelated to
    groupBy + collect_list + left join; empty matches give []."""
    from xtdb_spark.xtql import from_df, nest_many, order_by, q, where

    c = ld(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = (ld(spark, sf_dir, "orders")
         .filter(F.col("o_totalprice") > 40000)
         .select(F.col("o_custkey").alias("c_custkey"), "o_orderkey"))
    return q(None,
             from_df(c),
             where(F.col("c_custkey") < 100),
             nest_many(o, ["c_custkey"], F.col("o_orderkey"), "big_orders"),
             order_by("c_custkey"))


@register(
    "dyn_union_column",
    """
    SELECT leg, COUNT(*) AS n,
           CAST(SUM(CAST(f64_val AS DECIMAL(38,6))) AS DOUBLE) AS sum_f64,
           MIN(str_val) AS min_str
    FROM (SELECT CASE WHEN event_type = 'purchase' THEN 'f64'
                      ELSE 'str' END AS leg,
                 CASE WHEN event_type = 'purchase' THEN value END AS f64_val,
                 CASE WHEN event_type <> 'purchase' THEN event_type
                      END AS str_val
          FROM events)
    GROUP BY leg ORDER BY leg
    """,
)
def dyn_union_column(spark, sf_dir):
    """Dynamic/union-typed column (SURVEY §1.2 dense-union → §1.3
    legs-struct encoding, xtdb_spark/dyntypes.py): a column holding
    doubles for purchases and strings otherwise, aggregated by leg
    with typed access. The observable semantics (tag + typed access
    with NULL on mismatch) are what DuckDB replicates."""
    from xtdb_spark import dyntypes as D

    e = ld(spark, sf_dir, "events")
    is_num = F.col("event_type") == "purchase"
    dyn = F.struct(
        F.when(is_num, "f64").otherwise("str").alias("_leg"),
        F.lit(None).cast("bigint").alias("i64"),
        F.when(is_num, F.col("value")).alias("f64"),
        F.when(~is_num, F.col("event_type")).alias("str"),
        F.lit(None).cast("boolean").alias("bool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
    d = e.select(dyn.alias("v"))
    return (d.groupBy(D.leg(F.col("v")).alias("leg"))
            .agg(F.count("*").alias("n"),
                 F.sum(D.get_leg(F.col("v"), "f64").cast("decimal(38,6)"))
                 .cast("double").alias("sum_f64"),
                 F.min(D.get_leg(F.col("v"), "str")).alias("min_str"))
            .orderBy("leg"))


@register(
    "dyn_nested_legs",
    """
    SELECT leg, COUNT(*) AS n,
           CAST(SUM(n_elems) AS BIGINT) AS total_elems,
           MIN(str_val) AS min_str
    FROM (SELECT CASE WHEN doc_id % 2 = 0 THEN 'arr' ELSE 'str' END AS leg,
                 CASE WHEN doc_id % 2 = 0
                      THEN len(string_split(trim(text), ' ')) END AS n_elems,
                 CASE WHEN doc_id % 2 = 1 THEN lang END AS str_val
          FROM documents)
    GROUP BY leg ORDER BY leg
    """,
)
def dyn_nested_legs(spark, sf_dir):
    """Nested dynamic legs (reference types.clj [:list t]/[:struct …]
    union legs; xtdb_spark/dyntypes.py arr/obj encoding): a column
    holding an ARRAY of per-element-tagged scalars for even docs and a
    plain string for odd docs. Observable semantics checked: the leg
    tag, per-leg cardinality, element count inside the arr leg, and
    typed access on the str leg."""
    from xtdb_spark import dyntypes as D

    d = ld(spark, sf_dir, "documents")
    is_arr = F.col("doc_id") % 2 == 0
    toks = F.split(F.trim(F.col("text")), " ")
    elem = lambda c: F.struct(  # noqa: E731 — scalar legs-struct per element
        F.lit("str").alias("_leg"), F.lit(None).cast("bigint").alias("i64"),
        c.alias("str"))
    dyn = F.struct(
        F.when(is_arr, "arr").otherwise("str").alias("_leg"),
        F.when(~is_arr, F.col("lang")).alias("str"),
        F.when(is_arr, F.transform(toks, elem)).alias("arr"),
    )
    v = d.select(dyn.alias("v"))
    return (v.groupBy(D.leg(F.col("v")).alias("leg"))
            .agg(F.count("*").alias("n"),
                 F.sum(F.size(F.col("v.arr"))).cast("bigint")
                 .alias("total_elems"),
                 F.min(D.get_leg(F.col("v"), "str")).alias("min_str"))
            .orderBy("leg"))


@register(
    "xtql_json_pipeline",
    """
    SELECT c_mktsegment, COUNT(*) AS n, MAX(o_totalprice) AS mx
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_totalprice > 1000.0
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def xtql_json_pipeline(spark, sf_dir):
    """Serialized XTQL (reference xtql.clj:293-593 edn/JSON pipeline
    parsing, here xtdb_spark/xtql_json.py): parse a JSON pipeline —
    unify on a shared logic var, filter, aggregate, order — and run
    it. MAX (not SUM) keeps the double aggregate hash-stable."""
    from xtdb_spark import xtql_json

    class _Cat:  # minimal session: scan() over the testdata tables
        def __init__(self):
            self.spark = spark

        def scan(self, table, **kw):
            return ld(spark, sf_dir, table)

    return xtql_json.run(_Cat(), """
      ["pipeline",
        ["unify",
          ["from", "orders", [{"o_custkey": "c"}, "o_totalprice"]],
          ["from", "customer", [{"c_custkey": "c"}, "c_mktsegment"]]],
        ["where", [">", "o_totalprice", 1000.0]],
        ["aggregate", ["c_mktsegment"],
          {"n": ["count"], "mx": ["max", "o_totalprice"]}],
        ["order-by", "c_mktsegment"]]
    """)


@register(
    "xtql_edn_pipeline",
    """
    SELECT o_orderpriority, COUNT(*) AS n, MAX(o_totalprice) AS mx
    FROM orders
    WHERE o_totalprice > 1000.0
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def xtql_edn_pipeline(spark, sf_dir):
    """Serialized XTQL, edn wire form (the reference's PRIMARY query
    serialization — xtql.clj edn reader; here xtdb_spark/xtql_edn.py:
    fresh edn reader + translation onto the shared JSON-vocabulary
    compiler). Threading pipeline with symbols-as-logic-vars and
    row-count."""
    from xtdb_spark import xtql_edn

    class _Cat:  # minimal session: scan() over the testdata tables
        def __init__(self):
            self.spark = spark

        def scan(self, table, **kw):
            return ld(spark, sf_dir, table)

    return xtql_edn.run(_Cat(), """
      (-> (from :orders [o_orderpriority o_totalprice])
          (where (> o_totalprice 1000.0))
          (aggregate o_orderpriority {:n (row-count)}
                                     {:mx (max o_totalprice)})
          (order-by o_orderpriority))
    """)


class _PlainXT:
    """Minimal session facade for edn pipelines over the plain test
    parquet (no bitemporal store — scans ignore temporal kwargs,
    which the catalog tables don't carry)."""

    def __init__(self, spark, sf_dir):
        self.spark = spark
        self.sf_dir = sf_dir

    def scan(self, table, **_kw):
        return ld(self.spark, self.sf_dir, table)


@register(
    "xtql_pull_records",
    """
    SELECT r_name AS region,
           (SELECT list(n_name ORDER BY n_name)[1:3]
            FROM nation WHERE n_regionkey = r_regionkey) AS top_nations
    FROM region ORDER BY region
    """,
)
def xtql_pull_records(spark, sf_dir):
    """`pull*` subquery expressions (reference xtql.clj PullMany,
    round 12): per-outer-row record arrays with the subquery's OWN
    order-by + limit applied PER correlation key — lowered to a
    row_number window + ordered collect + one left join (set-
    oriented, no per-row execution; the struct array is unwrapped to
    names only for the value-hash compare)."""
    from xtdb_spark import xtql_edn

    out = xtql_edn.run(_PlainXT(spark, sf_dir), """
      (-> (from :region [{:r_regionkey rid} {:r_name region}])
          (with {:top_nations
                 (pull* (fn [rid]
                          (-> (from :nation [{:n_regionkey rid} n_name])
                              (order-by n_name)
                              (limit 3))))})
          (order-by region))
    """)
    return out.select(
        "region",
        F.transform("top_nations", lambda x: x["n_name"])
         .alias("top_nations"))


@register(
    "xtql_exists_where",
    """
    SELECT COUNT(*) AS n_without, MIN(c_custkey) AS first_ck
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def xtql_exists_where(spark, sf_dir):
    """`(not (exists? (fn [vars] query)))` in an XTQL where
    (reference xtql.clj Exists, round 12) — planned as a left-anti
    join on the correlation vars."""
    from xtdb_spark import xtql_edn

    return xtql_edn.run(_PlainXT(spark, sf_dir), """
      (-> (from :customer [{:c_custkey ck}])
          (where (not (exists? (fn [ck]
                                 (from :orders [{:o_custkey ck}])))))
          (aggregate {:n_without (row-count)} {:first_ck (min ck)}))
    """)
