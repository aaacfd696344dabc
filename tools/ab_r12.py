"""Round-12 same-JVM alternating A/B: OLD (pre-r12) spellings vs the
now-committed r12 spellings.

Each variant is a plan-equivalent respelling (results must be
IDENTICAL — asserted here by sorted-row comparison before timing).
Timing: alternating best-of-N through the bench-identical cache
config, guide §1 (measure first, same methodology as bench.py).

Usage: python tools/ab_r12.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from bench import BENCH_TABLES
from xtdb_spark.pipeline import dedup, text
from xtdb_spark.queries import QUERIES
from xtdb_spark.queries.registry import big_input, ld


# --------------------------------------------------------------- variants

def q20_v(spark, sf_dir):
    """q20 without the redundant pre-semi-join distinct (semi join
    dedups its build side) and with the nation filter applied to
    supplier BEFORE the semi join (shrinks the probe side 25x)."""
    l = ld(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")))
    p = ld(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    heavy = (l.join(p, F.col("l_partkey") == F.col("p_partkey"))
             .groupBy("l_suppkey", "l_partkey")
             .agg(F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("q"))
             .filter(F.col("q") > 50)
             .select("l_suppkey"))
    s = ld(spark, sf_dir, "supplier")
    n = F.broadcast(ld(spark, sf_dir, "nation")
                    .filter(F.col("n_name") == "NATION_7"))
    sn = s.join(n, F.col("s_nationkey") == F.col("n_nationkey"))
    return (sn.join(heavy, sn.s_suppkey == heavy.l_suppkey, "left_semi")
            .select("s_name", "s_acctbal")
            .orderBy("s_name"))


def q2_v(spark, sf_dir):
    """q2 with ONE eu_supp subtree: the EU-supplier dimension joins
    (inner, broadcast) BEFORE the (partkey, suppkey) aggregate and its
    attributes ride through the grouping keys, so the
    supplier-nation-region build happens once instead of twice."""
    l = ld(spark, sf_dir, "lineitem")
    p = ld(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "PROMO"))
    s = ld(spark, sf_dir, "supplier")
    n = F.broadcast(ld(spark, sf_dir, "nation"))
    r = F.broadcast(ld(spark, sf_dir, "region")
                    .filter(F.col("r_name") == "EUROPE"))
    eu_supp = (s.join(n, F.col("s_nationkey") == F.col("n_nationkey"))
               .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
               .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
    pruned = (l
              .join(F.broadcast(p.select("p_partkey")),
                    F.col("l_partkey") == F.col("p_partkey"), "left_semi")
              .join(F.broadcast(eu_supp),
                    F.col("l_suppkey") == F.col("s_suppkey")))
    supply = (pruned.groupBy(F.col("l_partkey").alias("partkey"),
                             F.col("l_suppkey").alias("suppkey"),
                             "s_acctbal", "s_name", "n_name")
              .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity"))
                   .alias("cost")))
    w = Window.partitionBy("partkey")
    return (supply.withColumn("min_cost", F.min("cost").over(w))
            .filter(F.col("cost") == F.col("min_cost"))
            .join(F.broadcast(p), F.col("partkey") == p.p_partkey)
            .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type",
                    F.col("cost").alias("supplycost"))
            .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
            .limit(100))


def q22_v(spark, sf_dir):
    """q22 with a size-gated broadcast hint on the anti-join build
    side (date-filtered orders): at MB scale the estimate keeps it on
    a sort-merge anti; at GB+ AQE owns the choice."""
    keys = [1, 3, 5, 7, 9, 11, 13]
    c = ld(spark, sf_dir, "customer").filter(F.col("c_nationkey").isin(keys))
    avg_bal = (c.filter(F.col("c_acctbal") > 0.0)
               .agg((F.sum(F.col("c_acctbal").cast("decimal(38,6)")).cast("double")
                     / F.count("c_acctbal").cast("double")).alias("avg_bal")))
    o = (ld(spark, sf_dir, "orders")
         .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
         .select("o_custkey"))
    if not big_input(sf_dir, "orders"):
        o = F.broadcast(o)
    return (c.crossJoin(F.broadcast(avg_bal))
            .filter(F.col("c_acctbal") > F.col("avg_bal"))
            .join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
            .groupBy(F.col("c_nationkey").alias("cntrycode"))
            .agg(F.count("*").alias("numcust"),
                 F.sum(F.col("c_acctbal").cast("decimal(38,6)"))
                 .cast("double").alias("totacctbal"))
            .orderBy("cntrycode"))


def q11_v(spark, sf_dir):
    """q11 with the global scalar as a broadcast 1-row aggregate
    instead of an empty-partition window (the window funnels every
    per-part row through ONE task at scale; the broadcast branch
    reuses the same shuffle via ReuseExchange)."""
    l = ld(spark, sf_dir, "lineitem")
    s = ld(spark, sf_dir, "supplier")
    n = F.broadcast(ld(spark, sf_dir, "nation")
                    .filter(F.col("n_name") == "NATION_3"))
    value = (l.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
             .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
             .groupBy(F.col("l_partkey").alias("partkey"))
             .agg(F.sum(F.col("l_extendedprice").cast("decimal(38,6)"))
                  .alias("val")))
    total = value.agg(F.sum("val").alias("__tot"))
    return (value.crossJoin(F.broadcast(total))
            .withColumn("threshold", F.col("__tot").cast("double") * F.lit(0.001))
            .filter(F.col("val").cast("double") > F.col("threshold"))
            .select("partkey", F.col("val").cast("double").alias("part_value"))
            .orderBy(F.desc("part_value"), "partkey"))


def q15_v(spark, sf_dir):
    """q15: same global-scalar-as-broadcast-aggregate respelling."""
    l = ld(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp")))
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,6)")
    revenue = (l.groupBy(F.col("l_suppkey").alias("supplier_no"))
               .agg(F.sum(rev).alias("total_rev")))
    mx = revenue.agg(F.max("total_rev").alias("__mx"))
    s = ld(spark, sf_dir, "supplier")
    return (revenue.crossJoin(F.broadcast(mx))
            .filter(F.col("total_rev") == F.col("__mx"))
            .join(s, F.col("s_suppkey") == F.col("supplier_no"))
            .select("s_suppkey", "s_name",
                    F.col("total_rev").cast("double").alias("total_revenue"))
            .orderBy("s_suppkey"))


def corpus_prep_v(spark, sf_dir):
    """pipe_corpus_prep in ONE text pass: fingerprint + quality from
    the same scan, dedup-keep via min-over-fp window (was: two
    document scans + aggregate + semi join)."""
    d = ld(spark, sf_dir, "documents")
    toks = text.tokens(F.lower(F.col("text")))
    base = d.select(
        "doc_id",
        text.fingerprint(F.col("text")).alias("fp"),
        F.size(toks).alias("n_tokens"),
        text.quality_score(F.col("text"), toks).alias("quality"))
    w = Window.partitionBy("fp")
    return (base.withColumn("__keep", F.min("doc_id").over(w))
            .filter((F.col("doc_id") == F.col("__keep"))
                    & (F.col("quality") > 0.9))
            .select("doc_id", "n_tokens")
            .orderBy("doc_id"))


VARIANTS = {
    "tpch_q20_potential_promotion": q20_v,
    "tpch_q2_min_cost_supplier": q2_v,
    "tpch_q22_global_sales_opportunity": q22_v,
    "tpch_q11_important_stock": q11_v,
    "tpch_q15_top_supplier": q15_v,
    "pipe_corpus_prep": corpus_prep_v,
}


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from xtdb_spark.queries.registry import cache_tables
    from xtdb_spark.session import build_spark

    spark = build_spark("xtdb-spark-ab-r12")
    spark.sparkContext.setLogLevel("ERROR")
    cache_tables(spark, sf_dir, BENCH_TABLES)

    # equality gate first — a variant that changes results is a bug,
    # not an optimization
    for name, vfn in VARIANTS.items():
        a = QUERIES[name].fn(spark, sf_dir)
        b = vfn(spark, sf_dir)
        assert a.columns == b.columns, (name, a.columns, b.columns)
        ra = sorted(map(str, a.collect()))
        rb = sorted(map(str, b.collect()))
        assert ra == rb, f"{name}: results differ ({len(ra)} vs {len(rb)} rows)"
        print(f"{name}: results EQUAL ({len(ra)} rows)")

    # warm both spellings, then alternate best-of-N
    for _ in range(4):
        for name, vfn in VARIANTS.items():
            QUERIES[name].fn(spark, sf_dir).collect()
            vfn(spark, sf_dir).collect()

    best: dict[tuple[str, str], float] = {}
    for _ in range(rounds):
        for name, vfn in VARIANTS.items():
            for tag, fn in (("base", QUERIES[name].fn), ("variant", vfn)):
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                dt = time.perf_counter() - t0
                k = (name, tag)
                best[k] = min(best.get(k, float("inf")), dt)
    print(f"\n{'query':42s} {'base':>8s} {'variant':>8s}  speedup")
    for name in VARIANTS:
        b = best[(name, "base")]
        v = best[(name, "variant")]
        print(f"{name:42s} {b:8.4f} {v:8.4f}  {b / v:5.2f}x")


if __name__ == "__main__":
    main()
