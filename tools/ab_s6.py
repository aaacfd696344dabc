"""Session-6 same-JVM alternating A/Bs: candidate respellings vs HEAD
spellings, equality-gated (sorted-row comparison) before timing.

Usage: python tools/ab_s6.py <case> [sf_dir] [rounds]
Cases: retention, perplexity
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from xtdb_spark.queries import QUERIES
from xtdb_spark.queries.registry import ld


def retention_v(spark, sf_dir):
    """an_daily_retention without the distinct+self-join: ONE shuffle
    by user_id collects each user's distinct active-day set; a day D
    is retained iff the set also holds D + INTERVAL 1 DAY. The old
    plan shuffled daily twice more (by (user_id, d±1day)) for the
    self-join."""
    e = ld(spark, sf_dir, "events")
    per_user = (e.select("user_id", F.date_trunc("day", "ts").alias("d"))
                .groupBy("user_id")
                .agg(F.collect_set("d").alias("days")))
    return (per_user
            .select(F.explode("days").alias("day"), "days")
            .filter(F.array_contains(
                F.col("days"), F.col("day") + F.expr("INTERVAL 1 DAY")))
            .groupBy("day")
            .agg(F.count("*").alias("n_retained")))


def perplexity_v(spark, sf_dir):
    """bigram_lm_xent with uni and vocab DERIVED from bgc instead of
    re-scanning bg: c(w1*) = sum_w2 c(w1,w2); V = |distinct w2| is
    identical over bgc and bg. Tokenize replays 4 -> 2 and the two
    full-bigram-stream aggregates become aggregates over the (much
    smaller) distinct-bigram relation, shared via ReuseExchange."""
    from xtdb_spark.pipeline import text as _t
    d = ld(spark, sf_dir, "documents")
    k, max_xent = 0.5, 7.0
    ts = F.split(F.trim(F.regexp_replace(F.lower(F.col("text")),
                                         "[^a-z]+", " ")), " +")
    toks = (d.select(F.col("doc_id").alias("doc_id"), ts.alias("ts"))
            .filter(F.size("ts") >= 2))
    pairs = F.arrays_zip(
        F.slice(F.col("ts"), 1, F.size("ts") - 1).alias("w1"),
        F.slice(F.col("ts"), 2, F.size("ts") - 1).alias("w2"))
    bg = (toks.select("doc_id", F.explode(pairs).alias("p"))
          .select("doc_id", "p.w1", "p.w2"))
    bgc = bg.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    uni = bgc.groupBy("w1").agg(F.sum("cb").alias("c1"))
    vocab = bgc.agg(F.countDistinct("w2").alias("v"))
    lp6 = F.round(F.log((F.col("cb") + F.lit(k))
                        / (F.col("c1") + F.lit(k) * F.col("v"))),
                  6).cast("decimal(18,6)")
    return (bg.join(bgc, ["w1", "w2"]).join(uni, "w1")
            .crossJoin(F.broadcast(vocab))
            .select("doc_id", lp6.alias("lp6"))
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_bigrams"),
                 F.round((-F.sum("lp6")).cast("double") / F.count("*"),
                         4).alias("xent"))
            .withColumn("keep", F.col("xent") <= F.lit(max_xent)))


CASES = {
    "retention": ("an_daily_retention", retention_v),
    "perplexity": ("pipe_perplexity_filter", perplexity_v),
}


def main():
    case = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/xtdb_bench/sf1"
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from xtdb_spark.session import build_spark
    spark = build_spark(f"ab-s6-{case}")
    spark.sparkContext.setLogLevel("ERROR")

    name, vfn = CASES[case]
    old_fn = QUERIES[name].fn

    # equality gate
    old_rows = sorted(map(str, old_fn(spark, sf_dir).collect()))
    new_rows = sorted(map(str, vfn(spark, sf_dir).collect()))
    assert old_rows == new_rows, (
        f"MISMATCH {name}: {len(old_rows)} vs {len(new_rows)} rows; "
        f"first diff: "
        f"{next((a, b) for a, b in zip(old_rows, new_rows) if a != b)}")
    print(f"equality OK: {len(old_rows)} rows identical", flush=True)

    def t(fn):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    best_old, best_new = float("inf"), float("inf")
    for i in range(rounds):
        spark.sparkContext.setJobDescription(f"ab:{case}:old:{i}")
        a = t(old_fn)
        spark.sparkContext.setJobDescription(f"ab:{case}:new:{i}")
        b = t(vfn)
        best_old, best_new = min(best_old, a), min(best_new, b)
        print(f"round {i}: old {a:.2f}s new {b:.2f}s", flush=True)
    print(f"BEST old {best_old:.2f}s new {best_new:.2f}s "
          f"win {best_old / best_new:.2f}x", flush=True)


if __name__ == "__main__":
    main()
