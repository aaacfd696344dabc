"""Same-JVM alternating A/B of candidate-generation spellings for
pipe_dedup_ngram_jaccard (guide §1: alternation controls for load;
§2.4: remove shuffles outright).

Spellings (equality-gated on the candidate-pair set first):
  current — rare-gram count agg -> semi join -> self join on gram -> distinct
  listall — ONE groupBy(gram) collect_list over ALL grams, size-filter,
            pair explode -> distinct (hot grams build giant lists
            before the filter can drop them)
  hybrid  — rare-gram count agg -> semi join (cheap partial-agg prune)
            -> groupBy(gram) collect_list on the PRUNED block (already
            partitioned by gram, so zero new exchange) -> pair explode
            -> distinct (drops the self-join's second subtree + sort)

Timed: the FULL entry (shared array-intersect verify) through the
noop sink, alternating best-of-N.

Usage: python tools/ab_ngram_cand_r12.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from xtdb_spark.pipeline import dedup
from xtdb_spark.queries.registry import ld
from xtdb_spark.session import build_spark

CAP = 100


def _pairs():
    # built lazily: F.expr needs an active SparkContext
    return F.expr(
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids) - i - 1), "
        "y -> struct(x AS id_a, y AS id_b))))")


def cand_current(sh):
    rare = (sh.groupBy("gram").agg(F.count("*").alias("__df"))
            .filter(F.col("__df") <= CAP))
    block = sh.join(rare.select("gram"), "gram", "left_semi")
    return (block.alias("a")
            .join(block.alias("b"),
                  (F.col("a.gram") == F.col("b.gram"))
                  & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct())


def cand_listall(sh):
    g = (sh.groupBy("gram")
         .agg(F.sort_array(F.collect_list("id")).alias("ids"))
         .filter(F.size("ids").between(2, CAP)))
    return (g.select(F.explode(_pairs()).alias("p"))
            .select("p.id_a", "p.id_b").distinct())


def cand_hybrid(sh):
    rare = (sh.groupBy("gram").agg(F.count("*").alias("__df"))
            .filter(F.col("__df") <= CAP))
    block = sh.join(rare.select("gram"), "gram", "left_semi")
    g = (block.groupBy("gram")
         .agg(F.sort_array(F.collect_list("id")).alias("ids"))
         .filter(F.size("ids") >= 2))
    return (g.select(F.explode(_pairs()).alias("p"))
            .select("p.id_a", "p.id_b").distinct())


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xtdb_bench/sf1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = build_spark("ab-ngram-cand-r12")
    spark.sparkContext.setLogLevel("ERROR")

    d = ld(spark, sf_dir, "documents")

    def sh():
        return dedup._shingle_table(d, "doc_id", "text", 3)

    def full(cand_fn):
        return dedup._jaccard_for_pairs_arrays(
            dedup._gram_arrays(d, "doc_id", "text", 3),
            cand_fn(sh()), 0.05)

    spellings = {"current": cand_current, "listall": cand_listall,
                 "hybrid": cand_hybrid}

    # equality gate on candidate counts + a sample checksum (the full
    # 43.8M-pair collect is driver-hostile; count + sum-of-hash is a
    # strong multiset fingerprint)
    sums = {}
    for tag, fn in spellings.items():
        agg = (fn(sh())
               .agg(F.count("*").alias("n"),
                    F.sum(F.xxhash64("id_a", "id_b").cast("decimal(38,0)"))
                    .alias("s")).collect()[0])
        sums[tag] = (agg["n"], agg["s"])
        print(f"{tag}: n={agg['n']} checksum={agg['s']}", flush=True)
    assert len(set(sums.values())) == 1, f"candidate sets differ: {sums}"
    print("candidate sets EQUAL\n", flush=True)

    best = {}
    for r in range(rounds):
        for tag, fn in spellings.items():
            spark.sparkContext.setJobDescription(f"ngram-ab {tag} r{r}")
            t0 = time.perf_counter()
            full(fn).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best[tag] = min(best.get(tag, float("inf")), dt)
            print(f"round {r} {tag}: {dt:.1f}s", flush=True)
    print("\nbest-of:")
    for tag, dt in best.items():
        print(f"  {tag}: {dt:.1f}s")


if __name__ == "__main__":
    main()
