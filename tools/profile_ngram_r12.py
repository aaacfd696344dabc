"""Stage decomposition + candidate-generation A/B for
pipe_dedup_ngram_jaccard at a scale replica (guide §1: measure first).

Stages timed with the noop sink:
  1. shingle table (tokenize+explode)
  2. rare-gram aggregate
  3. candidate pairs, CURRENT spelling (semi join + self join + distinct)
  4. candidate pairs, VARIANT (one groupBy(gram) collect_list + pair
     explode + distinct) — equality-gated against (3) first
  5. full entry, current vs variant-wired

Usage: python tools/profile_ngram_r12.py [sf_dir] [rounds]
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


def noop(df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def cand_current(block):
    return (block.alias("a")
            .join(block.alias("b"),
                  (F.col("a.gram") == F.col("b.gram"))
                  & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct())


def cand_variant(sh, cap):
    """ONE aggregate: per-gram sorted id list (df <= cap) -> all i<j
    pairs via nested transform. Same pair set as the rare-semi-join +
    self-join: every (a<b) sharing a rare gram, deduped."""
    g = (sh.groupBy("gram")
         .agg(F.sort_array(F.collect_list("id")).alias("ids"))
         .filter(F.size("ids").between(2, cap)))
    pairs = F.expr(
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids) - i - 1), "
        "y -> struct(x AS id_a, y AS id_b))))")
    return (g.select(F.explode(pairs).alias("p"))
            .select("p.id_a", "p.id_b").distinct())


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xtdb_bench/sf1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = build_spark("ngram-profile-r12")
    spark.sparkContext.setLogLevel("ERROR")

    d = ld(spark, sf_dir, "documents")
    sh = dedup._shingle_table(d, "doc_id", "text", 3)
    rare = (sh.groupBy("gram").agg(F.count("*").alias("__df"))
            .filter(F.col("__df") <= 100))
    block = sh.join(rare.select("gram"), "gram", "left_semi")

    # ---- equality gate: candidate sets must be identical
    ca = sorted(map(tuple, cand_current(block).collect()))
    cb = sorted(map(tuple, cand_variant(sh, 100).collect()))
    assert ca == cb, f"candidate sets differ: {len(ca)} vs {len(cb)}"
    print(f"candidates EQUAL: {len(ca)} pairs")

    def full_current():
        return dedup.ngram_jaccard_pairs(d, n=3, threshold=0.05,
                                         max_gram_df=100)

    def full_variant():
        cand = cand_variant(dedup._shingle_table(d, "doc_id", "text", 3), 100)
        return dedup._jaccard_for_pairs_arrays(
            dedup._gram_arrays(d, "doc_id", "text", 3), cand, 0.05)

    stages = {
        "1_shingles": lambda: sh,
        "2_rare_agg": lambda: rare,
        "3_cand_current": lambda: cand_current(block),
        "4_cand_variant": lambda: cand_variant(sh, 100),
        "5_full_current": full_current,
        "6_full_variant": full_variant,
    }
    best = {}
    for r in range(rounds):
        for name, fn in stages.items():
            dt = noop(fn())
            best[name] = min(best.get(name, float("inf")), dt)
            print(f"  round {r} {name}: {dt:.1f}s")
    print("\nbest-of:")
    for name, dt in best.items():
        print(f"  {name}: {dt:.1f}s")


if __name__ == "__main__":
    main()
