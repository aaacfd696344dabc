"""Round-12 pass 2 A/B: multi-regex-pass text spellings (OLD) vs the
single-normalization-pass spellings now in the catalog (NEW — see
xtdb_spark.pipeline.text.normalized).

Same methodology as tools/ab_r12.py: results asserted IDENTICAL
(sorted-row comparison) before any timing; same-JVM alternating
best-of-N through the bench-identical cache config so background load
cancels out (guide §1).

Usage: [SPARK_GRAFT_SF_DIR=...] python tools/ab_text_norm.py [rounds=3]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from bench import BENCH_TABLES
from xtdb_spark.pipeline import text
from xtdb_spark.queries import QUERIES
from xtdb_spark.queries.registry import ld


# ------------------------------------------------------------- OLD spellings

def corpus_prep_old(spark, sf_dir):
    """Pre-pass-2 spelling: tokenize split + collapse-for-md5 +
    strip-for-charcount = 3 independent \\s+ regex scans per row."""
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


def text_quality_old(spark, sf_dir):
    d = ld(spark, sf_dir, "documents")
    t = F.col("text")
    n = text.token_count(t).cast("double")
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        F.round(F.length(F.regexp_replace(t, r"\s+", "")).cast("double") / n, 6)
        .alias("avg_word_len"),
        F.round(text.stopword_ratio(t), 6).alias("stop_ratio"),
        F.round(text.quality_score(t), 6).alias("quality"),
    )


def lang_id_old(spark, sf_dir):
    d = ld(spark, sf_dir, "documents")
    return d.select("doc_id",
                    text.lang_id(F.col("text")).alias("pred_lang"),
                    F.col("lang").alias("labeled_lang"))


def keep_best_old(spark, sf_dir):
    d = ld(spark, sf_dir, "documents")
    fp = F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))),
                                r"\s+", " "))
    n_tok = text.token_count(F.col("text")).cast("double")
    w = Window.partitionBy("fp")
    wr = Window.partitionBy("fp").orderBy(F.desc("n_tokens"), "doc_id")
    return (d.select("doc_id", fp.alias("fp"), n_tok.alias("n_tokens"))
            .withColumn("n_dups", F.count("*").over(w))
            .withColumn("rn", F.row_number().over(wr))
            .filter(F.col("rn") == 1)
            .select("fp", F.col("doc_id").alias("keep_id"), "n_dups"))


OLD = {
    "pipe_corpus_prep": corpus_prep_old,
    "pipe_text_quality": text_quality_old,
    "pipe_lang_id": lang_id_old,
    "pipe_dedup_keep_best": keep_best_old,
}


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from xtdb_spark.queries.registry import cache_tables
    from xtdb_spark.session import build_spark

    spark = build_spark("xtdb-spark-ab-textnorm")
    spark.sparkContext.setLogLevel("ERROR")
    cache_tables(spark, sf_dir, BENCH_TABLES)

    # equality gate
    for name, ofn in OLD.items():
        a = ofn(spark, sf_dir)
        b = QUERIES[name].fn(spark, sf_dir)
        assert a.columns == b.columns, (name, a.columns, b.columns)
        ra = sorted(map(str, a.collect()))
        rb = sorted(map(str, b.collect()))
        assert ra == rb, f"{name}: results differ ({len(ra)} vs {len(rb)} rows)"
        print(f"equal  {name}: {len(ra)} rows")

    # warm both sides
    for name, ofn in OLD.items():
        for _ in range(2):
            ofn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            QUERIES[name].fn(spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()

    best: dict[tuple[str, str], float] = {}
    for r in range(rounds):
        for name, ofn in OLD.items():
            for tag, fn in (("old", ofn), ("new", QUERIES[name].fn)):
                spark.sparkContext.setJobDescription(f"{tag}:{name}:r{r}")
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                k = (name, tag)
                best[k] = min(best.get(k, float("inf")), dt)

    print(f"\nbest-of-{rounds} (noop sink):")
    for name in OLD:
        o, n = best[(name, "old")], best[(name, "new")]
        print(f"{name:24s} old {o:6.3f} s  new {n:6.3f} s  ({o / n:.2f}x)")


if __name__ == "__main__":
    main()
