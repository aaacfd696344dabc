#!/usr/bin/env python3
"""IVF-PQ vs flat-PQ vs exact: recall/latency A/B (verdict r9 #4).

Synthesizes a clustered corpus (n vectors, 64-dim, `n_clusters`
gaussian blobs — clustered data is ANN's design case; the driver's
synthetic embeddings are near-random, the degenerate case where NO
cell structure exists), then measures on the same SparkSession:

- exact:   broadcast-queries crossJoin full scan (the baseline)
- flat PQ: ADC over ALL codes (linear in corpus)
- IVF-PQ:  ADC over the probed cells only (linear in probed fraction)

Prints one JSON line with wall times and recall@10 vs exact.

Usage: python tools/ann_ivfpq_ab.py [n=200000] [n_cells=64] [nprobe=8]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def make_corpus(spark, n: int, dim: int = 64, n_clusters: int = 256):
    """Deterministic clustered blobs: cluster = id % n_clusters;
    center dims from xxhash64(cluster, d); jitter from
    xxhash64(id, d) — pure column expressions, no Python."""
    df = spark.range(n).withColumn("cl", (F.col("id") % n_clusters))
    dims = []
    for d in range(dim):
        center = (F.xxhash64(F.col("cl"), F.lit(d)) % 1000) / 50.0
        jitter = (F.xxhash64(F.col("id"), F.lit(d)) % 100) / 100.0
        dims.append((center + jitter).cast("double"))
    return df.select((F.col("id") + 100).alias("vec_id"),
                     F.array(*dims).alias("embedding"))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_cells = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    nprobe = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    nq, dim, k = 20, 64, 10

    from xtdb_spark.pipeline import similarity
    from xtdb_spark.session import build_spark

    spark = build_spark("ivfpq-ab", master="local[16]",
                        shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    corpus = make_corpus(spark, n, dim).cache()
    corpus.count()
    q = (corpus.limit(nq)
         .select(F.col("vec_id").alias("q_id"),
                 F.col("embedding").alias("q_vec"))).cache()
    q.count()

    c = corpus.select(F.col("vec_id").alias("nn_id"),
                      similarity.as_double_array(
                          F.col("embedding")).alias("v"))
    qq = q.select("q_id", similarity.as_double_array(
        F.col("q_vec")).alias("qv"))

    # exact baseline
    t0 = time.time()
    d2 = F.round(similarity.l2sq(F.col("qv"), F.col("v")), 6)
    w = Window.partitionBy("q_id").orderBy("d2", "nn_id")
    exact = (F.broadcast(qq).crossJoin(c)
             .select("q_id", "nn_id", d2.alias("d2"))
             .withColumn("rnk", F.row_number().over(w))
             .filter(F.col("rnk") <= k))
    exact_set = {(r["q_id"], r["nn_id"]) for r in exact.collect()}
    t_exact = time.time() - t0

    # flat PQ (ADC over all codes)
    t0 = time.time()
    books = similarity.pq_codebooks(c, dim=dim, m=8, k=64,
                                    train_cap=4000)
    enc = similarity.pq_encode(c, books, dim=dim) \
        .select("nn_id", "codes").cache()
    enc.count()
    t_pq_build = time.time() - t0
    t0 = time.time()
    flat = similarity.pq_adc_topk(enc, qq, books, dim=dim, k=k)
    flat_set = {(r["q_id"], r["nn_id"]) for r in flat.collect()}
    t_pq = time.time() - t0

    # IVF-PQ — build (cells + residual codebooks + encode, all
    # one-time index construction) timed apart from search, so the
    # latency comparison is scan-vs-scan like flat PQ's
    t0 = time.time()
    cents = similarity.ivf_centroids(c, n_cells, 20_000, 10)
    crows = sorted((r["cell"], r["cv"]) for r in cents.collect())
    cents_df = spark.createDataFrame(
        [(cl, [float(x) for x in cv]) for cl, cv in crows],
        "cell int, cv array<double>")
    residual = F.zip_with(F.col("v"), F.col("cv"), lambda x, y: x - y)
    cres = (similarity._assign_cells(c, "nn_id", "v", crows, 1)
            .join(F.broadcast(cents_df), "cell").withColumn("r", residual))
    ibooks = similarity.pq_codebooks(cres, dim, m=8, k=64,
                                     vec_col="r", train_cap=4000)
    ienc = similarity.pq_encode(cres, ibooks, dim, vec_col="r") \
        .select("nn_id", "cell", "codes").cache()
    ienc.count()
    t_ivfpq_build = time.time() - t0
    t0 = time.time()
    qres = (similarity._assign_cells(qq, "q_id", "qv", crows, nprobe)
            .join(F.broadcast(cents_df), "cell")
            .withColumn("qr", F.zip_with(F.col("qv"), F.col("cv"),
                                         lambda x, y: x - y))
            .select("q_id", "cell", "qr"))
    pd2 = similarity._adc_d2(F.col("qr"), F.col("codes"), ibooks, dim)
    wk = Window.partitionBy("q_id").orderBy(
        F.round(F.col("approx_d2"), 6), F.col("nn_id"))
    ivfpq = (qres.join(ienc, "cell")
             .select("q_id", "nn_id", F.round(pd2, 6).alias("approx_d2"))
             .withColumn("rnk", F.row_number().over(wk))
             .filter(F.col("rnk") <= k))
    ivfpq_set = {(r["q_id"], r["nn_id"]) for r in ivfpq.collect()}
    t_ivfpq = time.time() - t0

    # SERVING-MODE latency (the 100 TB path): the code table persists
    # as parquet PARTITIONED BY cell, so a single query's probed-cell
    # read prunes to ~nprobe/n_cells of the files — the scan itself
    # goes sublinear, not just the ADC compute (a cached DF join
    # still scans every code; partition pruning is what the
    # composition buys at scale). Median single-query latency over 5
    # queries, flat (full parquet) vs ivfpq (pruned parquet).
    import statistics
    import tempfile

    pq_dir = os.path.join(tempfile.mkdtemp(prefix="ivfpq_ab_"), "codes")
    ienc.write.partitionBy("cell").mode("overwrite").parquet(pq_dir)
    enc_pq = spark.read.parquet(pq_dir)
    q_cells = {r["q_id"]: [] for r in qres.collect()}
    for r in qres.collect():
        q_cells[r["q_id"]].append(r["cell"])
    qrows = {r["q_id"]: r for r in qres.collect()}
    flat_lat, ivf_lat = [], []
    wq = Window.partitionBy("q_id").orderBy(
        F.round(F.col("approx_d2"), 6), F.col("nn_id"))
    flat_dir = os.path.join(os.path.dirname(pq_dir), "flat_codes")
    enc.write.mode("overwrite").parquet(flat_dir)
    flat_pq_tbl = spark.read.parquet(flat_dir)
    for qid in list(q_cells)[:5]:
        one_q = qres.filter(F.col("q_id") == qid)
        # flat serving: raw query vector ADC over ALL (non-residual)
        # codes — the linear baseline the partition pruning beats
        t0 = time.time()
        (qq.filter(F.col("q_id") == qid).crossJoin(flat_pq_tbl)
         .select("q_id", "nn_id", F.round(
             similarity._adc_d2(F.col("qv"), F.col("codes"),
                                books, dim), 6).alias("approx_d2"))
         .withColumn("rnk", F.row_number().over(wq))
         .filter(F.col("rnk") <= k).collect())
        flat_lat.append(time.time() - t0)
        t0 = time.time()
        (one_q.join(enc_pq.filter(F.col("cell").isin(q_cells[qid])),
                    "cell")
         .select("q_id", "nn_id", F.round(
             similarity._adc_d2(F.col("qr"), F.col("codes"),
                                ibooks, dim), 6).alias("approx_d2"))
         .withColumn("rnk", F.row_number().over(wq))
         .filter(F.col("rnk") <= k).collect())
        ivf_lat.append(time.time() - t0)

    def recall(s):
        return round(len(s & exact_set) / len(exact_set), 3)

    print(json.dumps({
        "n": n, "n_cells": n_cells, "nprobe": nprobe,
        "probed_fraction": round(nprobe / n_cells, 3),
        "exact_s": round(t_exact, 2),
        "flat_pq_build_s": round(t_pq_build, 2),
        "flat_pq_search_s": round(t_pq, 2),
        "ivfpq_build_s": round(t_ivfpq_build, 2),
        "ivfpq_search_s": round(t_ivfpq, 2),
        "serving_flat_median_s": round(statistics.median(flat_lat), 2),
        "serving_pruned_median_s": round(statistics.median(ivf_lat), 2),
        "recall10_flat_pq": recall(flat_set),
        "recall10_ivfpq": recall(ivfpq_set),
    }))


if __name__ == "__main__":
    main()
