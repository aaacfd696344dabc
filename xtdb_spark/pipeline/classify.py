"""Distributed logistic-regression text classifier — model-based
quality/language filtering for the training-data pipeline (the
fasttext-classifier role in published LLM data recipes, e.g. GPT-3's
quality filter), trained INSIDE the engine.

Scale shape: full-batch gradient descent where each iteration is ONE
map-side-combined aggregation over the cached feature frame —
gradient_j = Σ (σ(w·x) − y)·x_j — with the current weights inlined
as literals (no UDF, no driver-side data). Features are computed
once from column math (the same spellings as pipe_text_quality) and
cached; at 100 TB each iteration is a single scan-agg over K+1
doubles per doc, the textbook distributed GD layout. The iteration
count is fixed and the math deterministic, so the learned weights
are reproducible; only float sum ordering varies at the 1e-12 level
(which is why the TRAIN entry is rows-only while the FIRST gradient
step — exact decimal sums from w=0, where σ(0)=1/2 turns the
gradient into 0.5·(Σ_{y=0}x − Σ_{y=1}x) — is oracle-checked).

Weak labels come from a column of the corpus itself (`lang == 'en'`
here); swapping in human or model labels changes nothing structural.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xtdb_spark.pipeline import text as _text

FEATS = ["f0", "f1", "f2", "f3", "f4"]


def features(df: DataFrame, text_col: str = "text",
             label: str = "lang = 'en'") -> DataFrame:
    """doc_id, y, f0..f4 — all 6dp-rounded column math (spellings
    shared with pipe_text_quality so the oracle can mirror them):
    bias, log token count, mean word length, stopword ratio,
    non-alphanumeric density."""
    t = F.col(text_col)
    # r12: f1-f3 all derive from ONE whitespace-normalization regex
    # pass (text.normalized — value-identical, see its docstring);
    # only the punct density keeps its own (different-pattern) regex.
    normed = df.select(
        "doc_id",
        F.expr(label).cast("int").alias("y"),
        t.alias("__t"),
        _text.normalized(t).alias("__norm"))
    toked = normed.select(
        "doc_id", "y", "__t", "__norm",
        _text.norm_tokens(F.col("__norm")).alias("__toks"))
    toks = F.col("__toks")
    n_int = F.size(toks)
    n = n_int.cast("double")
    nonspace = _text.norm_nonspace_chars(F.col("__norm"), n_int)
    n_stop = F.size(F.filter(toks, lambda w: w.isin(*_text.STOPWORDS)))
    punct = F.length(F.regexp_replace(F.col("__t"), r"[A-Za-z0-9\s]", "")) \
        .cast("double")
    return toked.select(
        "doc_id",
        "y",
        F.lit(1.0).alias("f0"),
        F.round(F.log(F.lit(1.0) + n), 6).alias("f1"),
        F.round(nonspace / n, 6).alias("f2"),
        F.round(n_stop.cast("double") / n_int, 6).alias("f3"),
        F.round(punct / (F.lit(1.0) + F.length(F.col("__t"))), 6).alias("f4"))


def first_step_gradient(feats: DataFrame) -> DataFrame:
    """The w=0 gradient as EXACT decimal sums (σ(0)=0.5):
    g_j = 0.5·(Σ_{y=0} f_j − Σ_{y=1} f_j), 6dp — the oracle-checked
    slice of the training math."""
    def g(j: str):
        s0 = F.sum(F.when(F.col("y") == 0, F.col(j)).otherwise(0.0)
                   .cast("decimal(38,6)"))
        s1 = F.sum(F.when(F.col("y") == 1, F.col(j)).otherwise(0.0)
                   .cast("decimal(38,6)"))
        return F.round((F.lit(0.5).cast("decimal(38,6)")
                        * (s0 - s1)).cast("double"), 6).alias("g" + j[1:])

    return feats.agg(F.count("*").alias("n"),
                     F.sum("y").alias("n_pos"), *[g(j) for j in FEATS])


def train(feats: DataFrame, n_iter: int = 40,
          lr: float = 0.5) -> list[float]:
    """Full-batch GD; one agg job per iteration, weights as literals.

    Features are STANDARDIZED first (one mean/std agg; the bias stays
    raw) — raw quality features are collinear and wildly scaled, and
    GD on that conditioning creeps along the loss valley (observed:
    a constant feature absorbing a huge weight while accuracy sat at
    chance). Weights are mapped back to the ORIGINAL feature space,
    so `score`/`accuracy` take raw feature frames."""
    feats = feats.select("y", *FEATS).cache()
    n = feats.count()
    stats = feats.agg(*[F.avg(f).alias("m_" + f) for f in FEATS[1:]],
                      *[F.stddev_pop(f).alias("s_" + f)
                        for f in FEATS[1:]]).collect()[0]
    mean = {f: float(stats["m_" + f]) for f in FEATS[1:]}
    std = {f: max(float(stats["s_" + f] or 0.0), 1e-9)
           for f in FEATS[1:]}
    w = [0.0] * len(FEATS)
    for _ in range(n_iter):
        z = F.lit(w[0]) + sum(
            (F.lit(wj) * (F.col(fj) - F.lit(mean[fj])) / F.lit(std[fj])
             for wj, fj in zip(w[1:], FEATS[1:])), F.lit(0.0))
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        err = p - F.col("y")
        row = feats.agg(
            F.sum(err).alias("f0"),
            *[F.sum(err * (F.col(fj) - F.lit(mean[fj]))
                    / F.lit(std[fj])).alias(fj)
              for fj in FEATS[1:]]).collect()[0]
        w = [wj - lr * row[fj] / n for wj, fj in zip(w, FEATS)]
    feats.unpersist()
    back = [w[0] - sum(w[i] * mean[f] / std[f]
                       for i, f in enumerate(FEATS[1:], start=1))]
    back += [w[i] / std[f] for i, f in enumerate(FEATS[1:], start=1)]
    return back


def score(feats: DataFrame, w: list[float]) -> DataFrame:
    """p = σ(w·x) and the keep decision at 0.5."""
    z = sum((F.lit(wj) * F.col(fj) for wj, fj in zip(w, FEATS)),
            F.lit(0.0))
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return feats.withColumn("p", p).withColumn(
        "pred", (F.col("p") >= 0.5).cast("int"))


def accuracy(feats: DataFrame, w: list[float]) -> float:
    s = score(feats, w)
    r = s.agg(F.avg((F.col("pred") == F.col("y")).cast("double"))
              .alias("acc")).collect()[0]
    return float(r["acc"])


def sigmoid(z: float) -> float:
    return 1.0 / (1.0 + math.exp(-z))
