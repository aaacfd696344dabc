"""Distributed logistic regression: hand-checked w=0 gradient,
convergence on separable data, partitioning-invariant decimal sums."""

import math

from pyspark.sql import functions as F

from xtdb_spark.pipeline import classify


def _feat_df(spark, rows):
    # rows: (y, f1..f4); f0 bias appended
    return spark.createDataFrame(
        [(i, y, 1.0, f1, f2, f3, f4)
         for i, (y, f1, f2, f3, f4) in enumerate(rows)],
        "doc_id long, y int, f0 double, f1 double, f2 double, "
        "f3 double, f4 double")


def test_first_step_gradient_hand_checked(spark):
    rows = [(1, 2.0, 3.0, 0.5, 0.1),
            (0, 1.0, 4.0, 0.25, 0.2),
            (0, 3.0, 2.0, 0.75, 0.3)]
    g = classify.first_step_gradient(_feat_df(spark, rows)).collect()[0]
    assert g["n"] == 3 and g["n_pos"] == 1
    # g_j = 0.5*(sum_{y=0} f_j - sum_{y=1} f_j)
    assert g["g0"] == 0.5 * (2.0 - 1.0)
    assert g["g1"] == 0.5 * ((1.0 + 3.0) - 2.0)
    assert g["g2"] == 0.5 * ((4.0 + 2.0) - 3.0)
    assert g["g3"] == 0.5 * ((0.25 + 0.75) - 0.5)
    assert abs(g["g4"] - 0.5 * ((0.2 + 0.3) - 0.1)) < 1e-9


def test_first_step_invariant_to_partitioning(spark):
    rows = [((i * 7) % 2, i * 0.111111, 1.0, 0.5, 0.25)
            for i in range(200)]
    df = _feat_df(spark, rows)
    a = classify.first_step_gradient(df.repartition(1)).collect()[0]
    b = classify.first_step_gradient(df.repartition(13)).collect()[0]
    assert a.asDict() == b.asDict()


def test_train_separates_blobs(spark):
    # y = 1 iff f4 is high; other features are noise-ish constants
    rows = [(1, 2.0 + (i % 5) * 0.1, 5.0, 0.3, 0.8 + (i % 3) * 0.01)
            for i in range(60)]
    rows += [(0, 2.0 + (i % 5) * 0.1, 5.0, 0.3, 0.1 + (i % 3) * 0.01)
             for i in range(60)]
    feats = _feat_df(spark, rows)
    w = classify.train(feats, n_iter=60, lr=1.0)
    assert classify.accuracy(feats, w) >= 0.99
    # the separating feature dominates, signed toward y=1
    assert w[4] > 0 and abs(w[4]) == max(abs(x) for x in w)


def test_score_probability_matches_weights(spark):
    feats = _feat_df(spark, [(1, 1.0, 2.0, 0.5, 0.25)])
    w = [0.1, -0.2, 0.3, 0.4, -0.5]
    r = classify.score(feats, w).collect()[0]
    z = 0.1 * 1 - 0.2 * 1.0 + 0.3 * 2.0 + 0.4 * 0.5 - 0.5 * 0.25
    assert abs(r["p"] - classify.sigmoid(z)) < 1e-12
    assert r["pred"] == int(classify.sigmoid(z) >= 0.5)
    assert abs(classify.sigmoid(0.0) - 0.5) < 1e-15 and math.isfinite(z)


def test_features_on_documents(spark):
    df = spark.createDataFrame(
        [(1, "The quick brown fox and the lazy dog", "en"),
         (2, "汉字文本，没有空格。", "zh")],
        "doc_id long, text string, lang string")
    f = {r["doc_id"]: r for r in classify.features(df).collect()}
    assert f[1]["y"] == 1 and f[2]["y"] == 0
    assert f[1]["f3"] > 0.2            # stopword-rich English
    assert f[2]["f4"] > f[1]["f4"]     # non-alphanumeric density
    assert f[1]["f1"] == round(math.log(1 + 8), 6)
