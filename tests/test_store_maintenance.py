"""Compaction + skew-join tests."""

from pyspark.sql import functions as F

from xtdb_spark.operators.skew import salted_join


def test_optimize_preserves_results(store):
    for day in range(1, 6):
        store.put("m", [{"_id": i, "v": day * 100 + i} for i in range(20)],
                  system_from=f"2024-01-0{day}")
    before = sorted((r["_id"], r["v"]) for r in store.scan("m").collect())
    n_files = store.optimize("m", n_files=2)
    assert n_files == 2
    after = sorted((r["_id"], r["v"]) for r in store.scan("m").collect())
    assert before == after
    # history preserved too
    old = sorted((r["_id"], r["v"]) for r in
                 store.scan("m", system_time="2024-01-02 12:00:00").collect())
    assert all(v < 300 for _, v in old) and len(old) == 20


def test_salted_join_matches_plain_join(spark):
    facts = spark.createDataFrame(
        [(i % 3, f"row{i}") for i in range(100)], "k long, payload string")
    dim = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")],
                                "k long, name string")
    plain = sorted((r["k"], r["payload"], r["name"]) for r in
                   facts.join(dim, "k").collect())
    salted = sorted((r["k"], r["payload"], r["name"]) for r in
                    salted_join(facts, dim, "k", salt=4).collect())
    assert plain == salted
    assert len(salted) == 100
