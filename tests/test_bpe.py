"""BPE tokenizer training/encoding: hand-computed merges on the
Sennrich-style worked example, round-trip decode, distributed ==
local encode, and determinism."""

from pyspark.sql import functions as F

from xtdb_spark.pipeline import bpe


def test_train_local_hand_example():
    # classic worked example: {low:5, lower:2, newest:6, widest:3}
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = bpe.train_local(wc, 4)
    # est</w> path dominates: (e,s)=9, then (es,t)=9, then (est,</w>)=9
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", "</w>")
    # next best: lo appears 5+2=7 > wi/ne/… counts except l,o=7 ties
    assert merges[3] == ("l", "o")


def test_tie_breaks_are_lexicographic():
    # aa and bb both occur twice → the smaller pair merges first
    merges = bpe.train_local([("aabb", 1), ("aabb", 1)], 1)
    assert merges[0] == ("a", "a")


def test_encode_round_trip_and_ranks():
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = bpe.train_local(wc, 6)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ["newest", "lowest", "low", "wider", "unseen", "Zürich",
              "a", ""]:
        toks = bpe.encode_word(w, ranks)
        assert bpe.decode(toks) == w
    # a fully-learned word encodes into few symbols
    assert len(bpe.encode_word("newest", ranks)) < len("newest") + 1


def test_distributed_encode_matches_local(spark):
    rows = [(1, "the lowest low"), (2, "newest widest"), (3, None),
            (4, "ends. with, punctuation!")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    merges = bpe.train(df, n_merges=10, top_words=100)
    got = {r["doc_id"]: r["n_bpe"]
           for r in bpe.encode_counts(df, merges).collect()}
    ranks = {p: i for i, p in enumerate(merges)}
    for doc_id, text in rows:
        expect = 0 if text is None else sum(
            len(bpe.encode_word(w, ranks))
            for w in bpe._PRETOKEN_RE.findall(text))
        assert got[doc_id] == expect


def test_train_is_deterministic(spark):
    rows = [(i, t) for i, t in enumerate(
        ["pack my box with five dozen liquor jugs",
         "the quick brown fox jumps over the lazy dog",
         "jackdaws love my big sphinx of quartz"] * 3)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    m1 = bpe.train(df.repartition(4), n_merges=25, top_words=50)
    m2 = bpe.train(df.repartition(2), n_merges=25, top_words=50)
    assert m1 == m2


def test_word_freqs_counts(spark):
    df = spark.createDataFrame([(1, "ab ab, cd")],
                               "doc_id int, text string")
    got = {r["word"]: r["cnt"]
           for r in bpe.word_freqs(df).collect()}
    assert got == {"ab": 2, ",": 1, "cd": 1}


def test_round_trip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3),
          ("123", 4), ("!", 2)]
    ranks = {p: i for i, p in enumerate(bpe.train_local(wc, 12))}

    @settings(max_examples=300, deadline=None)
    @given(st.text(min_size=0, max_size=24))
    def check(w):
        # encode_word operates on a single pre-token; the property
        # must hold for ARBITRARY unicode words, learned or not
        toks = bpe.encode_word(w, ranks)
        assert bpe.decode(toks) == w
        # merges only ever shrink the symbol count
        assert len(toks) <= len(w) + 1

    check()


def test_train_local_merge_count_bounded():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.tuples(st.text(
        alphabet="abcd", min_size=1, max_size=6),
        st.integers(min_value=1, max_value=9)), min_size=1,
        max_size=12))
    def check(wc):
        merges = bpe.train_local(wc, 50)
        assert len(merges) <= 50
        assert len(set(merges)) == len(merges)  # never re-learn a pair
        ranks = {p: i for i, p in enumerate(merges)}
        for w, _ in wc:
            assert bpe.decode(bpe.encode_word(w, ranks)) == w

    check()


def test_ngram_topk_exact_vs_naive(spark):
    from xtdb_spark.pipeline import text as t

    rows = [(i, f"the quick fox {'jumps high ' * (i % 4)}ends")
            for i in range(40)] + [(99, None), (100, "x y")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    # tiny bucket space forces collisions — exactness must survive
    got = [(r["g"], r["cnt"])
           for r in t.ngram_topk(df, n=3, k=5, buckets=8).collect()]
    from pyspark.sql import functions as F
    ws = F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                  lambda x: x != F.lit(""))
    cols = [F.slice(F.col("ws"), i + 1, F.size("ws") - 2).alias(f"w{i}")
            for i in range(3)]
    naive = (df.select(ws.alias("ws")).filter(F.size("ws") >= 3)
             .select(F.explode(F.arrays_zip(*cols)).alias("z"))
             .select(F.concat_ws(" ", *[F.col("z")[f"w{i}"]
                                        for i in range(3)]).alias("g"))
             .groupBy("g").agg(F.count("*").alias("cnt"))
             .orderBy(F.desc("cnt"), F.asc("g")).limit(5).collect())
    assert got == [(r["g"], r["cnt"]) for r in naive] and len(got) == 5
