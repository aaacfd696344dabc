"""Text analysis over document tables — language ID, quality scoring,
token counting, fingerprinting. Pure Column expressions (JVM-side,
whole-stage codegen); designed so the same logic is expressible in
ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# deterministic marker-word sets for the n-gram/stopword language
# heuristic (scores are computed identically in the SQL oracle)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
}

STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "it", "that", "for"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization."""
    return F.split(F.trim(text), r"\s+")


def normalized(text: Column) -> Column:
    r"""Whitespace-normal form: lowercased, space-trimmed, every \s+
    run collapsed to ONE space — a single regex pass that every
    downstream text signal can derive from (r12, guide §1.2 "don't
    compute things twice" applied to per-row work):

    - ``tokens(lower(text))``      == ``F.split(norm, " ")`` (literal
      split, no regex scan of the document)
    - exact-dup fingerprint        == ``F.md5(norm)``
    - non-whitespace char count    == ``F.length(norm) - (n_tokens - 1)``

    The equivalences hold for ALL inputs, including leading/trailing
    non-space whitespace (each \s+ run maps to exactly one space, so
    the literal split reproduces the same empty edge tokens) and
    empty/all-whitespace strings (split("", " ") == [""] on both
    spellings). Alias the result ONCE and derive from the alias —
    CollapseProject keeps a multiply-referenced non-cheap alias in
    its own Project, so the regex runs once per row."""
    return F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")


def norm_tokens(norm: Column) -> Column:
    """Tokens of the ORIGINAL text, recovered from the normal form by
    a literal single-space split (identical to tokens(lower(text)) —
    see normalized())."""
    return F.split(norm, " ")


def norm_nonspace_chars(norm: Column, n_tokens: Column) -> Column:
    r"""Non-whitespace character count of the original text, from the
    normal form: length minus the (n_tokens - 1) separator spaces —
    identical to length(regexp_replace(text, '\s+', '')) without the
    extra regex pass (lower() and trim() preserve non-\s content)."""
    return (F.length(norm) - (n_tokens - F.lit(1))).cast("double")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish proxy: count regex word-pieces (runs of letters, runs
    of digits, single punctuation) — a deterministic stand-in for a
    real tokenizer's token count."""
    stripped = F.regexp_replace(text, r"[A-Za-z]+|[0-9]+", "")
    pieces = F.size(F.filter(F.split(text, r"[^A-Za-z0-9]+"),
                             lambda w: w != F.lit("")))
    return pieces + F.length(F.regexp_replace(stripped, r"\s", ""))


def marker_hits(text: Column, markers: list[str],
                toks: Column | None = None) -> Column:
    """How many tokens are in the marker list. Pass a precomputed
    token array as `toks` to skip the tokenizing regex pass."""
    t = toks if toks is not None else tokens(F.lower(text))
    return F.size(F.filter(t, lambda w: w.isin(*markers)))


def lang_id(text: Column, toks: Column | None = None) -> Column:
    """Marker-word language heuristic: argmax over per-language hit
    counts, ties broken by language code order, 'und' when all zero."""
    scores = [(lang, marker_hits(text, m, toks))
              for lang, m in sorted(LANG_MARKERS.items())]
    # argmax: first language (alphabetical) with maximal score,
    # 'und' if the max score is 0
    max_score = F.greatest(*[s for _, s in scores])
    expr = F.lit("und")
    for lang, score in reversed(scores):
        expr = F.when(score == max_score, F.lit(lang)).otherwise(expr)
    return F.when(max_score <= 0, F.lit("und")).otherwise(expr)


def stopword_ratio(text: Column) -> Column:
    t = tokens(F.lower(text))
    return marker_hits(text, STOPWORDS).cast("double") / F.size(t)


def quality_score(text: Column, toks: Column | None = None,
                  nonspace: Column | None = None) -> Column:
    """Deterministic quality heuristic: mean word length band +
    stopword presence + length band, scaled to [0, 1].

    Pass a precomputed lowercased token array as `toks` to avoid
    re-tokenizing (regex split is the dominant cost of this score),
    and a precomputed non-whitespace char count as `nonspace` (see
    norm_nonspace_chars) to skip the strip-regex pass too; the
    defaults recompute both from `text`."""
    t = toks if toks is not None else tokens(F.lower(text))
    n = F.size(t)
    ns = (nonspace if nonspace is not None
          else F.length(F.regexp_replace(text, r"\s+", "")).cast("double"))
    avg_wlen = ns / n
    len_ok = (n >= 10) & (n <= 10000)
    wlen_ok = (avg_wlen >= 3.0) & (avg_wlen <= 10.0)
    n_stop = F.size(F.filter(t, lambda w: w.isin(*STOPWORDS)))
    stop_ok = (n_stop.cast("double") / n) > 0.05
    return (len_ok.cast("int") + wlen_ok.cast("int") + stop_ok.cast("int")) \
        .cast("double") / 3.0


def fingerprint(text: Column) -> Column:
    """Normalized-content fingerprint: md5 of lowercase,
    whitespace-collapsed text — the exact-dup key."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))


# --------------------------------------------------------------- PII

# Category → (pattern, replacement token). Patterns are written in
# the common subset of Java regex (Spark) and RE2 (DuckDB oracle):
# character classes, bounded repetition, \b word boundaries — no
# lookarounds/backrefs. Applied in this fixed order (SSN before phone
# keeps the 3-2-4 digit shape from ever being read as a phone).
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
]


def pii_counts(text: Column) -> list[Column]:
    """Per-category PII occurrence counts (JVM regexp_count — one
    codegen'd pass per pattern, no UDF)."""
    return [F.regexp_count(text, F.lit(pat)).alias(f"n_{name}")
            for name, pat, _ in PII_PATTERNS]


def pii_redact(text: Column) -> Column:
    """Replace every PII match with its category token, applying the
    patterns in PII_PATTERNS order."""
    out = text
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def repetition_stats(df, id_col: str = "doc_id",
                     text_col: str = "text"):
    """Gopher-style intra-document repetition signals (Rae et al.
    2021, "Scaling Language Models: Methods, Analysis & Insights from
    Training Gopher", appendix A1.1 repetition filters — the public
    heuristic set MassiveText used): distinct-word ratio, the
    fraction of words taken by the most frequent word, and the
    fraction of characters covered by the most frequent word bigram.
    High top-gram fractions flag boilerplate/spam documents a
    training pipeline should drop.

    All quantities stay exact integers (counts, character lengths)
    until one final division, so values are bit-stable across
    engines, partition counts, and row orders. Argmax ties break on
    the token string (deterministic).

    Scale shape (100 TB): token and bigram counts shuffle on
    (doc, token) — fully parallel with map-side combine; the per-doc
    top-1 is a rank-1 window over the per-doc count relation (keyed
    by doc, never global); bigrams come from zip_with over the
    already-split array, so the text is tokenized once. No Python
    UDF anywhere.
    """
    from pyspark.sql import Window

    ws = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.select(F.col(id_col).alias("doc_id"),
                     F.length(text_col).alias("tc"), ws.alias("ws"))
    # explode_outer + isNotNull ≡ explode here (split yields no null
    # elements; outer's extra null row only stands in for NULL-text
    # docs, which plain explode also drops) — but WITHOUT the inferred
    # size(ws)>0 filter that re-derives the split per row (see
    # dedup._shingle_table).
    w = (base.select("doc_id", F.explode_outer("ws").alias("w"))
         .where(F.col("w").isNotNull()))
    # r12 (guide §2.4): every word-level signal derives from the
    # per-doc word counts, so ONE aggregate over them replaces the
    # old wstats (countDistinct = its own two-shuffle pass over a
    # second tokenize replay) + rank-1 window + join: n_words = Σcnt,
    # n_distinct = #groups, and top_word_cnt = max(cnt) — the old
    # window's (desc cnt, asc w) tie-break picked WHICH word wins,
    # never the cnt value itself, so max(cnt) is value-identical.
    wstats = (w.groupBy("doc_id", "w").agg(F.count("*").alias("cnt"))
              .groupBy("doc_id").agg(
                  F.sum("cnt").alias("n_words"),
                  F.count("*").alias("n_distinct"),
                  F.max("cnt").alias("top_word_cnt")))
    grams = F.when(
        F.size("ws") >= 2,
        F.zip_with(F.slice("ws", 1, F.size("ws") - 1),
                   F.slice("ws", 2, F.size("ws") - 1),
                   lambda a, b: F.concat_ws(" ", a, b))
    ).otherwise(F.array().cast("array<string>"))
    g = base.select("doc_id", "tc", F.explode(grams).alias("g"))
    rank_g = Window.partitionBy("doc_id").orderBy(F.desc("cnt"), F.asc("g"))
    gtop = (g.groupBy("doc_id", "tc", "g").agg(F.count("*").alias("cnt"))
            .withColumn("rn", F.row_number().over(rank_g))
            .filter(F.col("rn") == 1)
            .select("doc_id",
                    F.round((F.col("cnt") * F.length("g"))
                            .cast("double") / F.col("tc"), 6)
                    .alias("top_bigram_char_frac")))
    return (wstats.join(gtop, "doc_id", "left")
            .select("doc_id",
                    F.round(F.col("n_distinct").cast("double")
                            / F.col("n_words"), 6)
                    .alias("distinct_word_ratio"),
                    F.round(F.col("top_word_cnt").cast("double")
                            / F.col("n_words"), 6)
                    .alias("top_word_frac"),
                    F.coalesce("top_bigram_char_frac", F.lit(0.0))
                    .alias("top_bigram_char_frac")))


def bigram_lm_xent(df, id_col: str = "doc_id", text_col: str = "text",
                   k: float = 0.5, max_xent: float = 7.0):
    """Perplexity quality filtering via a corpus-trained bigram LM —
    the CCNet / Gopher-pipeline heuristic (Wenzek et al. 2020 filter
    web text by LM perplexity; no external model weights exist in
    this container, so the LM is trained on the corpus itself, which
    is also what makes the op deterministic and oracle-expressible).

    Model: P(w2|w1) = (c(w1 w2) + k) / (c(w1 ·) + k·V), add-k
    smoothing with V = |distinct successor words| and c(w1 ·) the
    bigram-context count. Per-document score is the mean negative
    log-prob over its bigrams (cross-entropy, nats). Perplexity is
    e^xent — strictly monotone in xent — so `keep = xent <= max_xent`
    IS the perplexity filter, without exp()'s cross-engine float
    drift. Gibberish/boilerplate scores high, fluent text low.

    Scale shape (100 TB): word-count shaped. One explode over token
    bigrams; two groupBys on word keys (map-side partial aggs); then
    the doc-bigram stream joins the two count relations on word keys
    — hot heads ("of the") are skew-split by AQE; no driver collect
    (V rides a 1-row broadcast). Value-hash determinism: per-bigram
    log-probs round to 6dp and sum as DECIMAL (exact, order-
    independent) before the final 4dp rounding.
    """
    ts = F.split(F.trim(F.regexp_replace(F.lower(F.col(text_col)),
                                         "[^a-z]+", " ")), " +")
    # No pre-explode `size(ts) >= 2` filter: pushdown substitutes the
    # full tokenize tree into the condition, re-running the regex per
    # doc in EVERY arm that replays this subtree (4 arms → 4 extra
    # regex passes; see dedup._shingle_table). The slices below yield
    # an EMPTY pairs array for 1-token docs (slice length 0) and NULL
    # for NULL text, so explode_outer + isNotNull drops exactly the
    # docs that filter dropped (arrays_zip elements are structs,
    # never null).
    toks = df.select(F.col(id_col).alias("doc_id"), ts.alias("ts"))
    pairs = F.arrays_zip(
        F.slice(F.col("ts"), 1, F.size("ts") - 1).alias("w1"),
        F.slice(F.col("ts"), 2, F.size("ts") - 1).alias("w2"))
    bg = (toks.select("doc_id", F.explode_outer(pairs).alias("p"))
          .where(F.col("p").isNotNull())
          .select("doc_id", "p.w1", "p.w2"))
    # uni and vocab DERIVED from bgc instead of re-scanning bg (r12,
    # guide §2.4): c(w1 ·) = Σ_w2 c(w1,w2) and the distinct-w2 set of
    # bgc is the distinct-w2 set of bg, exactly. Tokenize+explode
    # replays drop 4 → 2 and the two full-bigram-stream aggregates
    # become aggregates over the (much smaller) distinct-bigram
    # relation, whose shuffle ReuseExchange shares.
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


def global_shuffle(df, seed: int = 0, id_col: str = "doc_id",
                   partitions: int | None = None):
    """Deterministic global shuffle for training-order randomization:
    every row gets a pseudo-random but REPRODUCIBLE sort key
    (md5 of id + seed — engine-portable, no RNG state), and the
    corpus is range-partitioned + sorted by it.  At cluster scale
    this is ONE range shuffle (repartitionByRange samples the key
    space, so partitions balance even though md5 is uniform anyway) —
    no global window, no driver collect; changing `seed` gives an
    independent permutation for each training epoch."""
    keyed = df.withColumn(
        "shuffle_key",
        F.md5(F.concat(F.col(id_col).cast("string"),
                       F.lit(f":{seed}"))))
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    return (keyed.repartitionByRange(n, "shuffle_key")
            .sortWithinPartitions("shuffle_key"))


def normalize_text(col_name: str = "text", form: str = "NFC",
                   casefold: bool = True):
    """Unicode normalization for corpus prep: NFC/NFKC/NFD/NFKD via
    a vectorized pandas UDF (Spark has no builtin normalizer;
    unicodedata is stdlib, Arrow-batched — no per-row Python calls
    into the JVM).  `casefold` applies the full Unicode casefold
    (stronger than lower() for ß, dotted I, …)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _norm_fn(s):
        import unicodedata

        def one(x):
            if x is None:
                return None
            y = unicodedata.normalize(form, x)
            return y.casefold() if casefold else y
        return s.map(one)

    # set real (non-stringified) hints — this module uses
    # `from __future__ import annotations`, which would otherwise
    # leave pandas_udf unable to resolve the signature
    _norm_fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
    _norm = pandas_udf(_norm_fn, "string")
    return _norm(F.col(col_name))


def ngram_topk(df, n: int = 3, k: int = 50, text_col: str = "text",
               buckets: int = 1 << 20):
    """EXACT corpus top-k word n-grams via two-pass bucket pruning —
    the heavy-hitters shape for 100 TB, where the naive
    explode+groupBy would shuffle the full n-gram key space (~10¹¹
    distinct keys at web scale).

    Pass 1 aggregates xxhash64(gram) % `buckets` — a FIXED-width
    shuffle (2²⁰ keys) with map-side combine. Pass 2a exact-counts
    grams only in the top-k buckets and takes c_hat = the k-th
    highest exact count found there. Pass 2b exact-counts grams in
    every bucket whose total ≥ c_hat — a bucket's count bounds every
    member's count, so any gram with count ≥ c_hat lives in such a
    bucket: the final top-k is EXACT (collisions only ever widen
    bucket counts, keeping the candidate set a superset). Ties break
    on the gram text for a deterministic result.

    The bucketed gram stream is MATERIALIZED once (localCheckpoint)
    and every pass reads the materialized rows: lazily, pass 1, the
    c_hat probe and pass 2b each replayed the split+zip+explode
    corpus pass (~2.7 s/replay at the sf1 replica — 3 replays,
    entry 8.8 → 5.4 s warm, r12). Same barrier pattern (and the same
    O(corpus) local-storage trade, comparable to one shuffle write
    of the stream) as dedup._gram_arrays_ck; the bucket-count
    relation is checkpointed too (≤`buckets` rows, a few MB) since
    both the top-k probe and the 2b bucket filter read it."""
    from pyspark.sql import functions as F

    ws = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                  lambda x: x != F.lit(""))
    cols = [F.slice(F.col("ws"), i + 1, F.size("ws") - n + 1)
            .alias(f"w{i}") for i in range(n)]
    grams = (df.select(ws.alias("ws"))
             .filter(F.size("ws") >= n)
             .select(F.explode(F.arrays_zip(*cols)).alias("z"))
             .select(F.concat_ws(
                 " ", *[F.col("z").getField(f"w{i}") for i in range(n)])
                 .alias("g")))
    bucketed = grams.withColumn(
        "b", F.pmod(F.xxhash64("g"), F.lit(buckets))).localCheckpoint()
    bcnt = (bucketed.groupBy("b").agg(F.count("*").alias("bc"))
            .localCheckpoint())
    topb = bcnt.orderBy(F.desc("bc"), F.asc("b")).limit(k)
    # 2a: exact counts inside the heaviest buckets → candidate floor
    in_top = (bucketed.join(F.broadcast(topb), "b")
              .groupBy("g").agg(F.count("*").alias("cnt")))
    c_hat = (in_top.orderBy(F.desc("cnt"), F.asc("g")).limit(k)
             .agg(F.min("cnt").alias("c")).collect()[0]["c"]) or 1
    # 2b: exact counts in every bucket that could hold a ≥ c_hat gram
    cand_b = bcnt.filter(F.col("bc") >= c_hat).select("b")
    return (bucketed.join(F.broadcast(cand_b), "b")
            .groupBy("g").agg(F.count("*").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("g")).limit(k))
