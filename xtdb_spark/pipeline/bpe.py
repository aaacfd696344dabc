"""Distributed BPE tokenizer training + encoding (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units").

An LLM-data pipeline needs the tokenizer itself trained on the
corpus, not just token COUNTS (text.py:bpe_ish_token_count is the
counting proxy). The published algorithm is inherently sequential in
its merge loop, so the scale split follows the same bounded-fit /
broadcast-apply shape as k-means (similarity.py:205-225):

1. **Word-frequency table** — the ONLY corpus-wide pass. BPE's merge
   statistics depend only on (word, count), so 100 TB of text
   collapses to one `explode → groupBy(word)` shuffle whose result is
   vocabulary-sized (Heaps' law: ~10⁶-10⁷ rows), corpus-size-
   independent afterwards.
2. **Bounded local fit** — the top-`top_words` rows by (count, word)
   are collected (explicit, documented bound — at Zipf mass the top
   50k words cover ≥99.9% of occurrences) and the merge loop runs
   driver-side with incremental pair-count maintenance; n_merges
   Spark jobs for a Python-loop algorithm would pay the per-job floor
   n_merges times for no extra statistical power.
3. **Broadcast encode** — the learned merge ranks broadcast to an
   Arrow-batched UDF; encoding is embarrassingly parallel and
   per-batch word-memoized (Zipf again: cache hits dominate).

Word boundary convention: pre-tokens are letter runs / digit runs /
single non-space symbols (the same classes as
text.py:bpe_ish_token_count, portable between Java regex and RE2 for
the oracle); each pre-token gets the `</w>` end-of-word sentinel, so
`decode(encode(w)) == w` exactly (round-trip property test).
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# portable between Java regex (Spark), RE2 (DuckDB) and Python `re`
PRETOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
_PRETOKEN_RE = re.compile(PRETOKEN_PATTERN)
EOW = "</w>"


def pretokens(text: Column) -> Column:
    """Pre-token array column (letter runs, digit runs, single
    symbols) — whole-stage-codegen regex, no UDF."""
    return F.regexp_extract_all(text, F.lit(PRETOKEN_PATTERN), F.lit(0))


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The one corpus-wide pass: (word, cnt), map-side combined."""
    return (docs
            .select(F.explode(pretokens(F.col(text_col))).alias("word"))
            .groupBy("word").agg(F.count("*").alias("cnt")))


# ---- local merge loop (runs on the bounded top-V table) ----------------


def _merge_word(syms: tuple, a: str, b: str, ab: str) -> tuple:
    out, i, n = [], 0, len(syms)
    while i < n:
        if i < n - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(ab)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_local(word_counts: list[tuple[str, int]],
                n_merges: int) -> list[tuple[str, str]]:
    """Exact BPE merge learning over a (word, count) table.
    Deterministic: ties on pair count break to the lexicographically
    smallest pair. Pair counts are maintained incrementally — after a
    merge only the words that contained the pair are rescanned."""
    words: list[tuple[tuple, int]] = [
        (tuple(w) + (EOW,), c) for w, c in word_counts if w]
    pair_counts: Counter = Counter()
    where: dict[tuple, set[int]] = {}
    for idx, (syms, c) in enumerate(words):
        for p in zip(syms, syms[1:]):
            pair_counts[p] += c
            where.setdefault(p, set()).add(idx)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        top = max(pair_counts.values())
        if top <= 0:
            break
        best = min(p for p, c in pair_counts.items() if c == top)
        merges.append(best)
        ab = best[0] + best[1]
        for idx in list(where.get(best, ())):
            syms, c = words[idx]
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= c
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                s = where.get(p)
                if s:
                    s.discard(idx)
            syms = _merge_word(syms, best[0], best[1], ab)
            words[idx] = (syms, c)
            for p in zip(syms, syms[1:]):
                pair_counts[p] += c
                where.setdefault(p, set()).add(idx)
    return merges


def train(docs: DataFrame, n_merges: int = 200, top_words: int = 50_000,
          text_col: str = "text") -> list[tuple[str, str]]:
    """Distributed stats + bounded local fit (see module docstring).
    The collect is capped at `top_words` rows of (word, cnt) — the
    explicit driver-side bound, ordered deterministically."""
    top = (word_freqs(docs, text_col)
           .orderBy(F.desc("cnt"), F.asc("word"))
           .limit(top_words)
           .collect())
    return train_local([(r["word"], r["cnt"]) for r in top], n_merges)


# ---- encoding -----------------------------------------------------------


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy rank-order BPE encode of one pre-token: repeatedly merge
    the lowest-rank adjacent pair (all its occurrences), exactly the
    published inference procedure."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, p
        if best_pair is None:
            break
        syms = list(_merge_word(tuple(syms), best_pair[0], best_pair[1],
                                best_pair[0] + best_pair[1]))
    return syms


def decode(tokens: list[str]) -> str:
    """Inverse of encode at the word level (round-trip property).
    Only the TRAILING sentinel strips — a word whose own characters
    spell `</w>` must survive (hypothesis round-trip test)."""
    s = "".join(tokens)
    return s[:-len(EOW)] if s.endswith(EOW) else s


def encode_counts(docs: DataFrame, merges: list[tuple[str, str]],
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """doc_id → BPE token count under the learned merges. Arrow-
    batched pandas UDF with a per-batch word→length memo (Zipf: the
    cache hits dominate, so per-doc cost is near the distinct-word
    count, not the token count). merges ride the closure → one
    broadcast per executor."""
    from pyspark.sql.functions import pandas_udf

    ranks = {p: i for i, p in enumerate(merges)}

    @pandas_udf("int")
    def n_bpe(texts: pd.Series) -> pd.Series:
        memo: dict[str, int] = {}

        def count(t) -> int:
            if t is None:
                return 0
            total = 0
            for w in _PRETOKEN_RE.findall(t):
                n = memo.get(w)
                if n is None:
                    n = len(encode_word(w, ranks))
                    memo[w] = n
                total += n
            return total

        return texts.map(count)

    return docs.select(F.col(id_col),
                       n_bpe(F.col(text_col)).alias("n_bpe"))
