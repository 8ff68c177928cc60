"""Distributed BPE tokenizer training + Arrow-batched subword encoding.

Every pretraining pipeline trains a subword tokenizer on its curated
corpus before anything else sees a "token" — and the canonical BPE
trainer (Sennrich et al., ACL 2016 `arXiv:1508.07909`; the algorithm
behind GPT-2/RoBERTa vocabularies and HuggingFace `tokenizers`) has a
naturally two-tier shape that maps onto Spark exactly the way the
production trainers map onto their corpora:

1. **Corpus pass (distributed, the only part that scales with data):**
   one map-side-combinable ``groupBy(word).count()`` over the canonical
   tokens. At 100 TB this is the same shuffle shape as the index
   build's df stage.
2. **Merge loop (driver, bounded):** classic BPE trains on the WORD
   TYPE table, never the corpus — HF/SentencePiece do exactly this.
   The type table is capped to the ``max_word_types`` most frequent
   words (deterministic ``(count desc, word)`` order), so the driver
   materialization is bounded the same way the WAND id-set collects
   are: a documented cap, not an unbounded ``.collect()``. The loop
   maintains pair counts incrementally (only words containing the
   merged pair are re-segmented), ties broken lexicographically so the
   merge sequence is a pure function of the count table.
3. **Encode (distributed again):** merges broadcast as a rank table;
   encoding is the HF greedy-by-rank loop, memoized per distinct word,
   inside ONE Arrow-batched pandas UDF (never per-row Python over the
   corpus — per *word type* within a batch, which is the memoization
   grain that makes BPE encoding cheap everywhere).

Words are the canonical tokenizer's tokens (lowercase ``[a-z0-9]{2,}``,
:mod:`~search_engine_core_spark.functions.tokenizer`) with the
Sennrich end-of-word marker appended as its own symbol, so the
concatenation of a word's subword tokens always reconstructs
``word + marker`` (round-trip test-pinned). The base alphabet is the
word's characters — every word encodes, no UNK.

Reference: no analog — beyond-reference training-data-pipeline surface,
same family as :mod:`~search_engine_core_spark.operators.sampling`
(the ``pack_sequences`` consumer of these token counts).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from search_engine_core_spark.functions.tokenizer import tokenize_expr

END_OF_WORD = "</w>"


@dataclass(frozen=True)
class BPEModel:
    """An ordered merge list (rank = position), the training alphabet,
    and the end-of-word marker. ``vocab()`` = alphabet ∪ end-of-word ∪
    merge outputs — the alphabet is carried explicitly because a
    character that never participates in a selected merge still encodes
    as its own token (the 'every word encodes, no UNK' contract), so a
    consumer sizing an id/embedding table from ``vocab()`` must see it.
    Serialization is merges + alphabet, the same minimal form as a HF
    ``merges.txt`` + initial-alphabet pair."""

    merges: tuple[tuple[str, str], ...]
    end_of_word: str = END_OF_WORD
    alphabet: tuple[str, ...] = ()

    def ranks(self) -> dict[tuple[str, str], int]:
        return {p: i for i, p in enumerate(self.merges)}

    def vocab(self) -> set[str]:
        out = {self.end_of_word, *self.alphabet}
        for a, b in self.merges:
            out.update((a, b, a + b))
        return out

    def save(self, path: str) -> None:
        with open(path, "w") as fh:
            json.dump(
                {"end_of_word": self.end_of_word,
                 "merges": [list(p) for p in self.merges],
                 "alphabet": list(self.alphabet)},
                fh,
            )

    @classmethod
    def load(cls, path: str) -> "BPEModel":
        with open(path) as fh:
            d = json.load(fh)
        return cls(
            merges=tuple((a, b) for a, b in d["merges"]),
            end_of_word=d["end_of_word"],
            # pre-alphabet model files load with an empty alphabet —
            # encode is unaffected (ranks drive it); only vocab() grew
            alphabet=tuple(d.get("alphabet", ())),
        )


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(word, cnt)`` over the canonical tokens — the one corpus-scale
    pass of BPE training (map-side-combinable)."""
    return (
        docs.select(F.explode(tokenize_expr(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    *,
    n_merges: int = 1000,
    max_word_types: int = 1_000_000,
    min_pair_count: int = 2,
    end_of_word: str = END_OF_WORD,
) -> BPEModel:
    """Train BPE merges on ``docs`` — one distributed word-count pass,
    then the Sennrich merge loop over the (capped) word-type table.
    Deterministic: the type table is taken in ``(cnt desc, word)``
    order and merge ties break on the lexicographically smallest pair,
    so the merge sequence is a pure function of the word counts.
    Stops early when no pair reaches ``min_pair_count`` (merging
    singletons memorizes noise)."""
    rows = (
        word_counts(docs, text_col)
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(max_word_types)
        .collect()
    )
    return train_bpe_from_counts(
        [(r["word"], r["cnt"]) for r in rows],
        n_merges=n_merges,
        min_pair_count=min_pair_count,
        end_of_word=end_of_word,
    )


def train_bpe_from_counts(
    counts: Iterable[tuple[str, int]],
    *,
    n_merges: int = 1000,
    min_pair_count: int = 2,
    end_of_word: str = END_OF_WORD,
) -> BPEModel:
    """The driver-side merge loop (public so a persisted word-count
    table can be reused across vocab sizes without another corpus
    pass). Incremental: each merge re-segments only the words that
    contain the pair, and pair counts are updated by delta."""
    words: list[list[str]] = []
    wcnt: list[int] = []
    alphabet: set[str] = set()
    for w, c in counts:
        words.append(list(w) + [end_of_word])
        wcnt.append(int(c))
        alphabet.update(w)

    import heapq
    from collections import Counter, defaultdict

    pair_counts: Counter = Counter()
    pair_words: defaultdict[tuple[str, str], set[int]] = defaultdict(set)
    for i, syms in enumerate(words):
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] += wcnt[i]
            pair_words[(a, b)].add(i)

    # lazy max-heap keyed (-count, pair): stale entries are skipped on
    # pop, so each merge costs O(log P) amortized instead of a full
    # O(P) scan — the difference between minutes and hours at the
    # 1M-word-type cap. Order matches the scan rule exactly: highest
    # count, ties to the lexicographically smallest pair.
    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)

    merges: list[tuple[str, str]] = []
    merged_set: set[tuple[str, str]] = set()
    while len(merges) < n_merges and heap:
        negc, best = heapq.heappop(heap)
        cur = pair_counts.get(best, 0)
        if -negc != cur:
            continue  # stale entry; every live count has a fresh one queued
        if cur < min_pair_count:
            break  # valid top of the heap IS the global max — done
        if best not in merged_set:
            # a pair can RE-FORM after later merges build the same symbol
            # string by another path (e.g. ("a","bc") also yielding "abc"
            # next to "d" after ("ab","c")+("abc","d") were selected);
            # it already holds a rank, so apply the re-segmentation below
            # without appending a duplicate — a duplicate would waste an
            # n_merges slot and ranks() would keep the later (wrong)
            # priority for encode
            merges.append(best)
            merged_set.add(best)
        merged = best[0] + best[1]
        touched: set[tuple[str, str]] = set()
        for i in sorted(pair_words[best]):
            syms = words[i]
            # drop the word's old pair contributions…
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] -= wcnt[i]
                touched.add((a, b))
                if pair_counts[(a, b)] <= 0:
                    del pair_counts[(a, b)]
                pair_words[(a, b)].discard(i)
            # …re-segment…
            out: list[str] = []
            j = 0
            while j < len(syms):
                if j + 1 < len(syms) and (syms[j], syms[j + 1]) == best:
                    out.append(merged)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
            # …and add the new contributions back
            for a, b in zip(out, out[1:]):
                pair_counts[(a, b)] += wcnt[i]
                touched.add((a, b))
                pair_words[(a, b)].add(i)
        for p in touched:
            c = pair_counts.get(p, 0)
            if c > 0:
                heapq.heappush(heap, (-c, p))
    return BPEModel(merges=tuple(merges), end_of_word=end_of_word,
                    alphabet=tuple(sorted(alphabet)))


def encode_word(
    word: str,
    ranks: dict[tuple[str, str], int],
    end_of_word: str = END_OF_WORD,
) -> list[str]:
    """HF-style greedy encode: repeatedly merge the lowest-rank adjacent
    pair. For words seen in training this reproduces the training
    segmentation (the classic BPE equivalence, test-pinned); unseen
    words fall back toward characters — never UNK."""
    syms = list(word) + [end_of_word]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        pair = (syms[best_i], syms[best_i + 1])
        merged = pair[0] + pair[1]
        # merge every occurrence of THIS pair in one pass (rank order
        # is global, so occurrence order within the pass is immaterial)
        out: list[str] = []
        j = 0
        while j < len(syms):
            if j + 1 < len(syms) and (syms[j], syms[j + 1]) == pair:
                out.append(merged)
                j += 2
            else:
                out.append(syms[j])
                j += 1
        syms = out
    return syms


def bpe_tokens(model: BPEModel, text: Column | str) -> Column:
    """``array<string>`` of subword tokens for a text column — ONE
    Arrow-batched pandas UDF, memoized per distinct word within each
    batch (the corpus re-uses a small set of word types, so the greedy
    loop runs per TYPE, not per occurrence)."""
    ranks = model.ranks()
    eow = model.end_of_word

    from search_engine_core_spark.functions.tokenizer import tokenize_py

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _enc(s: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def enc_text(t: str) -> list[str]:
            out: list[str] = []
            for w in tokenize_py(t):
                got = cache.get(w)
                if got is None:
                    got = cache[w] = encode_word(w, ranks, eow)
                out.extend(got)
            return out

        return s.map(enc_text)

    return _enc(F.col(text) if isinstance(text, str) else text)


def bpe_token_count(model: BPEModel, text: Column | str) -> Column:
    """Subword token count under a TRAINED vocabulary — the number
    ``pack_sequences`` budgets should use when the training tokenizer
    is BPE rather than the whitespace/regex approximations in
    :mod:`~search_engine_core_spark.functions.text_quality`."""
    return F.size(bpe_tokens(model, text))
