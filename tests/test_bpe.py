"""BPE trainer/encoder: the Sennrich paper corpus pinned merge-by-merge,
round-trip and training-segmentation equivalence, determinism across
partitionings, the distributed Arrow encode vs the pure-Python twin,
and model persistence."""

from __future__ import annotations

import pytest

from search_engine_core_spark.functions.tokenizer import tokenize_py
from search_engine_core_spark.operators import bpe

# Sennrich et al. 2016 §3.2 example vocabulary
SENNRICH = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_sennrich_merge_sequence():
    """First merges on the paper corpus, derived by hand under this
    trainer's tie rule (highest count, then lexicographically smallest
    pair): es(9), est(9), est</w>(9), lo(7), low(7), ew(6)."""
    model = bpe.train_bpe_from_counts(SENNRICH, n_merges=6)
    assert model.merges == (
        ("e", "s"),
        ("es", "t"),
        ("est", "</w>"),
        ("l", "o"),
        ("lo", "w"),
        ("e", "w"),
    )


def _apply_merges_sequentially(word: str, model: bpe.BPEModel) -> list[str]:
    """Training-order replay: apply each merge globally in rank order —
    the segmentation the trainer itself would leave the word with."""
    syms = list(word) + [model.end_of_word]
    for a, b in model.merges:
        out, j = [], 0
        while j < len(syms):
            if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                out.append(a + b)
                j += 2
            else:
                out.append(syms[j])
                j += 1
        syms = out
    return syms


def test_encode_matches_training_segmentation():
    """Greedy-by-rank encode must reproduce the training segmentation
    for every trained word (the classic BPE equivalence)."""
    model = bpe.train_bpe_from_counts(SENNRICH, n_merges=50, min_pair_count=1)
    ranks = model.ranks()
    for w, _ in SENNRICH:
        assert bpe.encode_word(w, ranks) == _apply_merges_sequentially(w, model)


def test_round_trip_and_unseen_words():
    model = bpe.train_bpe_from_counts(SENNRICH, n_merges=10)
    ranks = model.ranks()
    for w in ["low", "lower", "newest", "widest", "lowest", "wide", "zq"]:
        toks = bpe.encode_word(w, ranks)
        assert "".join(toks) == w + "</w>", (w, toks)
    # unseen word with no trained pairs falls back to characters + marker
    assert bpe.encode_word("zq", ranks) == ["z", "q", "</w>"]
    # 'lowest' composes trained subwords: low + est</w>
    assert bpe.encode_word("lowest", ranks) == ["low", "est</w>"]


def test_vocab_includes_unmerged_alphabet():
    """A character that never participates in a selected merge still
    encodes as its own token, so vocab() must contain it — a consumer
    sizing an id table from vocab() would otherwise hit OOV at encode
    time, violating the no-UNK contract."""
    model = bpe.train_bpe_from_counts([("abz", 5)], n_merges=1,
                                      min_pair_count=1)
    assert model.merges == (("a", "b"),)
    assert "z" in model.vocab()
    assert "z" in bpe.encode_word("abz", model.ranks())
    # merge members/outputs and the marker are all there too
    assert {"a", "b", "ab", "</w>"} <= model.vocab()


def test_min_pair_count_stops_early():
    model = bpe.train_bpe_from_counts([("ab", 1), ("cd", 1)], n_merges=10)
    assert model.merges == ()  # every pair is a singleton
    model2 = bpe.train_bpe_from_counts(
        [("ab", 1), ("cd", 1)], n_merges=10, min_pair_count=1
    )
    assert len(model2.merges) > 0


@pytest.fixture(scope="module")
def docs(spark):
    text = " ".join(w for w, c in SENNRICH for _ in range(c))
    # split the same content across rows and partitions: training is a
    # pure function of the global word counts, so layout must not matter
    rows = [(i, text) for i in range(4)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_train_on_spark_matches_counts_twin(docs):
    model = bpe.train_bpe(docs, n_merges=6)
    # 4 identical docs -> counts are 4x the paper corpus; merge sequence
    # is scale-invariant
    twin = bpe.train_bpe_from_counts(
        [(w, 4 * c) for w, c in SENNRICH], n_merges=6
    )
    assert model.merges == twin.merges
    repart = bpe.train_bpe(docs.repartition(7), n_merges=6)
    assert repart.merges == model.merges


def test_distributed_encode_matches_twin(docs):
    model = bpe.train_bpe(docs, n_merges=10)
    ranks = model.ranks()
    got = {
        r["doc_id"]: r["toks"]
        for r in docs.select(
            "doc_id", bpe.bpe_tokens(model, "text").alias("toks")
        ).collect()
    }
    cnt = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", bpe.bpe_token_count(model, "text").alias("n")
        ).collect()
    }
    for i, text in [(r["doc_id"], r["text"]) for r in docs.collect()]:
        exp = [
            t for w in tokenize_py(text) for t in bpe.encode_word(w, ranks)
        ]
        assert got[i] == exp
        assert cnt[i] == len(exp)


def test_model_save_load_round_trip(tmp_path):
    model = bpe.train_bpe_from_counts(SENNRICH, n_merges=10)
    path = str(tmp_path / "bpe.json")
    model.save(path)
    loaded = bpe.BPEModel.load(path)
    assert loaded == model
    assert loaded.vocab() == model.vocab()
