"""Deterministic splits / mixing / decontamination vs pure-Python twins.

hash_split's load-bearing property is STABILITY (a row's split is a
function of (key, seed) alone — growing the corpus or re-running the
pipeline never moves a row between train and eval), so the tests pin
that rather than exact proportions; proportions get a tolerance check.
Decontamination is pinned exactly against a twin that recomputes n-gram
overlap from the canonical pure-Python tokenizer.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_core_spark.functions.tokenizer import tokenize_py
from search_engine_core_spark.operators.sampling import (
    contaminated_ids,
    decontaminate,
    hash_split,
    pack_sequences,
    resample_to_mix,
)

WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def _ids_df(spark, n, start=0):
    return spark.range(start, start + n).select(F.col("id").alias("doc_id"))


class TestHashSplit:
    def test_proportions_and_total(self, spark):
        out = hash_split(_ids_df(spark, 4000), WEIGHTS, seed=1)
        got = {r["split"]: r["n"] for r in
               out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert sum(got.values()) == 4000            # total preserved
        assert set(got) == {"train", "val", "test"}  # all splits hit
        assert got["train"] / 4000 == pytest.approx(0.8, abs=0.03)
        assert got["val"] / 4000 == pytest.approx(0.1, abs=0.02)

    def test_stability_under_corpus_growth(self, spark):
        """THE property: the first 500 rows' assignments are identical
        whether the corpus has 500 or 5000 rows."""
        small = dict(hash_split(_ids_df(spark, 500), WEIGHTS, seed=7)
                     .select("doc_id", "split").collect())
        big = dict(hash_split(_ids_df(spark, 5000), WEIGHTS, seed=7)
                   .select("doc_id", "split").collect())
        assert all(big[k] == v for k, v in small.items())

    def test_seed_changes_assignment(self, spark):
        a = dict(hash_split(_ids_df(spark, 1000), WEIGHTS, seed=1)
                 .select("doc_id", "split").collect())
        b = dict(hash_split(_ids_df(spark, 1000), WEIGHTS, seed=2)
                 .select("doc_id", "split").collect())
        assert any(a[k] != b[k] for k in a)

    def test_degenerate_single_split_and_bad_weights(self, spark):
        out = hash_split(_ids_df(spark, 50), {"all": 1.0})
        assert out.filter(F.col("split") == "all").count() == 50
        with pytest.raises(ValueError):
            hash_split(_ids_df(spark, 5), {})
        with pytest.raises(ValueError):
            hash_split(_ids_df(spark, 5), {"a": 0.0})
        # a negative weight passes the sum check but corrupts the
        # cumulative thresholds — must raise, not silently empty 'test'
        with pytest.raises(ValueError, match="negative"):
            hash_split(_ids_df(spark, 5), {"train": 1.5, "test": -0.5})


class TestResampleToMix:
    def _corpus(self, spark):
        # 3000 web, 1000 code, 500 wiki
        return spark.range(4500).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") < 3000, "web")
            .when(F.col("id") < 4000, "code")
            .otherwise("wiki")
            .alias("source"),
        )

    def test_hits_target_mixture(self, spark):
        out = resample_to_mix(
            self._corpus(spark), "source",
            {"web": 0.5, "code": 0.25, "wiki": 0.25}, seed=3,
        )
        got = {r["source"]: r["n"] for r in
               out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
        # wiki is the binding group (500 / 0.25 = 2000 = N*): kept whole
        assert got["wiki"] == 500
        total = sum(got.values())
        assert got["web"] / total == pytest.approx(0.5, abs=0.04)
        assert got["code"] / total == pytest.approx(0.25, abs=0.04)

    def test_deterministic_and_subset(self, spark):
        corpus = self._corpus(spark)
        tgt = {"web": 0.6, "code": 0.4}
        a = {r["doc_id"] for r in resample_to_mix(corpus, "source", tgt).collect()}
        b = {r["doc_id"] for r in resample_to_mix(corpus, "source", tgt).collect()}
        assert a == b
        assert all(i < 4000 for i in a)  # wiki (absent from target) dropped

    def test_missing_group_raises(self, spark):
        with pytest.raises(ValueError, match="absent from the data"):
            resample_to_mix(self._corpus(spark), "source", {"books": 1.0})


class TestDecontaminate:
    def _twin(self, train_rows, eval_rows, n):
        def grams(text):
            t = tokenize_py(text)
            return {" ".join(t[i:i + n]) for i in range(len(t) - n + 1)}
        eval_g = set()
        for _, text in eval_rows:
            eval_g |= grams(text)
        return {i for i, text in train_rows if grams(text) & eval_g}

    def test_matches_pure_python_twin(self, spark):
        train_rows = [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "spark shuffles partitions across the executor fleet"),
            (3, "quick brown fox jumps over nothing in particular"),
            (4, "tiny doc"),  # < n tokens: can never collide
        ]
        eval_rows = [(100, "we ask whether the quick brown fox jumps high")]
        n = 4
        train = spark.createDataFrame(train_rows, "doc_id long, text string")
        ev = spark.createDataFrame(eval_rows, "doc_id long, text string")
        got = {r["doc_id"] for r in contaminated_ids(train, ev, n=n).collect()}
        assert got == self._twin(train_rows, eval_rows, n)
        assert got == {1, 3}  # both share "quick brown fox jumps"
        kept = {r["doc_id"] for r in decontaminate(train, ev, n=n).collect()}
        assert kept == {2, 4}

    def test_no_overlap_keeps_everything(self, spark):
        train = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
        )
        ev = spark.createDataFrame(
            [(9, "one two three four five six")], "doc_id long, text string"
        )
        assert contaminated_ids(train, ev, n=3).count() == 0
        assert decontaminate(train, ev, n=3).count() == 1

    def test_eval_shorter_than_n_flags_nothing(self, spark):
        train = spark.createDataFrame(
            [(1, "a1 b2 c3 d4 e5")], "doc_id long, text string"
        )
        ev = spark.createDataFrame([(9, "a1 b2")], "doc_id long, text string")
        assert contaminated_ids(train, ev, n=3).count() == 0


class TestPackSequences:
    def test_single_shard_cumsum_semantics(self, spark):
        """Pure-Python twin: replay the same (hash order within one
        shard) stream, cut every `budget` tokens, compare every column."""
        df = spark.createDataFrame(
            [(i, 3 + (i % 5)) for i in range(40)], "doc_id long, n_tokens int"
        )
        out = pack_sequences(df, budget=10, n_shards=1, seed=2)
        rows = sorted(out.collect(), key=lambda r: r["pack_offset"])
        offset = 0
        for r in rows:
            assert r["pack_shard"] == 0
            assert r["pack_offset"] == offset
            assert r["pack_id"] == offset // 10
            end = offset + r["n_tokens"]
            assert r["crosses_boundary"] == ((end - 1) // 10 > offset // 10)
            offset = end
        # every chunk except the last holds exactly `budget` tokens when
        # docs are split at cuts: total offset span covers all tokens
        assert offset == sum(3 + (i % 5) for i in range(40))

    def test_shards_are_independent_streams(self, spark):
        df = spark.createDataFrame(
            [(i, 4) for i in range(200)], "doc_id long, n_tokens int"
        )
        out = pack_sequences(df, budget=16, n_shards=8, seed=0)
        for shard_rows in out.groupBy("pack_shard").agg(
            F.collect_list(F.struct("pack_offset", "n_tokens")).alias("s")
        ).collect():
            stream = sorted((r["pack_offset"], r["n_tokens"]) for r in shard_rows["s"])
            offset = 0
            for off, n in stream:
                assert off == offset  # contiguous stream per shard
                offset += n

    def test_deterministic_and_validates_budget(self, spark):
        df = spark.createDataFrame([(1, 5), (2, 7)], "doc_id long, n_tokens int")
        a = sorted(pack_sequences(df, 8).collect())
        b = sorted(pack_sequences(df, 8).collect())
        assert a == b
        with pytest.raises(ValueError):
            pack_sequences(df, 0)
