"""BPE tokenizer contracts: hand-verified merges, lossless detokenization,
shared-merge-routine equivalence, partition invariance."""

from __future__ import annotations

import pandas as pd
import pytest

from tests.conftest import load
from vectordb_watermark_spark.operators.tokenizer import (
    _apply_merge,
    bpe_encode,
    bpe_token_stats,
    train_bpe,
    word_frequencies,
)


def _corpus(spark):
    # the classic BPE walkthrough corpus (Sennrich et al. 2016 Fig. 1 shape):
    # low x5, lower x2, newest x6, widest x3
    rows = [(1, " ".join(["low"] * 5 + ["lower"] * 2)),
            (2, " ".join(["newest"] * 6 + ["widest"] * 3))]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_train_bpe_hand_verified_merges(spark):
    """Hand-computed first four merges, including both tie-breaks:
    es/st tie at 9 -> lexicographic ('e','s'); lo/ow tie at 7 -> ('l','o')."""
    merges = train_bpe(_corpus(spark), num_merges=4)
    assert merges == [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]


def test_train_bpe_stops_below_min_pair_count(spark):
    docs = spark.createDataFrame([(1, "ab cd")], "doc_id long, text string")
    # every pair occurs once; min_pair_count=2 stops immediately
    assert train_bpe(docs, num_merges=10, min_pair_count=2) == []


def test_bpe_encode_matches_hand_derivation(spark):
    merges = [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]
    docs = spark.createDataFrame(
        [(1, "lowest newer"), (2, "LOW est")], "doc_id long, text string"
    )
    out = bpe_encode(docs, merges).toPandas().set_index("doc_id").sort_index()
    assert list(out.loc[1, "bpe_tokens"]) == ["low", "est", "n", "e", "w", "e", "r"]
    # case-folded before encoding; 'est' is a full word -> single es+t merge path
    assert list(out.loc[2, "bpe_tokens"]) == ["low", "est"]
    assert out.loc[1, "n_bpe_tokens"] == 7


def test_bpe_detokenization_lossless(spark, docs):
    """concat of a word's tokens == the word, for every word of every doc —
    merges never alter spelling, so ' '.join detokenizes exactly."""
    sample = docs.limit(40)
    merges = train_bpe(sample, num_merges=60)
    enc = bpe_encode(sample, merges).toPandas()
    orig = {r["doc_id"]: r["text"] for r in sample.collect()}
    for _, row in enc.iterrows():
        words = orig[row["doc_id"]].lower().split()
        rebuilt, i = [], 0
        toks = list(row["bpe_tokens"])
        for w in words:
            acc = ""
            while acc != w:
                acc += toks[i]
                i += 1
            rebuilt.append(w)
        assert i == len(toks)
        assert rebuilt == words


def test_bpe_training_state_equals_encode(spark):
    """Encoding with the final merge list reproduces the trainer's own final
    symbol state for every training word (the two sides share
    _apply_merge; this pins the loop around it)."""
    docs = _corpus(spark)
    merges = train_bpe(docs, num_merges=6)
    # independently re-derive the trainer's final state
    wf = {r["word"]: list(r["word"]) for r in word_frequencies(docs).collect()}
    for a, b in merges:
        wf = {w: _apply_merge(s, a, b, a + b) for w, s in wf.items()}
    one_word_docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(sorted(wf))], "doc_id long, text string"
    )
    enc = bpe_encode(one_word_docs, merges).toPandas()
    got = {r["doc_id"]: list(r["bpe_tokens"]) for _, r in enc.iterrows()}
    for i, w in enumerate(sorted(wf)):
        assert got[i] == wf[w], w


def test_train_bpe_partition_invariant(spark, docs):
    sample = docs.limit(60)
    m1 = train_bpe(sample, num_merges=30)
    m2 = train_bpe(sample.repartition(7, "doc_id"), num_merges=30)
    assert m1 == m2 and len(m1) == 30


def test_train_bpe_max_words_guard(spark, docs):
    with pytest.raises(ValueError, match="max_words"):
        train_bpe(docs, num_merges=5, max_words=3)


def test_bpe_token_stats_fertility(spark):
    merges = [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]
    docs = spark.createDataFrame(
        [(1, "lowest lowest"), (2, "")], "doc_id long, text string"
    )
    out = bpe_token_stats(docs, merges).toPandas().set_index("doc_id").sort_index()
    assert out.loc[1, "n_words"] == 2 and out.loc[1, "n_bpe_tokens"] == 4
    assert out.loc[1, "tokens_per_word"] == 2.0
    assert out.loc[2, "n_words"] == 0 and out.loc[2, "tokens_per_word"] == 0.0


@pytest.fixture(scope="module")
def docs(spark):
    return load(spark, "documents").cache()
