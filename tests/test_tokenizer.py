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
    learn_merges,
    train_bpe,
    word_frequencies,
)


def _learn_merges_naive(word_counts, num_merges, min_pair_count=2):
    """Reference twin: recount every pair over the whole vocabulary each
    iteration (the pre-round-8 algorithm) — the equivalence oracle for the
    incremental trainer."""
    vocab = {w: (list(w), int(c)) for w, c in word_counts.items()}
    merges = []
    for _ in range(num_merges):
        counts = {}
        for syms, freq in vocab.values():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + freq
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), c = best
        if c < min_pair_count:
            break
        merges.append((a, b))
        ab = a + b
        vocab = {
            w: (_apply_merge(syms, a, b, ab) if ab in w else syms, freq)
            for w, (syms, freq) in vocab.items()
        }
    return merges


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


def test_learn_merges_incremental_equals_naive(spark, docs):
    """The incremental pair-count trainer produces EXACTLY the naive
    recount-everything merge list — on the classic corpus, on real
    documents, and on an adversarial repeated-char vocab (overlapping-pair
    deltas: 'aaaa' loses two (a,a) pairs per merged 'aa')."""
    classic = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    assert learn_merges(classic, 10) == _learn_merges_naive(classic, 10)

    overlap = {"aaaa": 4, "aaab": 3, "baaa": 2, "abab": 5}
    assert learn_merges(overlap, 8, 1) == _learn_merges_naive(overlap, 8, 1)

    wf = {
        r["word"]: int(r["cnt"])
        for r in word_frequencies(docs.limit(80)).collect()
    }
    assert learn_merges(wf, 50) == _learn_merges_naive(wf, 50)


def test_learn_merges_budget_50k_words_1k_merges():
    """VERDICT r7 task #6 budget contract: a realistic vocabulary-scale
    training run (50k distinct words, 1k merges) completes in seconds —
    the incremental index makes per-merge cost O(affected words)."""
    import time

    rng = __import__("random").Random(42)
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    words = {}
    for i in range(50_000):
        n = 3 + (i % 10)
        w = "".join(rng.choice(alphabet) for _ in range(n))
        words[w] = words.get(w, 0) + 1 + (i % 97)
    t0 = time.time()
    merges = learn_merges(words, 1_000, min_pair_count=1)
    elapsed = time.time() - t0
    assert len(merges) == 1_000
    assert elapsed < 60, f"1k merges over 50k words took {elapsed:.1f}s"


def test_bpe_encode_string_ids(spark):
    """Doc ids need not be long (ADVICE r7): the output schema derives the
    id type from the input."""
    docs = spark.createDataFrame(
        [("u-1", "lowest low"), ("u-2", "est")], "doc_id string, text string"
    )
    merges = [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]
    out = bpe_encode(docs, merges).toPandas().set_index("doc_id").sort_index()
    assert list(out.index) == ["u-1", "u-2"]
    assert out.loc["u-2", "n_bpe_tokens"] == 1


@pytest.fixture(scope="module")
def docs(spark):
    return load(spark, "documents").cache()
