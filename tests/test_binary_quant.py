"""Binary (1-bit sign) quantization + Hamming search contracts:
word packing matches a numpy bit model (zeros/negatives, MSB-first
fold, ragged last word), hamming_topk distances equal numpy popcounts
with deterministic tie-breaks, the exact-rerank path equals
topk_cosine on the shortlist, and on clustered data the binary filter
keeps same-cluster neighbors."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectordb_watermark_spark.functions.vector import binarize_embeddings
from vectordb_watermark_spark.operators.similarity import (
    _sign_words_py,
    hamming_topk,
    topk_cosine,
)


def _np_words(x, word_bits=32):
    bits = (np.asarray(x) > 0).astype(np.int64)
    out = []
    for w in range(-(-len(bits) // word_bits)):
        acc = 0
        for b in bits[w * word_bits : (w + 1) * word_bits]:
            acc = acc * 2 + int(b)
        out.append(acc)
    return out


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(23)
    X = rng.normal(size=(300, 48)).astype(np.float32)
    X[0, :7] = 0.0          # zeros must pack as 0-bits (strict positivity)
    X[1] = -np.abs(X[1])    # all-negative row -> all words 0
    rows = [(int(i), X[i].tolist()) for i in range(300)]
    return spark.createDataFrame(rows, "id long, emb array<float>"), X


def test_binarize_matches_numpy_bit_model(spark, vecs):
    df, X = vecs
    got = {}
    for r in binarize_embeddings(df).collect():
        got.setdefault(r["id"], {})[r["word"]] = r["bits"]
    for i in (0, 1, 2, 77, 299):
        words = [got[i][w] for w in sorted(got[i])]
        assert words == _np_words(X[i]), i
    # 48-d at 32-bit words -> 2 words (second is the ragged 16-bit tail)
    assert sorted(got[0]) == [0, 1]
    assert all(v == 0 for v in got[1].values())
    with pytest.raises(ValueError, match="word_bits"):
        binarize_embeddings(df, word_bits=63)


def test_hamming_topk_matches_numpy(spark, vecs):
    df, X = vecs
    q = X[5].astype(np.float64).tolist()
    got = hamming_topk(df, q, k=8).collect()
    # numpy model: popcount of sign-bit disagreement
    qb = np.asarray(q) > 0
    ham = np.array([int(np.sum((X[i] > 0) != qb)) for i in range(300)])
    order = sorted(range(300), key=lambda i: (ham[i], i))[:8]
    assert [(r["id"], r["hamming"]) for r in got] == [
        (i, int(ham[i])) for i in order
    ]
    assert [r["rank"] for r in got] == list(range(1, 9))
    assert got[0]["id"] == 5 and got[0]["hamming"] == 0


def test_hamming_rerank_equals_exact_on_shortlist(spark, vecs):
    df, X = vecs
    q = X[9].astype(np.float64).tolist()
    rr = hamming_topk(df, q, k=5, rerank_with=df, shortlist=25).collect()
    short = {
        r["id"] for r in hamming_topk(df, q, k=25).collect()
    }
    sub = df.filter(F.col("id").isin([int(i) for i in short])).select(
        "id", F.col("emb").cast("array<float>").alias("v")
    )
    exact = topk_cosine(sub, q, 5, "id", "v").collect()
    assert [(r["id"], r["cos"]) for r in rr] == [
        (r["id"], r["cos"]) for r in exact
    ]
    assert rr[0]["id"] == 9


def test_hamming_filter_keeps_cluster_structure(spark):
    """Two well-separated sign-pattern clusters: every top-k hit for a
    cluster-A query is a cluster-A member."""
    rng = np.random.default_rng(7)
    base_a = np.sign(rng.normal(size=64))
    base_b = -base_a
    rows = []
    for i in range(100):
        flip = rng.choice(64, size=4, replace=False)
        xa = base_a.copy(); xa[flip] *= -1
        xb = base_b.copy(); xb[flip] *= -1
        rows.append((i, (xa * (1 + 0.1 * rng.random(64))).tolist()))
        rows.append((1000 + i, (xb * (1 + 0.1 * rng.random(64))).tolist()))
    df = spark.createDataFrame(rows, "id long, emb array<double>")
    q = [float(v) for v in base_a]
    top = hamming_topk(df, q, k=20).collect()
    assert all(r["id"] < 1000 for r in top)


def test_hamming_topk_batch_equals_single(spark, vecs):
    """Batched Hamming search: per-query results equal the single-query
    path exactly, one corpus scan, duplicate/mixed-dim guards."""
    from vectordb_watermark_spark.operators.similarity import (
        hamming_topk_batch,
    )

    df, X = vecs
    qids = [3, 9, 42]
    qdf = spark.createDataFrame(
        [(int(i), X[i].astype(np.float64).tolist()) for i in qids],
        "qid long, qvec array<double>",
    )
    got = hamming_topk_batch(df, qdf, k=6).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["qid"], []).append(
            (r["rank"], r["id"], r["hamming"])
        )
    for qi in qids:
        single = hamming_topk(
            df, X[qi].astype(np.float64).tolist(), k=6
        ).collect()
        assert sorted(by_q[qi]) == [
            (r["rank"], r["id"], r["hamming"]) for r in single
        ], qi

    dup = spark.createDataFrame(
        [(1, X[0].tolist()), (1, X[1].tolist())], "qid long, qvec array<double>"
    )
    with pytest.raises(ValueError, match="duplicate qids"):
        hamming_topk_batch(df, dup, k=3)
    empty = spark.createDataFrame([], "qid long, qvec array<double>")
    with pytest.raises(ValueError, match="empty query block"):
        hamming_topk_batch(df, empty, k=3)
    mixed = spark.createDataFrame(
        [(1, [1.0, -1.0]), (2, [1.0] * 5)], "qid long, qvec array<double>"
    )
    with pytest.raises(ValueError, match="mixed query dims"):
        hamming_topk_batch(df, mixed, k=3)


def test_hamming_topk_batch_string_ids(spark):
    from vectordb_watermark_spark.operators.similarity import (
        hamming_topk,
        hamming_topk_batch,
    )

    rng = np.random.default_rng(13)
    X = rng.normal(size=(80, 32))
    rows = [(f"doc-{i:03d}", X[i].tolist()) for i in range(80)]
    df = spark.createDataFrame(rows, "id string, emb array<double>")
    q = X[7].tolist()
    qdf = spark.createDataFrame([("q0", q)], "qid string, qvec array<double>")
    b = hamming_topk_batch(df, qdf, k=5).collect()
    s = hamming_topk(df, q, k=5).collect()
    assert [(r["id"], r["hamming"]) for r in b] == [
        (r["id"], r["hamming"]) for r in s
    ]
    assert b[0]["id"] == "doc-007" and b[0]["hamming"] == 0
