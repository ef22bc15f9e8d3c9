"""Product-quantization contracts: geometry, determinism, training progress,
ADC exactness on constructed inputs, recall floors, partition invariance."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import load
from vectordb_watermark_spark.operators import pq as P
from vectordb_watermark_spark.operators.similarity import topk_cosine


@pytest.fixture(scope="module")
def vectors(spark):
    return (
        load(spark, "embeddings")
        .select(F.col("vec_id").alias("id"), F.col("embedding").alias("emb"))
        .cache()
    )


def test_pq_train_geometry_and_determinism(spark, vectors):
    b1 = P.pq_train(vectors, m=8, n_codes=8, n_iters=2)
    b2 = P.pq_train(vectors, m=8, n_codes=8, n_iters=2)
    dim = len(vectors.first()["emb"])
    assert b1.shape == (8, 8, dim // 8)
    # same partitioning, same key -> bit-identical codebooks
    assert np.array_equal(b1, b2)
    with pytest.raises(ValueError, match="not divisible"):
        P.pq_train(vectors, m=7)


def test_pq_training_reduces_reconstruction_error(spark, vectors):
    seeds = P.pq_train(vectors, m=8, n_codes=8, n_iters=0)
    trained = P.pq_train(vectors, m=8, n_codes=8, n_iters=3)
    assert P.pq_reconstruction_mse(vectors, trained) < P.pq_reconstruction_mse(
        vectors, seeds
    )


def test_pq_encode_exact_on_constructed_codebook(spark):
    """2 subspaces x 2 codes with hand-placed codewords: the nearest code is
    known per row, and the ADC cosine equals the hand-computed value."""
    books = np.zeros((2, 2, 2))
    books[0, 0] = [1.0, 0.0]
    books[0, 1] = [0.0, 1.0]
    books[1, 0] = [1.0, 1.0]
    books[1, 1] = [-1.0, -1.0]
    rows = [
        (1, [0.9, 0.1, 1.2, 0.8]),   # codes (0, 0)
        (2, [0.1, 0.9, -0.7, -1.1]), # codes (1, 1)
    ]
    df = spark.createDataFrame(rows, "id long, emb array<float>")
    enc = {r["id"]: list(r["codes"]) for r in P.pq_encode(df, books).collect()}
    assert enc == {1: [0, 0], 2: [1, 1]}

    q = [1.0, 0.0, 1.0, 1.0]
    got = {
        r["id"]: r["cos_approx"]
        for r in P.pq_adc_scores(P.pq_encode(df, books), q, books).collect()
    }
    # recon(1) = [1,0,1,1]: cos = 3/(sqrt(3)*sqrt(3)) = 1
    # recon(2) = [0,1,-1,-1]: cos = -2/(sqrt(3)*sqrt(3))
    assert abs(got[1] - 1.0) < 1e-9
    assert abs(got[2] - (-2.0 / 3.0)) < 1e-9


def test_pq_encode_partition_invariant(spark, vectors):
    books = P.pq_train(vectors, m=8, n_codes=8, n_iters=2)
    a = P.pq_encode(vectors, books).toPandas()
    b = P.pq_encode(vectors.repartition(7, "id"), books).toPandas()
    a = a.sort_values("id").reset_index(drop=True)
    b = b.sort_values("id").reset_index(drop=True)
    assert [list(x) for x in a["codes"]] == [list(x) for x in b["codes"]]


def test_pq_rerank_recall_floor(spark, vectors):
    """Mean recall@10 over 3 queries, ADC shortlist (80) + exact re-rank:
    measured 0.93-1.0 at sf0.001/sf0.01 with m=8 n_codes=64; floor 0.6."""
    books = P.pq_train(vectors, m=8, n_codes=64, n_iters=4)
    codes = P.pq_encode(vectors, books).cache()
    total = 0.0
    for qid in (0, 7, 13):
        qv = [float(x) for x in vectors.filter(F.col("id") == qid).first()["emb"]]
        sub = vectors.filter(F.col("id") != qid)
        exact = {r["id"] for r in topk_cosine(sub, qv, 10, "id", "emb").collect()}
        got = {
            r["id"]
            for r in P.pq_topk_cosine(
                sub, qv, k=10, codebooks=books,
                codes=codes.filter(F.col("id") != qid),
                rerank_with=sub, shortlist=80,
            ).collect()
        }
        total += len(exact & got) / 10.0
    codes.unpersist()
    assert total / 3 >= 0.6


def test_pq_topk_shape_matches_other_search_ops(spark, vectors):
    qv = [float(x) for x in vectors.first()["emb"]]
    out = P.pq_topk_cosine(vectors, qv, k=5, m=8, n_codes=8)
    assert out.columns == ["id", "cos", "rank"]
    rows = out.collect()
    assert len(rows) == 5 and [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
