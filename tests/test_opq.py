"""Parametric-OPQ rotation contracts (operators/opq.py + the pq.py
integration): orthonormality + determinism of the trained rotation,
balanced eigenvalue allocation, reconstruction-MSE improvement on
anisotropic data, cosine preservation under rotation, and the full
rotated-index lifecycle — build/query (single=batch), append encodes
bit-identically to a rebuild, compaction carries the sidecar, deletes
still mask.  No reference analogue (the reference searches
full-precision vectors); cited pattern: Ge et al. CVPR 2013 / FAISS
``OPQx,IVFy,PQz``."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectordb_watermark_spark.operators import pq as P
from vectordb_watermark_spark.operators.opq import (
    eigenvalue_allocation,
    opq_train_rotation,
    rotate_vectors,
)

D, N, M = 32, 3000, 4


@pytest.fixture(scope="module")
def aniso(spark):
    """Correlated anisotropic vectors: x = A z with per-column scales —
    the regime plain PQ's contiguous coordinate blocks handle worst."""
    rng = np.random.default_rng(11)
    A = rng.normal(size=(D, D)) * np.exp(rng.normal(size=(1, D)))
    X = (rng.normal(size=(N, D)) @ A.T).astype(np.float32)
    rows = [(int(i), X[i].tolist()) for i in range(N)]
    df = spark.createDataFrame(rows, "id long, emb array<float>").cache()
    df.count()
    return df, X


def test_rotation_orthonormal_and_partition_invariant(spark, aniso):
    df, _ = aniso
    base = P._pq_base(df, "id", "emb")
    R = opq_train_rotation(base, m=M, vec_col="v")
    assert R.shape == (D, D)
    assert np.allclose(R @ R.T, np.eye(D), atol=1e-8)
    # fixed partitioning -> bit-identical retrain (decimal reduce kills
    # shuffle-merge order); different partitioning -> fp-noise agreement
    R1b = opq_train_rotation(base, m=M, vec_col="v")
    assert np.array_equal(R, R1b)
    R2 = opq_train_rotation(
        P._pq_base(df.repartition(13), "id", "emb"), m=M, vec_col="v"
    )
    assert np.allclose(R, R2, atol=1e-6)


def test_eigenvalue_allocation_balances_log_products():
    vals = np.array([1e4, 1e3, 1e2, 1e1, 1.0, 0.1, 0.01, 0.001])
    buckets = eigenvalue_allocation(vals, 2)
    assert sorted(len(b) for b in buckets) == [4, 4]
    assert sorted(i for b in buckets for i in b) == list(range(8))
    logs = np.log(vals)
    spread_opq = abs(logs[buckets[0]].sum() - logs[buckets[1]].sum())
    # identity allocation: first half vs second half of the sorted values
    spread_id = abs(logs[:4].sum() - logs[4:].sum())
    assert spread_opq < spread_id
    with pytest.raises(ValueError, match="not divisible"):
        eigenvalue_allocation(vals, 3)


def test_rotation_preserves_cosine_and_norm(spark, aniso):
    df, X = aniso
    base = P._pq_base(df.limit(200), "id", "emb")
    R = opq_train_rotation(P._pq_base(df, "id", "emb"), m=M, vec_col="v")
    rot = {r["id"]: np.asarray(r["v"]) for r in
           rotate_vectors(base, R, vec_col="v").collect()}
    for i in list(rot)[:20]:
        y = R @ X[i].astype(np.float64)
        assert np.allclose(rot[i], y, atol=1e-4)  # float32 emission
        assert abs(np.linalg.norm(rot[i]) - np.linalg.norm(X[i])) < 1e-2


def test_opq_lowers_reconstruction_mse_on_anisotropic(spark, aniso):
    df, _ = aniso
    base = P._pq_base(df, "id", "emb")
    R = opq_train_rotation(base, m=M, vec_col="v")
    rot = rotate_vectors(base, R, vec_col="v")
    books_p = P.pq_train(base, m=M, n_codes=16, n_iters=4,
                         id_col="id", vec_col="v")
    books_o = P.pq_train(rot, m=M, n_codes=16, n_iters=4,
                         id_col="id", vec_col="v")
    mse_p = P.pq_reconstruction_mse(base, books_p, id_col="id", vec_col="v")
    mse_o = P.pq_reconstruction_mse(rot, books_o, id_col="id", vec_col="v")
    # on this data the smoke measurement is ~3x; assert a robust margin
    assert mse_o < 0.6 * mse_p, (mse_o, mse_p)


def test_rotate_vectors_passes_extra_columns_and_validates(spark, aniso):
    df, _ = aniso
    tagged = P._pq_base(df.limit(50), "id", "emb").withColumn(
        "batch", F.lit("stream-0")
    )
    R = np.eye(D)
    out = rotate_vectors(tagged, R, vec_col="v")
    assert out.schema.fieldNames() == ["id", "v", "batch"]
    assert out.filter(F.col("batch") == "stream-0").count() == 50
    with pytest.raises(ValueError, match="square"):
        rotate_vectors(tagged, np.ones((D, D - 1)), vec_col="v")
    with pytest.raises(ValueError, match="no column"):
        rotate_vectors(tagged, R, vec_col="nope")
    bad = rotate_vectors(
        P._pq_base(df.limit(5), "id", "emb"), np.eye(D - 2), vec_col="v"
    )
    with pytest.raises(Exception, match="rotation dim"):
        bad.collect()


def test_opq_index_lifecycle(spark, aniso, tmp_path):
    """build(opq) -> single=batch query, append==rebuild codes, compact
    carries the sidecar, info reports rotated, delete masks."""
    df, X = aniso
    path = str(tmp_path / "opq_idx")
    P.ivf_pq_write_index(df, path, n_centroids=8, m=M, n_codes=16, opq=True)
    R = P._load_rotation(spark, path)
    assert R is not None and np.allclose(R @ R.T, np.eye(D), atol=1e-8)

    from vectordb_watermark_spark.operators.similarity import (
        index_info,
        ivf_delete_ids,
    )

    assert index_info(spark, path)["rotated"] is True

    q = X[0].astype(np.float64).tolist()
    single = P.ivf_pq_query_index(spark, path, q, k=5, n_probe=8).collect()
    qdf = spark.createDataFrame([(0, q)], "qid int, qvec array<double>")
    batch = P.ivf_pq_query_index_batch(
        spark, path, qdf, k=5, n_probe=8
    ).collect()
    assert [(r["id"], r["cos"]) for r in single] == [
        (r["id"], r["cos"]) for r in batch
    ]
    # probe-all ADC should put the query's own row first on this data
    assert single[0]["id"] == 0

    # exact rerank runs in the ORIGINAL space: own row gets cosine 1.0
    rr = P.ivf_pq_query_index(
        spark, path, q, k=3, n_probe=8, rerank_with=df
    ).collect()
    assert rr[0]["id"] == 0 and rr[0]["cos"] == pytest.approx(1.0, abs=1e-6)

    # append encodes through the stored rotation: codes equal a rebuild's
    half = df.filter(F.col("id") % 2 == 0)
    rest = df.filter(F.col("id") % 2 == 1)
    p2 = str(tmp_path / "opq_idx_app")
    P.ivf_pq_write_index(half, p2, n_centroids=8, m=M, n_codes=16, opq=True)
    P.ivf_pq_append_index(rest, p2)
    R2 = P._load_rotation(spark, p2)
    books2 = P._load_codebooks(spark, p2)
    appended = {
        r["id"]: list(r["codes"])
        for r in spark.read.parquet(f"{p2}/codes").collect()
    }
    # rebuild-equivalent encoding of `rest` with the same stored artifacts
    from vectordb_watermark_spark.operators.similarity import (
        _ivf_assign_pass,
        _load_centroids,
    )

    rb = rotate_vectors(P._pq_base(rest, "id", "emb"), R2, vec_col="v")
    ref = {
        r["id"]: list(r["codes"])
        for r in P._residual_encode_pass(
            _ivf_assign_pass(rb, _load_centroids(spark, p2)),
            _load_centroids(spark, p2),
            books2,
        ).collect()
    }
    for i in ref:
        assert appended[i] == ref[i]

    # compaction preserves the rotation and queries stay consistent
    P.ivf_pq_compact_index(df, path)
    Rc = P._load_rotation(spark, path)
    assert Rc is not None and np.array_equal(Rc, R)
    post = P.ivf_pq_query_index(spark, path, q, k=5, n_probe=8).collect()
    assert post[0]["id"] == 0

    # tombstone masks under rotation
    ivf_delete_ids(spark, path, [0])
    masked = P.ivf_pq_query_index(spark, path, q, k=5, n_probe=8).collect()
    assert all(r["id"] != 0 for r in masked)


def test_opq_upgrade_via_compact(spark, aniso, tmp_path):
    """opq=True on compaction upgrades a plain index; recall vs exact
    top-k does not degrade and the sidecar appears."""
    df, X = aniso
    path = str(tmp_path / "plain_up")
    P.ivf_pq_write_index(df, path, n_centroids=8, m=M, n_codes=16)
    assert P._load_rotation(spark, path) is None
    P.ivf_pq_compact_index(df, path, opq=True)
    assert P._load_rotation(spark, path) is not None
    q = X[7].astype(np.float64).tolist()
    got = P.ivf_pq_query_index(spark, path, q, k=5, n_probe=8).collect()
    assert got[0]["id"] == 7


def test_opq_recall_not_worse_than_plain(spark, aniso, tmp_path):
    """ADC recall@10 at probe-all: rotated >= plain on anisotropic data
    (the whole point of the transform)."""
    df, X = aniso
    from vectordb_watermark_spark.operators.similarity import topk_cosine

    p_plain = str(tmp_path / "r_plain")
    p_opq = str(tmp_path / "r_opq")
    P.ivf_pq_write_index(df, p_plain, n_centroids=8, m=M, n_codes=16)
    P.ivf_pq_write_index(df, p_opq, n_centroids=8, m=M, n_codes=16, opq=True)
    base = P._pq_base(df, "id", "emb")
    hits_p = hits_o = 0
    K = 10
    for qi in (3, 50, 777, 1500, 2222):
        q = X[qi].astype(np.float64).tolist()
        truth = {r["id"] for r in topk_cosine(base, q, K, "id", "v").collect()}
        got_p = {
            r["id"]
            for r in P.ivf_pq_query_index(
                spark, p_plain, q, k=K, n_probe=8
            ).collect()
        }
        got_o = {
            r["id"]
            for r in P.ivf_pq_query_index(
                spark, p_opq, q, k=K, n_probe=8
            ).collect()
        }
        hits_p += len(truth & got_p)
        hits_o += len(truth & got_o)
    assert hits_o >= hits_p, (hits_o, hits_p)


# ---------------------------------------------------------------- whitening

def test_whitening_matches_numpy_and_identity_covariance(spark, aniso):
    """PCA whitening: output matches the numpy closed form, and the
    whitened corpus has ~zero mean and ~identity covariance."""
    from vectordb_watermark_spark.operators.opq import (
        whiten_embeddings,
        whitening_transform,
    )

    df, X = aniso
    base = P._pq_base(df, "id", "emb")
    mean, W = whitening_transform(base, vec_col="v", eps=1e-9)
    assert W.shape == (D, D)
    out = {r["id"]: np.asarray(r["v"]) for r in
           whiten_embeddings(base, vec_col="v").collect()}
    Y = np.stack([out[i] for i in range(N)])
    # numpy twin on the same corpus
    Xd = X.astype(np.float64)
    ref = (Xd - mean[None, :]) @ W
    assert np.allclose(Y, ref, atol=1e-3)  # float32 emission
    assert np.allclose(Y.mean(axis=0), 0.0, atol=1e-3)
    cov = np.cov(Y, rowvar=False, bias=True)
    assert np.allclose(cov, np.eye(D), atol=1e-2)


def test_whitening_k_truncation_and_zca(spark, aniso):
    from vectordb_watermark_spark.operators.opq import (
        whiten_embeddings,
        whitening_transform,
    )

    df, _ = aniso
    base = P._pq_base(df, "id", "emb")
    k = 8
    red = whiten_embeddings(base, vec_col="v", k=k)
    row = red.first()
    assert len(row["v"]) == k
    Y = np.stack([np.asarray(r["v"]) for r in red.collect()])
    assert np.allclose(np.cov(Y, rowvar=False, bias=True), np.eye(k), atol=1e-2)
    # zca: full-dim only, and symmetric whitener W = W.T
    _, Wz = whitening_transform(base, vec_col="v", mode="zca")
    assert np.allclose(Wz, Wz.T, atol=1e-8)
    import pytest as _pt
    with _pt.raises(ValueError, match="full-dimensional"):
        whitening_transform(base, vec_col="v", mode="zca", k=4)
    with _pt.raises(ValueError, match="mode"):
        whitening_transform(base, vec_col="v", mode="nope")
    with _pt.raises(ValueError, match="out of range"):
        whitening_transform(base, vec_col="v", k=0)


def test_affine_transform_validates_and_passes_columns(spark, aniso):
    from vectordb_watermark_spark.operators.opq import affine_transform_vectors

    df, X = aniso
    base = P._pq_base(df.limit(10), "id", "emb").withColumn("tag", F.lit("t"))
    A = np.eye(D)[:, :3]  # project to first 3 coords
    out = affine_transform_vectors(base, A, vec_col="v")
    assert out.schema.fieldNames() == ["id", "v", "tag"]
    r = out.filter(F.col("id") == 0).first()
    assert np.allclose(np.asarray(r["v"]), X[0][:3], atol=1e-5)
    assert r["tag"] == "t"
    import pytest as _pt
    with _pt.raises(ValueError, match="mean dim"):
        affine_transform_vectors(base, A, mean=np.zeros(5), vec_col="v")


def test_opq_refine_improves_or_matches_parametric(spark, aniso):
    """Non-parametric Ge-§5 alternation: the refined rotation stays
    orthonormal, is deterministic for a fixed partitioning, and does not
    LOSE reconstruction quality vs the parametric start at the same code
    budget (on strongly non-Gaussian data it should win; Gaussian-ish
    data may already be rotation-saturated, so the contract is <=)."""
    from vectordb_watermark_spark.operators.opq import opq_refine_rotation

    df, _ = aniso
    base = P._pq_base(df, "id", "emb")
    R0 = opq_train_rotation(base, m=M, vec_col="v")
    R = opq_refine_rotation(
        base, m=M, R0=R0, n_codes=16, n_iter=3, kmeans_iters=4, key="t"
    )
    assert R.shape == (D, D)
    assert np.allclose(R @ R.T, np.eye(D), atol=1e-8)
    # determinism on a fixed partitioning
    R_b = opq_refine_rotation(
        base, m=M, R0=R0, n_codes=16, n_iter=3, kmeans_iters=4, key="t"
    )
    assert np.array_equal(R, R_b)

    def mse_of(rot_mat):
        rot = rotate_vectors(base, rot_mat, vec_col="v")
        books = P.pq_train(rot, m=M, n_codes=16, n_iters=4,
                           id_col="id", vec_col="v")
        return P.pq_reconstruction_mse(rot, books, id_col="id", vec_col="v")

    mse0, mse = mse_of(R0), mse_of(R)
    assert mse <= mse0 * 1.02, (mse, mse0)

    with pytest.raises(ValueError, match="n_iter"):
        opq_refine_rotation(base, m=M, n_iter=0)
    with pytest.raises(ValueError, match="sample_fraction"):
        opq_refine_rotation(base, m=M, sample_fraction=1.5)


def test_opq_refine_sampled_and_write_index_wiring(spark, aniso, tmp_path):
    """sample_fraction bounds the refinement's scans but still returns a
    valid orthonormal rotation; ivf_pq_write_index(opq=True, opq_iters>0)
    persists the refined sidecar and queries keep masking/scoring."""
    from vectordb_watermark_spark.operators.opq import opq_refine_rotation
    from vectordb_watermark_spark.operators.pq import (
        _load_rotation,
        ivf_pq_query_index,
        ivf_pq_write_index,
    )

    df, X = aniso
    base = P._pq_base(df, "id", "emb")
    Rs = opq_refine_rotation(
        base, m=M, n_codes=16, n_iter=1, key="t", sample_fraction=0.5
    )
    assert np.allclose(Rs @ Rs.T, np.eye(D), atol=1e-8)

    idx = str(tmp_path / "opq_iter_idx")
    ivf_pq_write_index(
        df, idx, n_centroids=8, m=M, n_codes=16, key="oi",
        opq=True, opq_iters=2,
    )
    R_stored = _load_rotation(spark, idx)
    assert R_stored is not None
    assert np.allclose(R_stored @ R_stored.T, np.eye(D), atol=1e-8)
    # a refined-sidecar index still retrieves its own vectors sanely
    q = [float(v) for v in X[7]]
    top = [r["id"] for r in
           ivf_pq_query_index(spark, idx, q, k=5, n_probe=8).collect()]
    assert 7 in top
