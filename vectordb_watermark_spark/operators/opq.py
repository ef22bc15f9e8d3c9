"""Optimized Product Quantization rotation (OPQ) for the IVF-PQ index.

Parametric OPQ per Ge et al., "Optimized Product Quantization for
Approximate Nearest Neighbor Search" (CVPR 2013), §4: for data that is
(approximately) Gaussian, the quantization-MSE-optimal orthogonal
pre-transform is the PCA basis with **eigenvalue allocation** — assign
principal directions to the ``m`` PQ subspaces so the products of the
eigenvalues per subspace are balanced (the paper's independence +
balanced-variance criteria).  This is the transform FAISS ships as
``OPQMatrix`` in its ``OPQx,IVFy,PQz`` factory strings; we implement the
closed-form parametric variant (no iterative codebook/rotation
alternation), which is deterministic and needs exactly one extra pass
over the corpus.

Why it helps: plain PQ quantizes **contiguous coordinate blocks**. When
coordinates are correlated or variance concentrates in a few of them
(true of real embedding models; the reference's vector tables at
`util/pg_vector.py` store raw model embeddings which are strongly
anisotropic), some sub-quantizers see almost all the energy and others
see none — code budget is wasted.  A rotation that decorrelates the
coordinates and spreads variance evenly across the blocks lowers
reconstruction MSE at the same code size, which lifts ADC ranking
quality (recall) for free at query time.

Scale shape (100 TB): rotation training is ONE ``mapInArrow`` pass that
emits per-Arrow-batch moment partials — ``(count, sum, X^T X)`` flattened
— so the shuffle reduces ``d + d^2`` cells regardless of corpus size
(same bounded-reduce property as ``pq._reduce_partials``, and the same
exact ``decimal(38,18)`` summation so the trained rotation is
bit-deterministic run-to-run for a fixed partitioning).  Applying the rotation is
map-only GEMM (no shuffle); the stored rotation makes append-time
encoding bit-identical to build-time encoding.  Only the ``d x d``
moment matrix ever reaches the driver.

Cosine/L2 safety: ``R`` is orthonormal, so dot products and norms are
preserved exactly — a rotated index returns the SAME cosine scores as an
unrotated one would for the same (lossless) reconstructions; only the
lossy-quantization error shrinks.  Queries are rotated driver-side
(``R @ q`` — d^2 flops on a scalar).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "opq_train_rotation",
    "opq_refine_rotation",
    "rotate_vectors",
    "eigenvalue_allocation",
    "whitening_transform",
    "whiten_embeddings",
    "affine_transform_vectors",
]


def _moment_partials(df: DataFrame, vec_col: str) -> DataFrame:
    """One row per Arrow batch: ``(cnt, s[d], ss[d*d])`` — count, coordinate
    sums and raw second-moment sums (row-major flattened ``X^T X``).  The
    heavy O(n d^2) work happens inside numpy per batch; the output
    cardinality is the number of Arrow batches, not rows."""

    def kernel(batches):
        import pyarrow as pa

        from vectordb_watermark_spark.functions.arrowmat import (
            list_array_to_matrix,
        )

        for rb in batches:
            if not rb.num_rows:
                continue
            names = rb.schema.names
            X = list_array_to_matrix(
                rb.column(names.index(vec_col)), dtype=np.float64
            )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([rb.num_rows], type=pa.int64()),
                    pa.array([X.sum(axis=0).tolist()],
                             type=pa.list_(pa.float64())),
                    pa.array([(X.T @ X).reshape(-1).tolist()],
                             type=pa.list_(pa.float64())),
                ],
                names=["cnt", "s", "ss"],
            )

    return df.select(vec_col).mapInArrow(
        kernel, schema="cnt long, s array<double>, ss array<double>"
    )


def _corpus_moments(df: DataFrame, vec_col: str) -> tuple[int, np.ndarray, np.ndarray]:
    """``(n, mean, cov)`` from one corpus pass.  Cross-partial reduction
    uses exact ``decimal(38,18)`` sums (commutative — shuffle-merge order
    cannot flip last-ulp bits), so for a FIXED partitioning the trained
    rotation is bit-deterministic run-to-run (the same guarantee class as
    ``pq._reduce_partials``; across DIFFERENT partitionings the per-batch
    numpy summation grouping changes last ulps, so rotations agree to
    ~1e-8, not bitwise).  The reduce is a posexplode groupBy over
    ``d + d^2`` cells with map-side combine (bounded output no matter the
    corpus size)."""
    partials = _moment_partials(df, vec_col).persist()
    try:
        n = int(
            partials.agg(F.sum("cnt").alias("n")).collect()[0]["n"] or 0
        )
        if n == 0:
            raise ValueError("opq_train_rotation: empty vector table")
        srows = (
            partials.select(F.posexplode("s").alias("i", "x"))
            .groupBy("i")
            .agg(F.sum(F.col("x").cast("decimal(38,18)")).alias("sx"))
            .collect()
        )
        ssrows = (
            partials.select(F.posexplode("ss").alias("i", "x"))
            .groupBy("i")
            .agg(F.sum(F.col("x").cast("decimal(38,18)")).alias("sx"))
            .collect()
        )
    finally:
        partials.unpersist()
    d = len(srows)
    s = np.zeros(d)
    for r in srows:
        s[r["i"]] = float(r["sx"])
    ss = np.zeros(d * d)
    for r in ssrows:
        ss[r["i"]] = float(r["sx"])
    mean = s / n
    cov = ss.reshape(d, d) / n - np.outer(mean, mean)
    return n, mean, cov


def eigenvalue_allocation(vals: np.ndarray, m: int) -> list[list[int]]:
    """Ge et al. §4.2 balanced-variance assignment: walk the eigenvalues
    in descending order, placing each into the non-full bucket whose
    current log-product of eigenvalues is smallest — balancing the
    PRODUCTS (not sums) because a sub-quantizer's distortion under the
    Gaussian model scales with the determinant of its covariance block.
    Returns ``m`` lists of eigen-indices (each of size ``d // m``)."""
    d = vals.size
    if d % m != 0:
        raise ValueError(f"dim={d} not divisible by m={m} subspaces")
    cap = d // m
    order = np.argsort(vals)[::-1]
    # floor: zero/negative eigenvalues (rank-deficient or fp noise) must
    # not produce -inf logs that make one bucket absorb everything
    logs = np.log(np.maximum(vals, 1e-12))
    buckets: list[list[int]] = [[] for _ in range(m)]
    load = np.zeros(m)
    for idx in order:
        open_b = [b for b in range(m) if len(buckets[b]) < cap]
        b = min(open_b, key=lambda b: (load[b], b))  # tie -> lowest index
        buckets[b].append(int(idx))
        load[b] += logs[idx]
    return buckets


def opq_train_rotation(
    df: DataFrame, m: int, vec_col: str = "v"
) -> np.ndarray:
    """Train the parametric-OPQ rotation on a vector table: one moment
    pass, an eigendecomposition of the ``d x d`` covariance on the
    driver, then eigenvalue allocation into ``m`` balanced subspaces.

    Returns ``R`` of shape ``(d, d)`` with orthonormal ROWS; transform is
    ``x' = R @ x`` and subspace ``s`` of the PQ sees rows
    ``[s*dsub, (s+1)*dsub)``.  Deterministic for a fixed partitioning
    (exact decimal moment sums + sign-stabilized eigenvectors
    (largest-|coef| coordinate positive) + lowest-index tie-breaks in the
    allocation); across partitionings rotations agree to fp noise —
    bit-exactness between build/append/query comes from the STORED
    sidecar, never from retraining."""
    _n, _mean, cov = _corpus_moments(df, vec_col)
    vals, vecs = np.linalg.eigh(cov)  # ascending; columns are eigenvectors
    for c in range(vecs.shape[1]):  # deterministic sign
        j = int(np.argmax(np.abs(vecs[:, c])))
        if vecs[j, c] < 0:
            vecs[:, c] = -vecs[:, c]
    buckets = eigenvalue_allocation(vals, m)
    rows = [vecs[:, i] for bucket in buckets for i in bucket]
    return np.asarray(rows, dtype=np.float64)


def _pq_cross_moment_pass(
    df: DataFrame, R: np.ndarray, books: np.ndarray, vec_col: str
) -> np.ndarray:
    """One bounded pass for the Procrustes step of non-parametric OPQ:
    per Arrow batch, rotate ``Y = X R^T``, PQ-encode ``Y`` against the
    broadcast ``books`` and reconstruct ``Yhat``, then emit the flattened
    ``d x d`` partial ``X^T Yhat``.  Cross-partial reduction is the same
    exact ``decimal(38,18)`` posexplode-groupBy as ``_corpus_moments`` —
    ``d^2`` cells shuffle regardless of corpus size."""
    R64 = np.ascontiguousarray(np.asarray(R, dtype=np.float64))
    B = np.ascontiguousarray(np.asarray(books, dtype=np.float64))
    m, _n_codes, dsub = B.shape
    d = R64.shape[0]

    def kernel(batches):
        import pyarrow as pa

        from vectordb_watermark_spark.functions.arrowmat import (
            list_array_to_matrix,
        )

        for rb in batches:
            if not rb.num_rows:
                continue
            X = list_array_to_matrix(rb.column(0), dtype=np.float64)
            Y = X @ R64.T
            Yhat = np.empty_like(Y)
            for s in range(m):
                cb = B[s]
                Ys = Y[:, s * dsub:(s + 1) * dsub]
                d2 = (
                    (Ys * Ys).sum(axis=1)[:, None]
                    - 2.0 * (Ys @ cb.T)
                    + (cb * cb).sum(axis=1)[None, :]
                )
                Yhat[:, s * dsub:(s + 1) * dsub] = cb[d2.argmin(axis=1)]
            yield pa.RecordBatch.from_arrays(
                [pa.array([(X.T @ Yhat).reshape(-1).tolist()],
                          type=pa.list_(pa.float64()))],
                names=["mm"],
            )

    partials = df.select(vec_col).mapInArrow(
        kernel, schema="mm array<double>"
    )
    rows = (
        partials.select(F.posexplode("mm").alias("i", "x"))
        .groupBy("i")
        .agg(F.sum(F.col("x").cast("decimal(38,18)")).alias("sx"))
        .collect()
    )
    M = np.zeros(d * d, dtype=np.float64)
    for r in rows:
        M[int(r["i"])] = float(r["sx"])
    return M.reshape(d, d)


def opq_refine_rotation(
    df: DataFrame,
    m: int,
    R0: np.ndarray | None = None,
    n_codes: int = 256,
    n_iter: int = 4,
    kmeans_iters: int = 3,
    key: str = "opq",
    id_col: str = "id",
    vec_col: str = "v",
    sample_fraction: float | None = None,
) -> np.ndarray:
    """Non-parametric OPQ (Ge et al. 2013, §5): refine a rotation by
    alternating (a) PQ codebook training in the current rotated space and
    (b) the orthogonal-Procrustes rotation update against the PQ
    reconstructions — the iteration FAISS runs inside ``OPQMatrix::train``.
    Starts from ``R0`` (default: the parametric eigenvalue-allocation
    rotation, one moment pass) and returns the refined ``R`` (orthonormal
    rows, same convention as :func:`opq_train_rotation`).

    Each of the ``n_iter`` alternations costs: one :func:`pq_train` in
    rotated space (``kmeans_iters`` bounded assign passes, ``m*n_codes``
    rows to the driver each) + ONE cross-moment pass reducing exactly
    ``d^2`` decimal cells + a driver-side ``d x d`` SVD — every stage's
    shuffled/collected state is independent of corpus size, so the
    alternation is 100-TB-shaped; ``sample_fraction`` (keyed-hash on
    ``id_col`` — deterministic, partition-invariant) bounds the SCAN cost
    of the training passes when even linear passes are too dear.

    Determinism: seeded k-means + exact decimal reduces + SVD sign
    stabilization (largest-|coef| row positive per left singular vector)
    make the result reproducible for a fixed partitioning; as everywhere
    in the index stack, bit-exactness across build/append/query comes
    from the STORED rotation sidecar, never retraining.
    """
    from vectordb_watermark_spark.functions.hashing import keyed_uniform
    from vectordb_watermark_spark.operators.pq import pq_train

    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    train = df
    if sample_fraction is not None:
        if not 0.0 < sample_fraction <= 1.0:
            raise ValueError(
                f"sample_fraction must be in (0, 1], got {sample_fraction}"
            )
        train = df.filter(
            keyed_uniform(F.lit(key), F.lit("opqsample"), F.col(id_col))
            < sample_fraction
        )
    train = train.persist()
    try:
        R = (
            np.asarray(R0, dtype=np.float64)
            if R0 is not None
            else opq_train_rotation(train, m, vec_col=vec_col)
        )
        for _ in range(n_iter):
            rotated = rotate_vectors(train, R, vec_col=vec_col)
            books = pq_train(
                rotated, m, n_codes, kmeans_iters, key,
                id_col=id_col, vec_col=vec_col,
            )
            M = _pq_cross_moment_pass(train, R, books, vec_col)
            # min_R ||X R^T - Yhat||_F over orthogonal R: with
            # M = X^T Yhat = U S V^T the optimum is R = V U^T
            U, _S, Vt = np.linalg.svd(M)
            # deterministic sign: flip (U col, V row) pairs together so
            # the product is unchanged but each U column's largest-|coef|
            # entry is positive
            for c in range(U.shape[1]):
                j = int(np.argmax(np.abs(U[:, c])))
                if U[j, c] < 0:
                    U[:, c] = -U[:, c]
                    Vt[c, :] = -Vt[c, :]
            R = Vt.T @ U.T
    finally:
        train.unpersist()
    return np.ascontiguousarray(R)


def rotate_vectors(
    df: DataFrame, R: np.ndarray, vec_col: str = "v"
) -> DataFrame:
    """Map-only GEMM ``x -> R @ x`` on ``vec_col`` (all other columns ride
    through unchanged; output column keeps the name and the engine's
    ``array<float>`` storage convention).  Compute is float64, emission is
    float32 — the same precision contract as ``pq._pq_base``'s cast, so a
    build that rotates and an append that rotates see bit-identical
    inputs to the encoder."""
    R = np.ascontiguousarray(np.asarray(R, dtype=np.float64))
    if R.ndim != 2 or R.shape[0] != R.shape[1]:
        raise ValueError(f"rotation must be square, got {R.shape}")
    names = df.schema.fieldNames()
    if vec_col not in names:
        raise ValueError(f"no column {vec_col!r} in {names}")
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" if f.name != vec_col
        else f"{f.name} array<float>"
        for f in df.schema.fields
    )

    def kernel(batches):
        import pyarrow as pa

        from vectordb_watermark_spark.functions.arrowmat import (
            list_array_to_matrix,
        )

        for rb in batches:
            if not rb.num_rows:
                continue
            bnames = rb.schema.names
            X = list_array_to_matrix(
                rb.column(bnames.index(vec_col)), dtype=np.float64
            )
            if X.shape[1] != R.shape[0]:
                raise ValueError(
                    f"vector dim {X.shape[1]} != rotation dim {R.shape[0]}"
                )
            Y = (X @ R.T).astype(np.float32)
            arrays = [
                pa.array(Y.tolist(), type=pa.list_(pa.float32()))
                if nm == vec_col else rb.column(bnames.index(nm))
                for nm in bnames
            ]
            yield pa.RecordBatch.from_arrays(arrays, names=bnames)

    return df.mapInArrow(kernel, schema=out_fields)


def affine_transform_vectors(
    df: DataFrame,
    A: np.ndarray,
    mean: np.ndarray | None = None,
    vec_col: str = "v",
) -> DataFrame:
    """Map-only affine transform ``x -> (x - mean) @ A`` on ``vec_col``
    (``A`` is ``(d, k)`` — rectangular allowed, so this covers projection
    and whitening; other columns ride through).  Compute float64, emit
    float32 — the engine's vector storage convention."""
    A = np.ascontiguousarray(np.asarray(A, dtype=np.float64))
    if A.ndim != 2:
        raise ValueError(f"transform must be 2-d, got {A.shape}")
    mu = (
        np.zeros(A.shape[0]) if mean is None
        else np.asarray(mean, dtype=np.float64).reshape(-1)
    )
    if mu.size != A.shape[0]:
        raise ValueError(f"mean dim {mu.size} != transform rows {A.shape[0]}")
    names = df.schema.fieldNames()
    if vec_col not in names:
        raise ValueError(f"no column {vec_col!r} in {names}")
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" if f.name != vec_col
        else f"{f.name} array<float>"
        for f in df.schema.fields
    )

    def kernel(batches):
        import pyarrow as pa

        from vectordb_watermark_spark.functions.arrowmat import (
            list_array_to_matrix,
        )

        for rb in batches:
            if not rb.num_rows:
                continue
            bnames = rb.schema.names
            X = list_array_to_matrix(
                rb.column(bnames.index(vec_col)), dtype=np.float64
            )
            if X.shape[1] != A.shape[0]:
                raise ValueError(
                    f"vector dim {X.shape[1]} != transform dim {A.shape[0]}"
                )
            Y = ((X - mu[None, :]) @ A).astype(np.float32)
            arrays = [
                pa.array(Y.tolist(), type=pa.list_(pa.float32()))
                if nm == vec_col else rb.column(bnames.index(nm))
                for nm in bnames
            ]
            yield pa.RecordBatch.from_arrays(arrays, names=bnames)

    return df.mapInArrow(kernel, schema=out_fields)


def whitening_transform(
    df: DataFrame,
    vec_col: str = "v",
    k: int | None = None,
    eps: float = 1e-9,
    mode: str = "pca",
) -> tuple[np.ndarray, np.ndarray]:
    """Train a retrieval-whitening transform (Su et al. 2021, "Whitening
    Sentence Representations for Better Semantics and Faster Retrieval"):
    embedding models emit ANISOTROPIC vectors — cosine similarities crowd
    into a narrow cone, which flattens the score distribution retrieval
    and semantic-dedup thresholds depend on.  Whitening maps the corpus
    to zero mean and identity covariance, restoring the geometry cosine
    assumes; the paper's ``whitening-k`` variant keeps only the top-``k``
    principal directions (dimensionality reduction for free — smaller
    vectors ALSO make every downstream kNN/ANN/dedup pass cheaper, the
    100 TB lever).

    Returns ``(mean (d,), W (d, k))`` for ``y = (x - mean) @ W``:

    - ``mode="pca"``: ``W = U_k diag(1/sqrt(lambda_k + eps))`` — the
      paper's choice; output coordinates are the scaled principal scores.
    - ``mode="zca"``: ``W = U diag(1/sqrt(lambda + eps)) U^T`` — the
      symmetric whitener, closest-to-identity (only defined for full
      ``k = d``; ZCA preserves the original coordinate meaning).

    Training shape is the same bounded moment pass as the OPQ rotation:
    one ``mapInArrow`` corpus scan reducing to ``d + d^2`` cells.
    Deterministic for a fixed partitioning (exact decimal reduce +
    sign-stabilized eigenvectors)."""
    _n, mean, cov = _corpus_moments(df, vec_col)
    d = mean.size
    if k is None:
        k = d
    if not 1 <= k <= d:
        raise ValueError(f"k={k} out of range 1..{d}")
    vals, vecs = np.linalg.eigh(cov)  # ascending
    for c in range(vecs.shape[1]):  # deterministic sign
        j = int(np.argmax(np.abs(vecs[:, c])))
        if vecs[j, c] < 0:
            vecs[:, c] = -vecs[:, c]
    order = np.argsort(vals)[::-1]
    vals, vecs = vals[order], vecs[:, order]
    scale = 1.0 / np.sqrt(np.maximum(vals, 0.0) + eps)
    if mode == "pca":
        W = vecs[:, :k] * scale[None, :k]
    elif mode == "zca":
        if k != d:
            raise ValueError("zca whitening is full-dimensional (k must be d)")
        W = (vecs * scale[None, :]) @ vecs.T
    else:
        raise ValueError(f"mode must be 'pca' or 'zca', got {mode!r}")
    return mean, W


def whiten_embeddings(
    df: DataFrame,
    vec_col: str = "v",
    k: int | None = None,
    eps: float = 1e-9,
    mode: str = "pca",
) -> DataFrame:
    """Train-and-apply convenience: :func:`whitening_transform` on the
    corpus, then the map-only :func:`affine_transform_vectors` pass.  For
    the split train-on-corpus / apply-to-queries pattern (every retrieval
    deployment: queries must go through the SAME frozen transform), call
    the two pieces yourself and persist ``(mean, W)``."""
    mean, W = whitening_transform(df, vec_col, k=k, eps=eps, mode=mode)
    return affine_transform_vectors(df, W, mean=mean, vec_col=vec_col)
