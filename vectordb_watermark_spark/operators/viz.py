"""Visualization operator — pairwise stats + 2-D projection (SURVEY.md §2.8
M1/M2, §2.4 P13, §2.5 A5; reference reduce_dimensions,
database/pgvector/pg_func.py:921-1011).

The reference computes pairwise distance/cosine summary stats, downsamples to
<= 500 rows, PCA-pre-reduces to 50 dims when D > 50, then t-SNE to 2-D.
Spark-first re-expression:

- **pairwise stats**: exact distributed aggregate over sampled pairs (the
  reference samples too) — JVM-side distance expressions, one agg, no driver
  matrix.
- **sampling**: keyed-hash deterministic (O5) — reproducible at any
  parallelism, unlike np.random.choice.
- **PCA**: computed from the distributed covariance matrix (posexplode ->
  per-(i,j) partial sums -> driver eigendecomposition of the small D x D
  Gram).  D is bounded (vectors are <= a few thousand dims), N is not — so
  the N-dimension stays fully distributed.  Sign-stabilized eigenvectors for
  determinism.
- **t-SNE**: inherently driver-side on <= 500 samples (the reference's own
  budget); import-gated on scikit-learn, PCA projection returned otherwise.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectordb_watermark_spark.functions.hashing import keyed_uniform
from vectordb_watermark_spark.functions.vector import cosine_similarity, euclidean

VIZ_SAMPLE_BUDGET = 500  # reference pg_func.py:948-960


def pairwise_stats(
    df: DataFrame,
    id_col: str = "id",
    vec_col: str = "emb",
    max_rows: int = VIZ_SAMPLE_BUDGET,
    seed_key: str = "viz-42",
) -> DataFrame:
    """Summary stats over all pairs of a keyed-hash sample:
    ``(n_pairs, mean_dist, max_dist, mean_cos, min_cos, max_cos, std_cos)``
    (reference pg_func.py:928-946)."""
    total = df.count()
    frac = min(1.0, max_rows / max(total, 1))
    sample = df.filter(keyed_uniform(seed_key, "s", F.col(id_col)) < F.lit(frac))
    a = sample.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    b = sample.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    pairs = a.join(F.broadcast(b), F.col("a") < F.col("b")).select(
        euclidean(F.col("va"), F.col("vb")).alias("dist"),
        cosine_similarity(F.col("va"), F.col("vb")).alias("cos"),
    )
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.avg("dist"), 6).alias("mean_dist"),
        F.round(F.max("dist"), 6).alias("max_dist"),
        F.round(F.avg("cos"), 6).alias("mean_cos"),
        F.round(F.min("cos"), 6).alias("min_cos"),
        F.round(F.max("cos"), 6).alias("max_cos"),
        F.round(F.stddev_samp("cos"), 6).alias("std_cos"),
    )


def distributed_pca(
    df: DataFrame, vec_col: str = "emb", k: int = 2
) -> tuple[np.ndarray, np.ndarray]:
    """PCA basis from a fully distributed covariance computation.

    Returns (mean (D,), components (D, k)).  The N-sized work — mean and
    covariance partial sums — is DataFrame aggregation (posexplode pairs with
    map-side combine); only the D x D covariance is collected.  Eigenvectors
    are sign-stabilized (largest-|coef| coordinate positive).
    """
    n = df.count()
    if n == 0:
        raise ValueError("empty table")
    # mean per position
    pos = df.select(F.posexplode(F.col(vec_col)).alias("i", "x"))
    mean_rows = pos.groupBy("i").agg(F.avg("x").alias("m")).collect()
    dim = len(mean_rows)
    mean = np.zeros(dim)
    for r in mean_rows:
        mean[r["i"]] = r["m"]

    # covariance: E[x_i x_j] via pair-exploded partial sums (i <= j)
    with_id = df.select(F.col(vec_col).alias("v"))
    pairs = (
        with_id.select(F.posexplode("v").alias("i", "xi"), F.col("v"))
        .select("i", "xi", F.posexplode("v").alias("j", "xj"))
        .filter(F.col("j") >= F.col("i"))
        .groupBy("i", "j")
        .agg(F.sum(F.col("xi").cast("double") * F.col("xj").cast("double")).alias("sxx"))
        .collect()
    )
    cov = np.zeros((dim, dim))
    for r in pairs:
        cov[r["i"], r["j"]] = r["sxx"] / n
        cov[r["j"], r["i"]] = r["sxx"] / n
    cov -= np.outer(mean, mean)

    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order]
    for c in range(comps.shape[1]):  # deterministic sign
        j = int(np.argmax(np.abs(comps[:, c])))
        if comps[j, c] < 0:
            comps[:, c] = -comps[:, c]
    return mean, comps


def project_2d(
    df: DataFrame,
    id_col: str = "id",
    vec_col: str = "emb",
    max_rows: int = VIZ_SAMPLE_BUDGET,
    seed_key: str = "viz-42",
    method: str = "pca",
) -> DataFrame:
    """2-D projection of a deterministic sample: ``(id, x, y)``.

    ``method='pca'``: distributed-PCA basis, projection as a JVM dot-product
    expression.  ``method='tsne'``: reference-style PCA-50 -> t-SNE on the
    <= 500-row sample (requires scikit-learn; import-gated)."""
    total = df.count()
    frac = min(1.0, max_rows / max(total, 1))
    sample = df.filter(keyed_uniform(seed_key, "s", F.col(id_col)) < F.lit(frac))

    if method == "tsne":
        try:
            from sklearn.manifold import TSNE  # noqa: F401
        except ImportError as exc:
            raise ImportError(
                "t-SNE projection requires scikit-learn (not installed here); "
                "use method='pca' or install sklearn — the sample budget "
                "(<=500 rows) matches the reference's own t-SNE cap"
            ) from exc
        rows = sample.select(id_col, vec_col).collect()
        X = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
        mean, comps = distributed_pca(sample, vec_col, k=min(50, X.shape[1]))
        Xp = (X - mean) @ comps
        emb2 = TSNE(
            n_components=2, perplexity=min(30, max(5, len(X) // 5)), random_state=42
        ).fit_transform(Xp)
        out = [(int(r[id_col]), float(x), float(y)) for r, (x, y) in zip(rows, emb2)]
        return df.sparkSession.createDataFrame(out, f"{id_col} long, x double, y double")

    mean, comps = distributed_pca(sample, vec_col, k=2)
    return _project_with_basis(sample, mean, comps, id_col, vec_col)


def _project_with_basis(sample, mean, comps, id_col, vec_col, extra_cols=()):
    mean_lit = F.array(*[F.lit(float(v)) for v in mean])
    centered = F.zip_with(F.col(vec_col), mean_lit, lambda x, m: x.cast("double") - m)
    px = F.array(*[F.lit(float(v)) for v in comps[:, 0]])
    py = F.array(*[F.lit(float(v)) for v in comps[:, 1]])
    dot = lambda v, w: F.aggregate(  # noqa: E731
        F.zip_with(v, w, lambda x, y: x * y), F.lit(0.0), lambda acc, t: acc + t
    )
    return sample.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        F.round(dot(centered, px), 6).alias("x"),
        F.round(dot(centered, py), 6).alias("y"),
    )


def project_2d_compare(
    before: DataFrame,
    after: DataFrame,
    id_col: str = "id",
    vec_col: str = "emb",
    max_rows: int = VIZ_SAMPLE_BUDGET,
    seed_key: str = "viz-42",
) -> DataFrame:
    """JN5 union-for-viz (reference np.vstack([orig, embedded]),
    pg_func.py:963): project original and watermarked tables into ONE shared
    PCA basis with a ``source`` tag — ``(id, source, x, y)``.  The basis is
    fit on the union so both clouds live in the same 2-D frame."""
    tagged = before.select(
        F.col(id_col), F.col(vec_col), F.lit("original").alias("source")
    ).unionByName(
        after.select(F.col(id_col), F.col(vec_col), F.lit("watermarked").alias("source"))
    )
    total = before.count() + after.count()
    frac = min(1.0, max_rows / max(total, 1))
    sample = tagged.filter(
        keyed_uniform(seed_key, "s", F.col(id_col), F.col("source")) < F.lit(frac)
    )
    mean, comps = distributed_pca(sample, vec_col, k=2)
    return _project_with_basis(sample, mean, comps, id_col, vec_col, extra_cols=("source",))
