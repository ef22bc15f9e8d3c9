"""Robustness-attack transforms (SURVEY.md §2.9 T1-T4).

The reference ships these as standalone DB-mutating scripts with
``np.random`` / ``random.sample`` victim picks (attack/gaussian_attack.py,
subset_attack.py, mean_attack.py, truncate_attack.py).  Here each attack is a
pure DataFrame -> DataFrame column transform whose randomness is keyed
hashing (functions/hashing.py):

- deterministic under any partitioning,
- exactly reproducible in the DuckDB oracle (victim sets and even the
  Gaussian noise values are hash-derived, see the paired SQL builders used
  in __spark_entry__.py),
- entirely JVM-side Catalyst expressions — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectordb_watermark_spark.functions.hashing import (
    hash_gauss_word,
    keyed_hash_hex,
    keyed_uniform,
)
from vectordb_watermark_spark.functions.vector import as_float_array
from vectordb_watermark_spark.functions import vector as V


def gaussian_attack(
    df: DataFrame,
    ratio: float,
    sigma: float,
    seed_key: str = "attack-42",
    id_col: str = "id",
    vec_col: str = "emb",
) -> DataFrame:
    """T1: add N(0, sigma^2) to every element of a keyed-hash-chosen ``ratio``
    of rows (reference attack/gaussian_attack.py:17-56).

    Noise is per-(row, position) and identical in Spark and the oracle.  The
    expensive per-element ops are amortized: ONE sha256 digest per 4 elements
    (digest j = sha2(key|'g'|id|j) computed into an array first — interpreted
    HOF lambdas have no common-subexpression elimination) and ONE hex->int
    conversion per element (a 15-hex 60-bit word whose 30-bit halves feed
    Box-Muller, functions/hashing.hash_gauss_word).
    """
    victim = keyed_uniform(seed_key, "v", F.col(id_col)) < F.lit(ratio)
    n_digests = F.ceil(F.size(F.col(vec_col)) / F.lit(4)).cast("int")
    # staged arrays so every expensive op runs exactly once (HOF lambdas are
    # interpreted with no common-subexpression elimination — an expression
    # referenced inside a lambda is re-evaluated per element; a lambda
    # VARIABLE is not): digests (1 sha256 per 4 elems) -> per-digest 4
    # gaussians (1 conv each) -> zip with the vector
    digests = F.transform(
        F.sequence(F.lit(0), n_digests - F.lit(1)),
        lambda j: keyed_hash_hex(seed_key, "g", F.col(id_col), j),
    )
    gausses = F.flatten(
        F.transform(
            digests,
            lambda d: F.array(
                *[
                    hash_gauss_word(
                        F.conv(F.substring(d, 1 + 15 * w, 15), 16, 10).cast("long")
                    )
                    for w in range(4)
                ]
            ),
        )
    )
    noisy = F.zip_with(
        F.col(vec_col),
        F.slice(gausses, 1, F.size(F.col(vec_col))),
        lambda x, g: x.cast("double") + F.lit(sigma) * g,
    )
    out = F.when(victim, as_float_array(noisy)).otherwise(F.col(vec_col))
    return df.withColumn(vec_col, out)


def subset_attack(
    df: DataFrame, keep_ratio: float, seed_key: str = "attack-42", id_col: str = "id"
) -> DataFrame:
    """T2: keep a keyed-hash-chosen ``keep_ratio`` of rows, delete the rest
    (reference attack/subset_attack.py:14-49)."""
    return df.filter(keyed_uniform(seed_key, "v", F.col(id_col)) < F.lit(keep_ratio))


def mean_replace_attack(
    df: DataFrame,
    ratio: float,
    seed_key: str = "attack-42",
    id_col: str = "id",
    vec_col: str = "emb",
    mean_vec: list[float] | None = None,
) -> DataFrame:
    """T3: replace a keyed-hash-chosen ``ratio`` of rows with the global mean
    vector (reference attack/mean_attack.py:17-54).

    The mean is a distributed aggregate (functions/vector.vector_mean);
    it is then a broadcast literal in the replacement expression.
    """
    if mean_vec is None:
        mean_vec = V.vector_mean(df, vec_col).first()["mean_vec"]
    mean_lit = F.array(*[F.lit(float(x)) for x in mean_vec])
    victim = keyed_uniform(seed_key, "v", F.col(id_col)) < F.lit(ratio)
    return df.withColumn(
        vec_col, F.when(victim, as_float_array(mean_lit)).otherwise(F.col(vec_col))
    )


def truncate_pad_attack(
    df: DataFrame,
    keep_dims: int,
    vec_col: str = "emb",
    pad: str = "zero",
    mean_vec: list[float] | None = None,
) -> DataFrame:
    """T4: keep the first ``keep_dims`` dimensions, pad back to the original
    dimensionality with zeros or the mean tail (reference
    attack/truncate_attack.py:17-64)."""
    dim = df.select(F.size(vec_col)).first()[0]
    if not (0 < keep_dims <= dim):
        raise ValueError(f"keep_dims must be in (0, {dim}]")
    head = F.slice(F.col(vec_col), 1, keep_dims)
    if keep_dims == dim:
        return df
    if pad == "zero":
        tail = F.array_repeat(F.lit(0.0).cast("float"), dim - keep_dims)
    elif pad == "mean":
        if mean_vec is None:
            mean_vec = V.vector_mean(df, vec_col).first()["mean_vec"]
        tail = F.array(*[F.lit(float(x)).cast("float") for x in mean_vec[keep_dims:]])
    else:
        raise ValueError("pad must be 'zero' or 'mean'")
    return df.withColumn(vec_col, F.concat(head, tail))
