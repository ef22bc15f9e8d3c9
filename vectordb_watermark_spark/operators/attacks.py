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
    hash_gauss,
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

    Noise is per-(row, position): gauss(sha2(key|'g'|id|pos)) — element i of a
    victim row always gets the same perturbation, in Spark and in the oracle.
    """
    victim = keyed_uniform(seed_key, "v", F.col(id_col)) < F.lit(ratio)
    noisy = F.transform(
        F.col(vec_col),
        lambda x, i: x.cast("double")
        + F.lit(sigma) * hash_gauss(keyed_hash_hex(seed_key, "g", F.col(id_col), i)),
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
