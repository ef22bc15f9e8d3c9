"""Distinct-count sketching — KMV (k-minimum-values) over keyed hashes.

The scale story: counting distinct tokens/urls/users exactly over 100 TB
costs a full shuffle of every distinct value; a KMV sketch needs only the
``k`` smallest hash values — collected via per-partition top-k + driver
merge (``TakeOrderedAndProject``), no full-width shuffle, constant memory.

Unlike Spark's ``approx_count_distinct`` (HLL++, whose estimate depends on
internal binning and is not reproducible elsewhere), KMV over the engine's
keyed sha256-derived 60-bit hashes is fully DETERMINISTIC: the k-th
smallest hash is a pure function of the value set, so the *estimate itself*
hash-matches a DuckDB oracle (driver query ``sketch_distinct_tokens``).

Estimator (Bar-Yossef et al. 2002, "Counting distinct elements in a data
stream"): with ``t`` = k-th smallest of n distinct hashes uniform on
``[0, M)``, ``E[t/M] ~ k/(n+1)``, so ``n_hat = (k-1) * M / t`` (the
unbiased variant).  Relative error ~ 1/sqrt(k).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: hash domain: 60-bit words from the leading 15 hex chars of sha256 —
#: the same word layout the dedup/minhash kernels use
HASH_BITS = 60
HASH_DOMAIN = 1 << HASH_BITS


def hash60(col: Column) -> Column:
    """Deterministic 60-bit hash of a string column (sha256 prefix)."""
    return F.conv(F.substring(F.sha2(col, 256), 1, 15), 16, 10).cast("long")


def kmv_distinct(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """One-row DataFrame ``(estimate BIGINT, exact_k INT, kth_hash BIGINT)``
    estimating the number of distinct values of ``df[col]``.

    Physical plan: per-partition distinct hashing feeds a global
    ``TakeOrderedAndProject`` of the k smallest distinct hashes — the only
    thing crossing the wire is k longs per partition.  If the column has
    fewer than ``k`` distinct values the count is exact (kth_hash NULL).
    """
    hashes = df.select(hash60(F.col(col)).alias("h")).distinct()
    smallest = hashes.orderBy("h").limit(k)
    agg = smallest.agg(
        F.count(F.lit(1)).alias("n"), F.max("h").alias("t")
    )
    return agg.select(
        F.when(
            F.col("n") < k, F.col("n").cast("long")
        ).otherwise(
            # explicit floor: Spark's double->long cast truncates but
            # DuckDB's rounds — floor() first makes both engines identical
            F.floor((F.lit(k - 1) * F.lit(float(HASH_DOMAIN))) / F.col("t")).cast("long")
        ).alias("estimate"),
        F.col("n").cast("int").alias("exact_k"),
        F.when(F.col("n") >= k, F.col("t")).alias("kth_hash"),
    )
