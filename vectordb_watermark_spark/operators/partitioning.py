"""Partition-count hygiene shared by fan-out-heavy operators.

A single small parquet file arrives as one (or few) partitions; any operator
whose per-row work fans out (kNN probe GEMMs, LSH bucket joins) would then
serialize on a handful of tasks.  On a real cluster inputs are already
well-partitioned and this is a no-op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_to_parallelism(
    df: DataFrame, factor: int = 1, rows: int | None = None, min_rows_per_task: int = 128
) -> DataFrame:
    """Round-robin repartition up to ``factor x`` the session's default
    parallelism when the plan has fewer partitions.  Round-robin is
    skew-proof — hot keys' rows land on all partitions.

    ``rows``, when the caller knows it (e.g. a collected build side), caps
    the fan-out so tiny inputs don't pay scheduling for near-empty tasks:
    partitions never exceed ``rows // min_rows_per_task``.  At scale the cap
    is far above the parallelism target — a no-op."""
    target = df.sparkSession.sparkContext.defaultParallelism * factor
    if rows is not None:
        target = max(1, min(target, rows // min_rows_per_task))
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
