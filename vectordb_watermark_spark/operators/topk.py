"""Scalable global top-k by a low-cardinality coarse key.

``row_number() OVER (ORDER BY ...)`` is a single-partition global sort — the
classic 1000-executor bottleneck.  When the leading sort key has low
cardinality (e.g. kNN in-degree: small ints), global top-k decomposes into:

1. histogram of the coarse key (tiny aggregate, map-side combined),
2. driver-side cumulative scan -> cutoff value + boundary remainder,
3. take *all* rows strictly below the cutoff (no sort at all), plus the
   boundary group ranked by the fine key — a window over only the boundary
   rows, which is a small fraction of N.

At 100 TB this turns an O(N log N) single-node sort into one tiny shuffle
plus a boundary-only window.  The reference's equivalent is an in-RAM
``sorted(...)[:pool]`` (database/pgvector/pg_func.py:148-157).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: below this row count the scalable paths cost more in job/stage overhead
#: than a plain single-partition window — callers that already know N pass
#: ``total`` and small inputs short-circuit (AQE-style adaptivity; the
#: scalable path stays the default when N is unknown)
SMALL_TOTAL = 2_000_000


def topk_by_coarse_key(
    df: DataFrame,
    k: int,
    coarse_col: str,
    fine_cols: list[str],
    ascending: bool = True,
    total: int | None = None,
) -> DataFrame:
    """Top-``k`` rows by ``(coarse_col, *fine_cols)`` without a global sort.

    ``coarse_col`` must be low-cardinality (the histogram is collected to the
    driver).  Ties beyond position ``k`` are broken by ``fine_cols`` inside
    the single boundary group.  Returns the selected rows (original columns).
    """
    if k <= 0:
        return df.limit(0)
    if total is not None and total <= SMALL_TOTAL:
        lead = F.col(coarse_col).asc() if ascending else F.col(coarse_col).desc()
        w = Window.orderBy(lead, *[F.col(c).asc() for c in fine_cols])
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
        )
    # the input feeds both the histogram action and the below/boundary scans;
    # cache so an expensive upstream lineage (e.g. a kNN build) runs once
    df = df.cache()
    hist = (
        df.groupBy(coarse_col)
        .count()
        .orderBy(F.col(coarse_col).asc() if ascending else F.col(coarse_col).desc())
        .collect()
    )
    cum = 0
    cutoff = None
    remainder = 0
    for row in hist:
        if cum + row["count"] >= k:
            cutoff = row[coarse_col]
            remainder = k - cum
            break
        cum += row["count"]
    if cutoff is None:  # fewer than k rows in total
        return df

    cmp_below = F.col(coarse_col) < F.lit(cutoff) if ascending else F.col(coarse_col) > F.lit(cutoff)
    below = df.filter(cmp_below)
    boundary = df.filter(F.col(coarse_col) == F.lit(cutoff))
    w = Window.orderBy(*[F.col(c).asc() for c in fine_cols])
    boundary_take = (
        boundary.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= remainder)
        .drop("__rn")
    )
    return below.unionByName(boundary_take)


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "rn",
    num_partitions: int | None = None,
    total: int | None = None,
) -> DataFrame:
    """Global 1-based row number by ``order_cols`` without a single-partition
    sort.

    ``row_number() OVER (ORDER BY ...)`` funnels all rows through one task.
    Instead: range-repartition on the sort keys (parallel range sort), count
    rows per partition (tiny job), then add the per-partition cumulative
    offset to a *partition-local* window.  The result is independent of the
    sampled range boundaries — global rank is well-defined for any disjoint
    ordered ranges — so determinism is preserved.
    """
    cols = [F.col(c) for c in order_cols]
    if total is not None and total <= SMALL_TOTAL:
        return df.withColumn(out_col, F.row_number().over(Window.orderBy(*cols)))
    if num_partitions is None:
        parted = df.repartitionByRange(*cols).sortWithinPartitions(*cols)
    else:
        parted = df.repartitionByRange(num_partitions, *cols).sortWithinPartitions(*cols)
    parted = parted.withColumn("__pid", F.spark_partition_id()).localCheckpoint(eager=False)
    counts = {r["__pid"]: r["cnt"] for r in parted.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_map = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    w = Window.partitionBy("__pid").orderBy(*cols)
    return (
        parted.withColumn(out_col, F.row_number().over(w) + offset_map[F.col("__pid")])
        .drop("__pid")
    )
