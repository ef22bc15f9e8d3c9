"""Per-block majority vote (mode) over decoded payloads.

The reference groups CRC-surviving payloads by decoded block index and takes
the most common bit-string per block with tally stats
(database/pgvector/pg_func.py:828-873).  Spark-first expression: a count
aggregate + a per-block rank window — two small shuffles on (blk, payload),
map-side combined, no driver Counter.  Ties break toward the smaller payload
value for determinism (the reference inherits Counter insertion order, which
is scan-order-dependent; a value tie-break is the order-free equivalent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def majority_vote(
    decoded: DataFrame, blk_col: str = "blk", payload_col: str = "payload"
) -> DataFrame:
    """``(blk, payload, samples, winner_count, winner_pct)`` — one row per
    block present in ``decoded``, carrying the winning payload and stats."""
    counts = decoded.groupBy(blk_col, payload_col).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy(blk_col).orderBy(F.col("cnt").desc(), F.col(payload_col).asc())
    totals = counts.groupBy(blk_col).agg(F.sum("cnt").alias("samples"))
    winners = (
        counts.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
    )
    return (
        winners.join(totals, blk_col)
        .select(
            F.col(blk_col),
            F.col(payload_col),
            F.col("samples"),
            F.col("cnt").alias("winner_count"),
            F.round(F.col("cnt") * 100.0 / F.col("samples"), 4).alias("winner_pct"),
        )
    )
