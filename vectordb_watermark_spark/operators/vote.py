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


def bitwise_majority_vote(
    decoded: DataFrame,
    blk_col: str = "blk",
    payload_col: str = "payload",
    n_bits: int = 16,
) -> DataFrame:
    """Per-bit majority vote: ``(blk, payload, samples)`` where bit ``b`` of
    the winning payload is 1 iff more than half the block's samples have it
    set (ties -> 0).  One explode + two map-side-combined aggregations.

    More robust than bitstring mode when no single intact payload repeats —
    single-bit errors average out instead of fragmenting the vote.
    """
    bits = decoded.select(
        F.col(blk_col),
        F.col(payload_col),
        F.explode(F.sequence(F.lit(0), F.lit(n_bits - 1))).alias("bit"),
    ).select(
        blk_col,
        "bit",
        F.expr(f"CASE WHEN shiftright({payload_col}, CAST(bit AS INT)) & 1 = 1 "
               "THEN 1 ELSE -1 END").alias("s"),
    )
    sums = bits.groupBy(blk_col, "bit").agg(F.sum("s").alias("ssum"))
    packed = sums.groupBy(blk_col).agg(
        F.sum(
            F.expr("CASE WHEN ssum > 0 THEN shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT)) "
                   "ELSE CAST(0 AS BIGINT) END")
        ).cast("int").alias(payload_col)
    )
    totals = decoded.groupBy(blk_col).agg(F.count(F.lit(1)).alias("samples"))
    return packed.join(totals, blk_col).select(blk_col, payload_col, "samples")


def robust_vote(
    decoded: DataFrame,
    blk_col: str = "blk",
    payload_col: str = "payload",
    n_bits: int = 16,
    min_support: int = 2,
) -> DataFrame:
    """Pollution-resistant per-block vote used by blind extraction.

    CRC-surviving false carriers (pollution from blind carrier re-derivation
    drift) carry *random* payloads — they essentially never duplicate.  True
    carriers duplicate their block payload heavily.  So: take the bitstring
    mode when its winner repeats (``winner_count >= min_support`` — then it
    is almost surely the true payload), else fall back to the bitwise
    majority, which tolerates unique-but-near-correct samples better than a
    fragmented mode.  Schema matches :func:`majority_vote`.
    """
    mode = majority_vote(decoded, blk_col, payload_col)
    bitwise = bitwise_majority_vote(decoded, blk_col, payload_col, n_bits).select(
        blk_col, F.col(payload_col).alias("__bw_payload")
    )
    return (
        mode.join(bitwise, blk_col)
        .select(
            blk_col,
            F.when(F.col("winner_count") >= min_support, F.col(payload_col))
            .otherwise(F.col("__bw_payload"))
            .alias(payload_col),
            "samples",
            "winner_count",
            "winner_pct",
        )
    )
