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


def _bitwise_from_counts(
    counts: DataFrame, blk_col: str, payload_col: str, n_bits: int
) -> DataFrame:
    """``(blk, payload)`` per-bit weighted majority over pre-aggregated
    ``(blk, payload, cnt)`` rows; bit is 1 iff strictly more than half the
    weight has it set (ties -> 0)."""
    bits = counts.select(
        F.col(blk_col),
        F.col("cnt"),
        F.explode(F.sequence(F.lit(0), F.lit(n_bits - 1))).alias("bit"),
        F.col(payload_col).alias("__p"),
    ).select(
        blk_col,
        "bit",
        F.expr("CASE WHEN shiftright(__p, CAST(bit AS INT)) & 1 = 1 "
               "THEN cnt ELSE -cnt END").alias("s"),
    )
    sums = bits.groupBy(blk_col, "bit").agg(F.sum("s").alias("ssum"))
    return sums.groupBy(blk_col).agg(
        F.sum(
            F.expr("CASE WHEN ssum > 0 THEN shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT)) "
                   "ELSE CAST(0 AS BIGINT) END")
        ).cast("int").alias(payload_col)
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
    counts = decoded.groupBy(blk_col, payload_col).agg(F.count(F.lit(1)).alias("cnt"))
    packed = _bitwise_from_counts(counts, blk_col, payload_col, n_bits)
    totals = counts.groupBy(blk_col).agg(F.sum("cnt").alias("samples"))
    return packed.join(totals, blk_col).select(blk_col, payload_col, "samples")


def robust_vote_counts(
    counts: list[tuple[int, int, int]],
    n_bits: int = 16,
    trim_radius: int | None = None,
) -> dict[int, tuple[int, int, int]]:
    """Driver-side kernel of :func:`robust_vote` over pre-aggregated
    ``(blk, payload, cnt)`` triples.

    The count table is **bounded** — at most ``blocks x 2**n_bits`` rows
    regardless of corpus size — so after the one distributed
    ``groupBy(blk, payload).count()`` the vote itself is driver-scalar work
    (same shape as AQE deciding to broadcast a provably-small side).
    :func:`extract_watermark` uses this to avoid ~a dozen tiny shuffle
    stages per extract.  Semantics are identical to :func:`robust_vote`
    (property-tested against it); returns ``{blk: (payload, samples,
    winner_count)}``.
    """
    if trim_radius is None:
        trim_radius = max(1, n_bits // 4)
    by_blk: dict[int, dict[int, int]] = {}
    for blk, payload, cnt in counts:
        by_blk.setdefault(blk, {})[payload] = by_blk.get(blk, {}).get(payload, 0) + cnt

    def bitwise(c: dict[int, int]) -> int:
        m = 0
        for b in range(n_bits):
            s = sum(cnt if (p >> b) & 1 else -cnt for p, cnt in c.items())
            if s > 0:
                m |= 1 << b
        return m

    out: dict[int, tuple[int, int, int]] = {}
    for blk, c in by_blk.items():
        samples = sum(c.values())
        m0 = bitwise(c)
        trimmed = {p: cnt for p, cnt in c.items() if bin(p ^ m0).count("1") <= trim_radius}
        if not trimmed:
            trimmed = c
        cands = set(trimmed) | {bitwise(trimmed)}
        winner = min(
            cands,
            key=lambda cand: (
                sum(cnt * bin(cand ^ p).count("1") for p, cnt in trimmed.items()),
                cand,
            ),
        )
        out[blk] = (winner, samples, c.get(winner, 0))
    return out


def robust_vote(
    decoded: DataFrame,
    blk_col: str = "blk",
    payload_col: str = "payload",
    n_bits: int = 16,
    trim_radius: int | None = None,
) -> DataFrame:
    """Trimmed Hamming-centroid per-block vote used by blind extraction.

    Two passes, both pure DataFrame aggregations over the tiny
    ``(blk, payload, cnt)`` count table:

    1. **Trim**: compute the per-bit weighted majority ``m0`` over all of a
       block's samples and drop samples with ``popcount(payload ^ m0) >
       trim_radius`` (default ``n_bits // 4``).  CRC-lucky false carriers
       from blind carrier re-derivation drift carry *random* payloads —
       Hamming ~``n_bits/2`` from everything — and one such outlier can tie
       or tip a close vote among the true samples; trimming removes it
       without touching near-correct true samples (attack noise flips only a
       few bits).  Blocks where trimming would drop everything keep all
       samples (pollution-only blocks still vote; the AES-GCM tag is the
       final arbiter).
    2. **Centroid vote** over the survivors: winner = the candidate payload
       minimizing the multiplicity-weighted total Hamming distance to the
       block's surviving samples (ties -> smaller payload).  Candidates are
       the surviving payloads plus their bitwise majority, which can
       synthesize the centroid when every sample carries a different
       single-bit error.  This subsumes the bitstring mode (zero distance to
       duplicates) and handles *correlated* single-bit errors (an attack
       suppressing one basis direction flips the same bit across carriers,
       creating mode ties that plain tie-breaks get wrong).

    ``samples`` / ``winner_pct`` report over the **untrimmed** block so
    stats match the reference's tallies.  Schema matches
    :func:`majority_vote`.
    """
    if trim_radius is None:
        trim_radius = max(1, n_bits // 4)
    counts = decoded.groupBy(blk_col, payload_col).agg(F.count(F.lit(1)).alias("cnt"))

    m0 = _bitwise_from_counts(counts, blk_col, payload_col, n_bits).select(
        blk_col, F.col(payload_col).alias("__m0")
    )
    flagged = counts.join(m0, blk_col).withColumn(
        "__keep",
        F.bit_count(F.col(payload_col).bitwiseXOR(F.col("__m0"))) <= F.lit(trim_radius),
    )
    any_kept = Window.partitionBy(blk_col)
    trimmed = (
        flagged.withColumn("__n_kept", F.sum(F.col("__keep").cast("int")).over(any_kept))
        .filter(F.col("__keep") | (F.col("__n_kept") == 0))
        .select(blk_col, payload_col, "cnt")
    )

    bw = _bitwise_from_counts(trimmed, blk_col, payload_col, n_bits)
    candidates = trimmed.select(blk_col, payload_col).unionByName(bw).distinct().select(
        F.col(blk_col), F.col(payload_col).alias("__cand")
    )
    scored = (
        candidates.join(trimmed, blk_col)
        .groupBy(blk_col, "__cand")
        .agg(
            F.sum(
                F.col("cnt")
                * F.bit_count(F.col("__cand").bitwiseXOR(F.col(payload_col)))
            ).alias("__total_ham")
        )
    )
    w = Window.partitionBy(blk_col).orderBy(F.col("__total_ham").asc(), F.col("__cand").asc())
    winners = (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(F.col(blk_col), F.col("__cand").alias(payload_col))
    )
    totals = counts.groupBy(blk_col).agg(F.sum("cnt").alias("samples"))
    exact = counts.select(blk_col, payload_col, F.col("cnt").alias("__exact"))
    return (
        winners.join(totals, blk_col)
        .join(exact, [blk_col, payload_col], "left")
        .select(
            F.col(blk_col),
            F.col(payload_col),
            F.col("samples"),
            F.coalesce(F.col("__exact"), F.lit(0)).cast("long").alias("winner_count"),
            F.round(F.coalesce(F.col("__exact"), F.lit(0)) * 100.0 / F.col("samples"), 4).alias(
                "winner_pct"
            ),
        )
    )
