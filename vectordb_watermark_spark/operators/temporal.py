"""Temporal joins — as-of (nearest-prior) and banded range (point-in-
interval) joins as DataFrame compositions.

Spark has no native AS-OF join; this is the canonical example of SURVEY.md's
"custom operator as a composition of built-in ops" rule (and one of the
training-data-pipeline operators the engine ships beyond reference parity —
e.g. joining each training example to the most recent model/feature snapshot
at its timestamp).

The composition: tag both sides, union them, and run ONE carry-forward
window per key ordered by (time, side) — every left row then sees the
latest right-side payload at or before its timestamp.  Cost: a single
shuffle on the key columns (the window), independent of how many right rows
precede each left row — the naive range-join formulation explodes
quadratically per key and needs a second aggregation to keep only the
nearest match.  At 100 TB the shuffle is the same one any keyed join pays;
skewed keys are AQE's problem, not the operator's.

Exactly reproducible in DuckDB's native ``ASOF JOIN`` (``l.t >= r.t``
semantics: greatest right time <= left time, NULL when none) — which is the
oracle for the ``events_asof`` driver query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_point: str,
    right_lo: str,
    right_hi: str,
    band: int,
) -> DataFrame:
    """Point-in-interval join: left rows matched to right rows with
    ``right_lo <= left_point <= right_hi`` within ``key_cols`` (inner
    semantics).

    Spark's native plan for this predicate is a nested-loop join — O(n*m)
    per key.  The banded composition instead:

    1. explode each right interval to the time bands it covers
       (``sequence(floor(lo/band), floor(hi/band))`` — bounded by interval
       length / band);
    2. equi-join on ``(key_cols, band)`` — a plain shuffled hash join;
    3. re-check the exact containment predicate.

    Each left point lives in exactly one band and each interval appears
    once per covered band, so no dedup is needed.  ``band`` trades join
    fan-out (short bands -> more exploded rows) against candidate ratio
    (long bands -> more false candidates); set it near the typical interval
    length.  The equi-join is AQE-skew-splittable — the property the naive
    range predicate never gets.
    """
    lb = left.withColumn("__band", F.floor(F.col(left_point) / F.lit(band)).cast("long"))
    # drop malformed intervals (hi < lo) up front: the BETWEEN predicate
    # would match nothing anyway, but sequence(lo_band, hi_band) would error
    rb = right.filter(F.col(right_hi) >= F.col(right_lo)).withColumn(
        "__band",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / F.lit(band)).cast("long"),
                F.floor(F.col(right_hi) / F.lit(band)).cast("long"),
            )
        ),
    )
    joined = lb.join(rb, [*key_cols, "__band"]).filter(
        (F.col(left_point) >= F.col(right_lo)) & (F.col(left_point) <= F.col(right_hi))
    )
    return joined.drop("__band")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_time: str,
    right_time: str,
    value_cols: list[str],
    tiebreak_cols: list[str] | None = None,
    right_time_out: str = "matched_time",
) -> DataFrame:
    """For every left row: the right row with the greatest ``right_time``
    <= ``left_time`` within the same ``key_cols`` group (LEFT semantics —
    unmatched left rows keep NULL ``value_cols``/``right_time_out``).

    A right row at exactly the left timestamp matches (``>=``), mirroring
    DuckDB ASOF.  When several right rows share a (key, time),
    ``tiebreak_cols`` orders them and the LAST one wins; pass a unique
    column (or pre-aggregate the right side) for full determinism.

    The matched payload travels as one struct through ``last(...,
    ignorenulls=True)``, so a right row whose value column is genuinely
    NULL still wins the match (the struct is non-null) — semantics identical
    to a real join, not a coalesce over history.
    """
    tiebreak_cols = tiebreak_cols or []
    lcols = [c for c in left.columns]
    clash = (set(value_cols) | {right_time_out}) & set(lcols)
    if clash:
        raise ValueError(
            f"asof_join output column(s) {sorted(clash)} collide with left "
            "columns; rename the right-side value columns (or right_time_out) "
            "before joining"
        )
    # An input frame already containing one of the internal scratch names
    # would silently produce wrong matches via ambiguous columns in the
    # union below — refuse loudly instead.
    reserved = {"__t", "__side", "__p", "__m", "__rt"} | {
        f"__tb_{i}" for i in range(len(tiebreak_cols))
    }
    scratch_clash = reserved & (set(lcols) | set(right.columns))
    if scratch_clash:
        raise ValueError(
            f"asof_join reserves internal column name(s) {sorted(scratch_clash)}; "
            "rename them on the input frames before joining"
        )
    payload = F.struct(F.col(right_time).alias("__rt"), *[F.col(c) for c in value_cols])
    p_type = right.select(payload.alias("__p")).schema["__p"].dataType

    l_tagged = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(p_type).alias("__p"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__tb_{i}")
          for i, c in enumerate(tiebreak_cols)],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in key_cols],
        *[F.col(c) for c in key_cols],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        payload.alias("__p"),
        *[F.col(c).alias(f"__tb_{i}") for i, c in enumerate(tiebreak_cols)],
    ).select(*l_tagged.columns)  # align column order

    w = (
        Window.partitionBy(*key_cols)
        .orderBy(
            F.col("__t").asc(),
            F.col("__side").asc(),
            *[F.col(f"__tb_{i}").asc_nulls_first() for i in range(len(tiebreak_cols))],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l_tagged.unionByName(r_tagged)
        .withColumn("__m", F.last("__p", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    out = matched.select(
        *[F.col(c) for c in lcols],
        F.col("__m.__rt").alias(right_time_out),
        *[F.col(f"__m.{c}").alias(c) for c in value_cols],
    )
    return out
