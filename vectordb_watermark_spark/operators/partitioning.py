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


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    n_salts: int = 16,
    how: str = "inner",
    salt_key: str = "salt",
):
    """Inner/left equi-join with hot-key salting: the (large, possibly
    skewed) ``left`` side gets a deterministic keyed-hash salt in
    ``[0, n_salts)`` per row; the (smaller) ``right`` side is exploded
    ``n_salts`` times; the join runs on ``key_cols + [salt]`` so one hot
    key's rows spread across ``n_salts`` shuffle partitions instead of one
    straggler task.

    AQE's skew-join split handles most cases at runtime; explicit salting
    is for the cases AQE cannot split — e.g. a skewed aggregation following
    the join, or stream-static joins where AQE is unavailable.  The salt
    must vary WITHIN a hot key (a key-only hash would put the whole hot key
    back in one partition), so it hashes a per-row id; the salt assignment
    is therefore partitioning-dependent, but the JOIN RESULT is exactly the
    unsalted join for every assignment — the right side carries every salt
    value, so each left row matches precisely its unsalted matches (tested
    under repartitioning).
    """
    from pyspark.sql import functions as F

    # The right side is exploded n_salts times, so any join flavor that can
    # emit an UNMATCHED right row (right/full outer) would duplicate it once
    # per salt.  Only flavors whose output is driven by the left side are
    # equivalent to the unsalted join.
    allowed = {
        "inner", "cross", "left", "leftouter", "left_outer",
        "semi", "leftsemi", "left_semi", "anti", "leftanti", "left_anti",
    }
    if how.lower().replace(" ", "") not in allowed:
        raise ValueError(
            f"salted_join supports inner/left/semi/anti joins, not {how!r}: "
            "right/full outer would emit each unmatched right row n_salts times"
        )

    salt = (F.abs(F.xxhash64(F.lit(salt_key), *[F.col(c) for c in key_cols], F.monotonically_increasing_id())) % n_salts)
    lsalted = left.withColumn("__salt", salt.cast("int"))
    rsalted = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return lsalted.join(rsalted, [*key_cols, "__salt"], how).drop("__salt")


def key_skew_stats(df: DataFrame, key_cols: list[str] | str) -> DataFrame:
    """Pre-flight skew diagnosis for a prospective join/groupBy key ->
    one row ``(n_rows, n_keys, max_key_n, top1_share_ppm,
    skew_ratio_ppm)``.

    ``skew_ratio_ppm`` is ``max_key_n / (n_rows / n_keys)`` — how many
    times bigger the hottest key is than the mean key — in parts per
    million (``floor(x * 1e6 + 0.5)``: identical IEEE ops in Spark and
    DuckDB, immune to the engines' differing half-rounding).  Rule of
    thumb: ratio over ~20x at production scale wants :func:`salted_join`
    or AQE skew-join; ``top1_share_ppm`` near 1e6 means one key IS the
    table and no partitioning trick saves a shuffle on it.

    Two aggregates (per-key tally, then the summary) — the same work the
    skewed shuffle itself would do, paid once up front at a sample or at
    full scale.  The per-key tally is one row per distinct key, the same
    state any groupBy on that key needs.
    """
    from pyspark.sql import functions as F

    cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    per_key = df.groupBy(*cols).agg(F.count("*").alias("n"))
    return per_key.agg(
        F.sum("n").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_keys"),
        F.max("n").cast("long").alias("max_key_n"),
        F.floor(
            F.max("n") * 1000000.0 / F.sum("n") + 0.5
        ).cast("long").alias("top1_share_ppm"),
        F.floor(
            F.max("n") * F.count("*") * 1000000.0 / F.sum("n") + 0.5
        ).cast("long").alias("skew_ratio_ppm"),
    )


def join_cardinality(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str] | str,
) -> DataFrame:
    """EXACT inner-equi-join output cardinality WITHOUT running the join
    -> one row ``(n_out, n_matching_keys, max_key_out, top_key_share_ppm)``.

    ``n_out = Σ_k n_left(k) · n_right(k)`` over matching keys — computed
    from the two per-key tallies joined on the key, which is two
    aggregates plus a join of KEY-CARDINALITY-sized tables, never the
    |L|·|R| output itself.  The question it answers at 100 TB: "is this
    join about to explode?" — a many-to-many key pairing multiplies, and
    ``max_key_out`` names the worst key's contribution before you pay
    for it (``top_key_share_ppm`` = its share of the whole output).
    Run it on a keyed-hash sample for a cheap estimate, or on the full
    tables for the exact number — same shape either way.
    """
    from pyspark.sql import functions as F

    cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    lk = left.groupBy(*cols).agg(F.count("*").alias("nl"))
    rk = right.groupBy(*cols).agg(F.count("*").alias("nr"))
    per = lk.join(rk, cols).select((F.col("nl") * F.col("nr")).alias("m"))
    return per.agg(
        F.coalesce(F.sum("m"), F.lit(0)).cast("long").alias("n_out"),
        F.count("*").cast("long").alias("n_matching_keys"),
        F.coalesce(F.max("m"), F.lit(0)).cast("long").alias("max_key_out"),
        F.coalesce(
            F.floor(F.max("m") * 1000000.0 / F.sum("m") + 0.5), F.lit(0)
        ).cast("long").alias("top_key_share_ppm"),
    )
