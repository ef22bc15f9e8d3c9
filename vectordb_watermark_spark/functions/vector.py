"""Vector math over ``ARRAY<FLOAT/DOUBLE>`` columns — pure Catalyst expressions.

Covers the reference's per-row vector kernels (SURVEY.md §2.4 P5/P13, §2.5
A4/A5) as JVM-side higher-order functions: no Python in the hot path, so these
compose with whole-stage codegen and scale to 100 TB.  All arithmetic is done
in double to match the DuckDB oracle; cast back to float only at storage
boundaries.

Reference parity (cited, not copied):
- L2 norm save/normalize/restore: database/pgvector/pg_func.py:363-377.
- Pairwise Euclidean/cosine stats: pg_func.py:928-946.
- Mean vector: attack/mean_attack.py:40-41.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _d(x: Column) -> Column:
    return x.cast("double")


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns (double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: _d(x) * _d(y)), F.lit(0.0), lambda acc, v: acc + v
    )


def l2_norm_sq(v: Column) -> Column:
    """Squared L2 norm."""
    return F.aggregate(v, F.lit(0.0), lambda acc, x: acc + _d(x) * _d(x))


def l2_norm(v: Column) -> Column:
    return F.sqrt(l2_norm_sq(v))


def l2_normalize(v: Column, eps: float = 1e-8) -> Column:
    """v / (||v|| + eps) — same epsilon guard as the reference's normalize
    (pg_func.py:365-368)."""
    n = l2_norm(v) + F.lit(eps)
    return F.transform(v, lambda x: _d(x) / n)


def scale(v: Column, s: Column) -> Column:
    """Element-wise multiply by scalar column (norm restore)."""
    return F.transform(v, lambda x: _d(x) * _d(s))


def sq_euclidean(a: Column, b: Column) -> Column:
    """Squared Euclidean distance (monotone in distance — skip the sqrt when
    only ranking: cheaper and avoids a ulp of divergence)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (_d(x) - _d(y)) * (_d(x) - _d(y))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def euclidean(a: Column, b: Column) -> Column:
    return F.sqrt(sq_euclidean(a, b))


def cosine_similarity(a: Column, b: Column, eps: float = 1e-12) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b) + F.lit(eps))


def as_float_array(v: Column) -> Column:
    """Cast an array column to ARRAY<FLOAT> (storage boundary)."""
    return F.transform(v, lambda x: x.cast("float"))


def vector_mean(df: DataFrame, vec_col: str = "emb") -> DataFrame:
    """Global mean vector as a 1-row DataFrame ``(mean_vec ARRAY<DOUBLE>)``.

    Distributed: posexplode -> per-position avg -> re-assemble ordered by
    position.  One shuffle of (pos, partial sums) — at 100 TB this reduces to
    D partial aggregates per partition (map-side combine), never a driver
    matrix (contrast reference np.mean over an in-RAM matrix,
    attack/mean_attack.py:40-41).
    """
    pos_avg = (
        df.select(F.posexplode(F.col(vec_col)).alias("pos", "val"))
        .groupBy("pos")
        .agg(F.avg("val").alias("avg_val"))
    )
    return pos_avg.agg(
        F.array_sort(F.collect_list(F.struct("pos", "avg_val"))).alias("pairs")
    ).select(F.transform(F.col("pairs"), lambda p: p.getField("avg_val")).alias("mean_vec"))


def vector_stats(df: DataFrame, vec_col: str = "emb") -> DataFrame:
    """Per-table norm statistics (P5/A5 analogue): count, avg/min/max/stddev
    of the L2 norm, rounded for oracle comparability."""
    n = l2_norm(F.col(vec_col))
    return df.agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg(n), 6).alias("avg_norm"),
        F.round(F.min(n), 6).alias("min_norm"),
        F.round(F.max(n), 6).alias("max_norm"),
        F.round(F.stddev_samp(n), 6).alias("std_norm"),
    )


def vector_dim_stats(df: DataFrame, vec_col: str = "emb") -> DataFrame:
    """Per-dimension profile ``(pos, mean_val, std_val, min_val, max_val)``
    — embedding-column QC (dead dimensions, scale drift, clipping).

    posexplode + one map-side-combined groupBy over D keys; output is D
    rows regardless of corpus size.  Doubles are rounded (mean 6 dp, std
    5 dp) for cross-engine hash stability.
    """
    return (
        df.select(F.posexplode(F.col(vec_col)).alias("pos", "v"))
        .select(F.col("pos").cast("int").alias("pos"), F.col("v").cast("double").alias("v"))
        .groupBy("pos")
        .agg(
            (F.round(F.avg("v"), 6) + F.lit(0.0)).alias("mean_val"),
            (F.round(F.stddev_samp("v"), 5) + F.lit(0.0)).alias("std_val"),
            (F.round(F.min("v"), 6) + F.lit(0.0)).alias("min_val"),
            (F.round(F.max("v"), 6) + F.lit(0.0)).alias("max_val"),
        )
    )


def quantize_int8(df: DataFrame, id_col: str = "id", vec_col: str = "emb") -> DataFrame:
    """Symmetric per-vector int8 quantization — the storage/bandwidth path a
    100 TB embedding corpus actually ships (4x smaller than float32, GEMM-able
    on int8 hardware).  Returns one row per coordinate:
    ``(id, pos INT, code INT in [-127, 127], scale DOUBLE)`` with
    ``code = floor(x * 127 / max|x| + 0.5)`` (round-half-up, engine-exact on
    IEEE doubles) and ``scale = max|x| / 127`` so ``x ~ code * scale``.

    Pure per-row expressions, no shuffle; exploded layout keeps the oracle
    gate's row canonicalizer array-free.  All-zero vectors quantize to all
    zero codes via the epsilon guard.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    mx = F.greatest(F.array_max(F.transform(v, F.abs)), F.lit(1e-12))
    codes = F.transform(v, lambda x: F.floor(x * F.lit(127.0) / mx + F.lit(0.5)).cast("int"))
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(codes).alias("pos", "code"),
            (F.round(mx / F.lit(127.0), 9) + F.lit(0.0)).alias("scale"),
        )
        .select("id", F.col("pos").cast("int").alias("pos"), "code", "scale")
    )


def embedding_outlier_flags(
    df: DataFrame,
    id_col: str = "id",
    vec_col: str = "emb",
    z: float = 6.0,
    stats: DataFrame | None = None,
) -> DataFrame:
    """Robust per-row embedding outlier gate ``(id, n_outlier_dims,
    outlier)`` — the vector-table analogue of the Gopher text rules: a
    corrupted or off-distribution embedding (bad batch, truncated upload,
    wrong model) shows up as coordinates far outside their dimension's
    robust spread.

    Per dimension the corpus median and MAD are computed EXACTLY
    (``percentile(0.5)``); a coordinate is an outlier when
    ``|x - median| > max(z * 1.4826 * MAD, 1e-6)`` (1.4826 scales MAD to
    sigma under normality); a row is flagged when ANY dimension trips.
    The absolute floor (1e-6, one ulp of the 6-dp stat rounding) keeps
    constant and NEAR-constant dimensions sane: a dim whose true MAD is
    below the rounding grain would otherwise get threshold 0 and flag
    every row carrying float32 noise — one near-dead embedding dim would
    mark essentially the whole corpus.  Genuine deviations in a constant
    dim (> 1e-6) still trip.

    Scale shape: three passes over the corpus — median, MAD (each a
    map-side-combined groupBy(pos) whose output is D rows), then the
    broadcast-joined scoring pass; rows never pairwise-compare.  At
    extreme scale pass ``stats`` (a precomputed/reused ``(pos, med,
    mad)`` table, e.g. built from a keyed-hash sample) to collapse the
    gate to ONE scoring scan — the same precomputed-side-table convention
    as corpus_logfreq_score/bigram_lm_score.  Stats are rounded (6 dp)
    before the comparison so the DuckDB twin's interpolation arithmetic
    agrees bit-for-bit.
    """
    exploded = df.select(
        F.col(id_col).alias("id"), F.posexplode(F.col(vec_col)).alias("pos", "v")
    ).select("id", "pos", F.col("v").cast("double").alias("v"))
    if stats is None:
        med = exploded.groupBy("pos").agg(
            F.round(F.expr("percentile(v, 0.5)"), 6).alias("med")
        )
        mad = (
            exploded.join(F.broadcast(med), "pos")
            .select("pos", F.abs(F.col("v") - F.col("med")).alias("ad"))
            .groupBy("pos")
            .agg(F.round(F.expr("percentile(ad, 0.5)"), 6).alias("mad"))
        )
        stats = med.join(mad, "pos")
    thresh = F.greatest(F.lit(z) * F.lit(1.4826) * F.col("mad"), F.lit(1e-6))
    return (
        exploded.join(F.broadcast(stats), "pos")
        .select(
            "id",
            (F.abs(F.col("v") - F.col("med")) > thresh).cast("int").alias("o"),
        )
        .groupBy("id")
        .agg(F.sum("o").cast("long").alias("n_outlier_dims"))
        .select(
            F.col("id").alias(id_col),
            "n_outlier_dims",
            (F.col("n_outlier_dims") > 0).alias("outlier"),
        )
    )


def binarize_embeddings(
    df: DataFrame, id_col: str = "id", vec_col: str = "emb", word_bits: int = 32
) -> DataFrame:
    """1-bit (sign) quantization packed into integer words — the "binary
    quantization" storage path modern vector stores ship (32x smaller
    than float32; Hamming distance approximates angle for L2-normalized
    embeddings, the SimHash identity-projection case).  Returns one row
    per word: ``(id, word INT, bits LONG)`` where bit ``j`` (MSB-first
    within the word) is 1 iff coordinate ``word*word_bits + j`` is
    strictly positive.

    Pure per-row fold expressions (``aggregate`` over slices), no
    shuffle; exploded layout keeps the oracle gate's row canonicalizer
    array-free, mirroring :func:`quantize_int8`.  ``word_bits <= 62``
    keeps the fold inside a signed 64-bit long.
    """
    if not 1 <= word_bits <= 62:
        raise ValueError(f"word_bits must be in 1..62, got {word_bits}")
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    n_words = (F.size(v) + F.lit(word_bits - 1)) / F.lit(word_bits)
    words = F.transform(
        F.sequence(F.lit(0), F.floor(n_words).cast("int") - 1),
        lambda w: F.aggregate(
            F.slice(v, w * word_bits + 1, word_bits),
            F.lit(0).cast("long"),
            lambda acc, x: acc * 2
            + F.when(x > 0, F.lit(1)).otherwise(F.lit(0)).cast("long"),
        ),
    )
    return df.select(
        F.col(id_col).alias("id"), F.posexplode(words).alias("word", "bits")
    ).select("id", F.col("word").cast("int").alias("word"), "bits")


def pack_sign_words(vec: Column, dim: int, word_bits: int = 32) -> Column:
    """Per-row ``array<long>`` of sign-bit words for a ``dim``-d vector —
    the in-plan (non-exploded) twin of :func:`binarize_embeddings`, used
    by Hamming search where the whole word array stays in one row."""
    if not 1 <= word_bits <= 62:
        raise ValueError(f"word_bits must be in 1..62, got {word_bits}")
    v = F.transform(vec, lambda x: x.cast("double"))
    n_words = -(-dim // word_bits)
    return F.array(*[
        F.aggregate(
            F.slice(v, w * word_bits + 1, word_bits),
            F.lit(0).cast("long"),
            lambda acc, x: acc * 2
            + F.when(x > 0, F.lit(1)).otherwise(F.lit(0)).cast("long"),
        )
        for w in range(n_words)
    ])
