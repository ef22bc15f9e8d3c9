"""Distributed kNN proximity graph + in-degree — the heart of the engine.

The reference builds a single-machine Faiss HNSW index over the whole dataset
(database/pgvector/pg_func.py:103-113, M=16/efConstruction=200/efSearch=50)
and reads per-node in-degree from its level-0 neighbor lists
(pg_func.py:116-124).  That requires the full matrix in RAM — a non-starter
at 100 TB.  This module provides a kNN *edge DataFrame* ``(src, dst, rank,
dist2)`` with three physical strategies:

- ``exact``      — JVM-side broadcast nested-loop join + per-src top-k window.
                   O(N^2) pairs: only for small N / oracle verification, but
                   100% Catalyst (no Python), so it is the correctness anchor.
- ``broadcast``  — numpy blocked exact kNN: the (id, vec) build side is
                   collected + broadcast (like a broadcast hash join build),
                   probe side streams through ``mapInPandas`` computing
                   float64 distances with BLAS.  Exact; scales in the probe
                   dimension to any N_probe, bounded by build side fitting in
                   executor memory (~1M x 384d = 1.5 GB).
- ``lsh``        — random-hyperplane LSH bucketing + exact re-rank: the 100 TB
                   path.  Signatures are JVM expressions (keyed-hash-derived
                   hyperplanes), candidates come from a bucket self-join
                   (AQE handles bucket skew), then exact distance + top-k.
                   Approximate: recall is a tested contract, not 100%.

In-degree of the graph is then a plain ``groupBy(dst).count()`` (SURVEY.md
§2.3 J2) — Spark's map-side partial aggregation makes this one small shuffle.

Degree semantics note (SURVEY.md §7.5): HNSW in-degree depends on Faiss
construction order, so *no* engine can reproduce it exactly; what matters is
that embed and extract use the *same* graph definition, which a deterministic
kNN graph satisfies better than HNSW itself.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vectordb_watermark_spark.functions.vector import sq_euclidean

DEFAULT_K = 16  # mirrors HNSW M=16 (reference configs/config.py:13)


# ---------------------------------------------------------------------------
# exact: pure-Catalyst broadcast nested loop (small N, oracle anchor)
# ---------------------------------------------------------------------------

def knn_edges_exact(
    df: DataFrame, id_col: str = "id", vec_col: str = "emb", k: int = DEFAULT_K
) -> DataFrame:
    """Exact kNN edges via broadcast NLJ + window. O(N^2) — small N only."""
    left = df.select(F.col(id_col).alias("src"), F.col(vec_col).alias("__lv"))
    right = df.select(F.col(id_col).alias("dst"), F.col(vec_col).alias("__rv"))
    pairs = left.join(F.broadcast(right), F.col("src") != F.col("dst"))
    d2 = sq_euclidean(F.col("__lv"), F.col("__rv")).alias("dist2")
    w = Window.partitionBy("src").orderBy(F.col("dist2").asc(), F.col("dst").asc())
    return (
        pairs.select("src", "dst", d2)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# broadcast: numpy blocked exact kNN (build side broadcast, probe distributed)
# ---------------------------------------------------------------------------

def knn_edges_broadcast(
    df: DataFrame,
    id_col: str = "id",
    vec_col: str = "emb",
    k: int = DEFAULT_K,
    batch_rows: int = 4096,
) -> DataFrame:
    """Exact kNN with a broadcast build side and a distributed numpy probe.

    The build side (all ids+vectors) is collected to the driver and broadcast
    once — same memory contract as a broadcast join build side.  Each probe
    partition computes ``|x-y|^2 = |x|^2 + |y|^2 - 2 x.y`` in float64 via one
    GEMM per batch; ranks are tie-broken by (dist2, dst) deterministically.
    """
    pdf = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).toPandas()
    build_ids = pdf["id"].to_numpy(dtype=np.int64)
    build_mat = np.stack(pdf["v"].map(lambda a: np.asarray(a, dtype=np.float64)))
    sc = df.sparkSession.sparkContext
    b_ids = sc.broadcast(build_ids)
    b_mat = sc.broadcast(build_mat)
    b_norms = sc.broadcast((build_mat * build_mat).sum(axis=1))

    out_schema = "src long, dst long, dist2 double, rank int"

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_all, mat, norms = b_ids.value, b_mat.value, b_norms.value
        for pdf_in in batches:
            for start in range(0, len(pdf_in), batch_rows):
                chunk = pdf_in.iloc[start : start + batch_rows]
                X = np.stack(chunk["v"].map(lambda a: np.asarray(a, dtype=np.float64)))
                xn = (X * X).sum(axis=1)
                d2 = xn[:, None] + norms[None, :] - 2.0 * (X @ mat.T)
                np.maximum(d2, 0.0, out=d2)
                src_ids = chunk["id"].to_numpy(dtype=np.int64)
                self_mask = src_ids[:, None] == ids_all[None, :]
                d2[self_mask] = np.inf
                kk = min(k, d2.shape[1] - 1)
                # argpartition then deterministic (dist2, dst) ordering
                part = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
                rows = []
                for i in range(len(src_ids)):
                    cand = part[i]
                    order = np.lexsort((ids_all[cand], d2[i, cand]))
                    sel = cand[order]
                    rows.append(
                        pd.DataFrame(
                            {
                                "src": src_ids[i],
                                "dst": ids_all[sel],
                                "dist2": d2[i, sel],
                                "rank": np.arange(1, len(sel) + 1, dtype=np.int32),
                            }
                        )
                    )
                if rows:
                    yield pd.concat(rows, ignore_index=True)

    probe_df = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    return probe_df.mapInPandas(probe, schema=out_schema)


# ---------------------------------------------------------------------------
# lsh: random-hyperplane bucketing + exact re-rank (the scale path)
# ---------------------------------------------------------------------------

def _hyperplanes(key: str, dim: int, n_tables: int, n_bits: int) -> np.ndarray:
    """Deterministic Gaussian hyperplanes keyed by (key, dim) — every executor
    and every run derives the same planes; no RNG state is shipped."""
    seed = int(hashlib.sha256(f"{key}|lsh|{dim}|{n_tables}|{n_bits}".encode()).hexdigest()[:8], 16)
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_bits, dim))


def lsh_signatures(
    df: DataFrame,
    key: str,
    dim: int,
    id_col: str = "id",
    vec_col: str = "emb",
    n_tables: int = 8,
    n_bits: int = 12,
) -> DataFrame:
    """Add ``(table, bucket)`` per row, exploded to one row per table.

    Signature bits are sign(v . plane) computed as JVM expressions (plane is a
    literal array -> whole-stage codegen, no Python).  2^n_bits buckets per
    table bound the expected bucket size; AQE's skew-join split handles hot
    buckets.
    """
    planes = _hyperplanes(key, dim, n_tables, n_bits)
    v = F.col(vec_col)
    table_sigs = []
    for t in range(n_tables):
        bits = []
        for j in range(n_bits):
            plane = F.array(*[F.lit(float(x)) for x in planes[t, j]])
            d = F.aggregate(
                F.zip_with(v, plane, lambda x, p: x.cast("double") * p),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bits.append(F.when(d > 0, F.lit(1 << j)).otherwise(F.lit(0)))
        sig = bits[0]
        for b in bits[1:]:
            sig = sig + b
        table_sigs.append(F.struct(F.lit(t).alias("table"), sig.alias("bucket")))
    return df.select(
        F.col(id_col).alias("id"), v.alias("v"), F.explode(F.array(*table_sigs)).alias("tb")
    ).select("id", "v", F.col("tb.table").alias("table"), F.col("tb.bucket").alias("bucket"))


def knn_edges_lsh(
    df: DataFrame,
    id_col: str = "id",
    vec_col: str = "emb",
    k: int = DEFAULT_K,
    key: str = "lsh",
    n_tables: int = 8,
    n_bits: int = 12,
    dim: int | None = None,
) -> DataFrame:
    """Approximate kNN: LSH bucket self-join -> exact re-rank -> top-k.

    One shuffle on (table, bucket); candidate pairs deduped on (src, dst)
    before the (exact, JVM-side) distance re-rank.  Recall grows with
    n_tables; cost with bucket collision rate (tune n_bits so that
    N / 2^n_bits ~ desired candidate count per row).
    """
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    sigs = lsh_signatures(df, key, dim, id_col, vec_col, n_tables, n_bits)
    a = sigs.select("table", "bucket", F.col("id").alias("src"), F.col("v").alias("__lv"))
    b = sigs.select("table", "bucket", F.col("id").alias("dst"), F.col("v").alias("__rv"))
    cand = (
        a.join(b, ["table", "bucket"])
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst", "__lv", "__rv")
        .dropDuplicates(["src", "dst"])
    )
    d2 = sq_euclidean(F.col("__lv"), F.col("__rv")).alias("dist2")
    w = Window.partitionBy("src").orderBy(F.col("dist2").asc(), F.col("dst").asc())
    return (
        cand.select("src", "dst", d2)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# dispatcher + degrees
# ---------------------------------------------------------------------------

def knn_edges(
    df: DataFrame,
    id_col: str = "id",
    vec_col: str = "emb",
    k: int = DEFAULT_K,
    method: str = "auto",
    **kwargs,
) -> DataFrame:
    """kNN edge DataFrame ``(src, dst, dist2, rank)``; see module docstring."""
    if method == "auto":
        # exact JVM NLJ below ~2k rows; broadcast-numpy to ~1M; LSH beyond
        n = df.count()
        method = "exact" if n <= 2000 else ("broadcast" if n <= 1_000_000 else "lsh")
    if method == "exact":
        return knn_edges_exact(df, id_col, vec_col, k)
    if method == "broadcast":
        return knn_edges_broadcast(df, id_col, vec_col, k, **kwargs)
    if method == "lsh":
        return knn_edges_lsh(df, id_col, vec_col, k, **kwargs)
    raise ValueError(f"unknown knn method {method!r}")


def in_degrees(df: DataFrame, edges: DataFrame, id_col: str = "id") -> DataFrame:
    """Per-id in-degree of the kNN graph: ``(id, degree)`` with 0 for sinks.

    groupBy(dst).count() + left join back to the id universe (SURVEY.md §2.3
    J2 — replaces the reference's np.bincount over HNSW neighbor slots,
    pg_func.py:116-124).
    """
    deg = edges.groupBy(F.col("dst").alias(id_col)).agg(F.count(F.lit(1)).alias("degree"))
    return (
        df.select(F.col(id_col))
        .join(deg, id_col, "left")
        .select(F.col(id_col), F.coalesce(F.col("degree"), F.lit(0)).cast("long").alias("degree"))
    )
