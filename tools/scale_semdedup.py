"""1M x 64-d semantic-dedup scale benchmark (round-8 operator).

Synthesizes a clustered vector corpus with PLANTED near-duplicates (5%
exact-plus-epsilon copies of earlier rows), runs
``similarity.semantic_dedup`` (SemDeDup shape: k-means-bounded
within-cluster exact cosine), and reports per-stage wall-clock, the kept
count, and planted-duplicate recall (a copy's ``keep`` must be False —
its original has the smaller id).  Prints one JSON line.  Usage::

    python tools/scale_semdedup.py [--rows 1000000] [--dim 64]
        [--clusters 256] [--dup-frac 0.05] [--fresh]

At 1M rows run with ``SPARK_GRAFT_DRIVER_MEM=48g`` (single local JVM —
see tools/scale_text.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

CORPUS = ".scratch/semdedup_vectors.parquet"


def make_corpus(spark, rows: int, dim: int, dup_frac: float, path: str) -> None:
    """Deterministic: 128 natural centers (deliberately != the dedup
    cluster count), unit-norm vectors; the last ``dup_frac`` of each
    partition's rows are copies of that partition's earlier rows plus
    1e-3 noise (cos > 0.999 — well inside eps=0.05)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    n_part = 32

    def gen(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                p = int(row["p"])
                lo = rows * p // n_part
                hi = rows * (p + 1) // n_part
                n = hi - lo
                rng = np.random.default_rng(777 + p)
                centers = np.random.default_rng(5).standard_normal(
                    (128, dim)
                ).astype(np.float32)
                cid = rng.integers(0, 128, n)
                # 0.5 per-coord spread: same-center strangers sit at cos
                # ~0.8 (below the 0.95 dedup threshold); planted copies at
                # 1e-3 noise stay ~1.0 — dedup should find the plants, not
                # collapse natural clusters
                v = centers[cid] + 0.5 * rng.standard_normal((n, dim)).astype(
                    np.float32
                )
                n_dup = int(n * dup_frac)
                if n_dup:
                    src = rng.integers(0, n - n_dup, n_dup)
                    v[n - n_dup :] = v[src] + 1e-3 * rng.standard_normal(
                        (n_dup, dim)
                    ).astype(np.float32)
                v /= np.linalg.norm(v, axis=1, keepdims=True)
                ids = np.arange(lo, hi, dtype=np.int64)
                is_dup = np.zeros(n, dtype=bool)
                if n_dup:
                    is_dup[n - n_dup :] = True
                    # planted copies must carry LARGER ids than their source
                    # (sources are drawn from the partition's head rows)
                yield pd.DataFrame(
                    {"id": ids, "emb": list(map(list, v)), "planted": is_dup}
                )

    base = spark.range(n_part).select(F.col("id").alias("p")).repartition(n_part, "p")
    base.mapInPandas(gen, schema="id long, emb array<float>, planted boolean").write.mode(
        "overwrite"
    ).parquet(path)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument(
        "--clusters", default="auto",
        help="cluster count, or 'auto' (default) for the engine's "
        "n_clusters=None sizing: ceil(N / target_cluster_rows)",
    )
    ap.add_argument("--dup-frac", type=float, default=0.05)
    ap.add_argument("--fresh", action="store_true")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))

    from pyspark.sql import functions as F

    from vectordb_watermark_spark import get_spark
    from vectordb_watermark_spark.operators.similarity import semantic_dedup

    spark = get_spark("scale-semdedup")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(".scratch", exist_ok=True)
    if args.fresh or not os.path.exists(CORPUS):
        make_corpus(spark, args.rows, args.dim, args.dup_frac, CORPUS)

    vecs = spark.read.parquet(CORPUS)
    n = vecs.count()

    n_clusters = None if args.clusters == "auto" else int(args.clusters)
    # auto sizing targets 100k-row clusters by default; at 1M x 64-d that
    # is 10 clusters of ~100k rows — chunked GEMM keeps peak memory at
    # batch_rows x cluster_rows, and the within-cluster quadratic stays
    # bounded.  target_cluster_rows=4000 instead reproduces the round-8
    # explicit-256-cluster shape for comparison.
    t0 = time.time()
    out = semantic_dedup(
        vecs, n_clusters=n_clusters, eps=0.05, max_cluster_rows=500_000,
        target_cluster_rows=4_000,
    ).persist()
    kept = out.filter("keep").count()
    t_dedup = round(time.time() - t0, 1)

    joined = out.join(vecs.select("id", "planted"), "id")
    planted_total = joined.filter("planted").count()
    planted_caught = joined.filter("planted AND NOT keep").count()
    out.unpersist()

    print(json.dumps({
        "metric": "scale_semdedup_seconds",
        "value": t_dedup,
        "unit": "sec",
        "rows": n,
        "dim": args.dim,
        "n_clusters": args.clusters if args.clusters != "auto" else "auto(ceil(N/4000))",
        "kept": kept,
        "removed": n - kept,
        "planted_dups": planted_total,
        "planted_caught": planted_caught,
        "planted_recall": round(planted_caught / max(planted_total, 1), 4),
    }))


if __name__ == "__main__":
    main()
