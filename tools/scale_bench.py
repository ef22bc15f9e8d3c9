"""100k x 384-d scale benchmark — the reference's published workload size.

The reference's robustness tables (BASELINE.md) were produced at
100 231 vectors x 384-d, 10% embed rate (attack/README.md:14-16).  This tool
reproduces that scale: synthesize (or reuse) a 100k x 384 corpus, run the
full embed -> write -> blind-extract lifecycle, and one attacked extract.
Prints one JSON line so rounds are comparable.  Usage::

    python tools/scale_bench.py [--rows 100000] [--dim 384] [--rate 0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

CORPUS = ".scratch/vec100k.parquet"
WM_OUT = ".scratch/wm100k.parquet"


def make_corpus(spark, rows: int, dim: int, path: str, unit_norm: bool = False) -> None:
    """Deterministic synthetic corpus: clustered vectors with MiniLM-like
    norms (~5.5 +/- 15%).

    The reference's corpus is raw, *unnormalized* sentence-transformer output
    (nq_qa_combined_384d.npy loaded as-is — reference
    database/pgvector/docker/insert.py:37-40); 384-d MiniLM-class embeddings
    carry L2 norms around 4-6.  The attack sigmas in BASELINE.md are absolute,
    so relative noise — and therefore every robustness number — depends on
    these norms: sigma=0.05 is ~1% per-coordinate noise at norm 5.5 but ~100%
    at unit norm.  ``--unit-norm`` keeps the harsher normalized-corpus regime
    for stress testing."""
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
                rng = np.random.default_rng(1234 + p)
                n = hi - lo
                centers = np.random.default_rng(99).standard_normal((64, dim)).astype(np.float32)
                cid = rng.integers(0, 64, n)
                v = centers[cid] + 0.3 * rng.standard_normal((n, dim)).astype(np.float32)
                v /= np.linalg.norm(v, axis=1, keepdims=True)
                if not unit_norm:
                    norms = 5.5 * np.exp(0.15 * rng.standard_normal((n, 1))).astype(np.float32)
                    v *= norms
                yield pd.DataFrame({"id": np.arange(lo, hi, dtype=np.int64), "emb": list(map(list, v))})

    base = spark.range(n_part).select(F.col("id").alias("p")).repartition(n_part, "p")
    df = base.mapInPandas(gen, schema="id long, emb array<float>")
    df.write.mode("overwrite").parquet(path)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--rate", type=float, default=0.1)
    ap.add_argument("--fresh", action="store_true", help="regenerate the corpus")
    ap.add_argument("--unit-norm", action="store_true",
                    help="L2-normalized corpus (harsher attack regime)")
    ap.add_argument("--knn-method", default="auto",
                    choices=["auto", "exact", "broadcast", "lsh"],
                    help="kNN strategy for both embed and extract")
    ap.add_argument("--skip-attack", action="store_true",
                    help="lifecycle only (skip the attacked extract)")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))

    from vectordb_watermark_spark import get_spark
    from vectordb_watermark_spark.plans.embed import embed_watermark
    from vectordb_watermark_spark.plans.extract import extract_watermark
    from vectordb_watermark_spark.operators.attacks import gaussian_attack

    spark = get_spark("scale-bench")
    os.makedirs(".scratch", exist_ok=True)
    if args.fresh or not os.path.exists(CORPUS):
        make_corpus(spark, args.rows, args.dim, CORPUS, unit_norm=args.unit_norm)

    df = spark.read.parquet(CORPUS)
    msg, key = "ABCDEFGHIJKLMNOP", "scale-bench-key"
    timings: dict[str, float] = {}

    t0 = time.time()
    res = embed_watermark(df, msg, key, rate=args.rate, nonce=b"\x00" * 12,
                          knn_method=args.knn_method)
    res.updated.write.mode("overwrite").parquet(WM_OUT)
    timings["embed_write_s"] = round(time.time() - t0, 1)

    wm = spark.read.parquet(WM_OUT)
    t0 = time.time()
    ext = extract_watermark(wm, key, res.nonce_hex, rate=args.rate,
                            knn_method=args.knn_method)
    timings["extract_s"] = round(time.time() - t0, 1)
    assert ext.success and ext.message == msg, f"clean extract failed: {ext.error}"

    ext_a = None
    if not args.skip_attack:
        t0 = time.time()
        attacked = gaussian_attack(wm, ratio=0.5, sigma=0.05, seed_key="atk")
        ext_a = extract_watermark(attacked, key, res.nonce_hex, rate=args.rate,
                                  knn_method=args.knn_method)
        timings["extract_gauss05_50_s"] = round(time.time() - t0, 1)

    print(json.dumps({
        "metric": "scale_bench_seconds",
        "value": round(sum(timings.values()), 1),
        "unit": "sec",
        "rows": args.rows,
        "dim": args.dim,
        "unit_norm": args.unit_norm,
        "knn_method": args.knn_method,
        "carriers": res.n_carriers,
        "clean_valid": ext.valid_decodes,
        "clean_total": ext.total_decodes,
        "attacked_success": ext_a.success if ext_a is not None else None,
        "attacked_valid": ext_a.valid_decodes if ext_a is not None else None,
        **timings,
    }))


if __name__ == "__main__":
    main()
