"""Micro-bench: just the cosine_neardup timing from bench.py (best of N).

Same steady-state protocol as bench.py / wm_bench_only.py: JVM + Arrow
warm-up, one warm pass at sf0.01, then N timed passes at sf0.1.  Used for
the round-4 "cosine_neardup doubled" A/B bisect (PLANS.md): run this
interleaved from HEAD and a pinned-commit worktree to separate ambient
load from code regressions.

Usage: python tools/neardup_bench_only.py [n_reps]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from vectordb_watermark_spark import get_spark
    from vectordb_watermark_spark.operators import similarity as S

    spark = get_spark("neardup-bench", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    spark.range(0, 128, 1, 32).mapInPandas(lambda it: it, schema="id long").count()

    def neardup(sf_path):
        df = (
            spark.read.parquet(f"{sf_path}/embeddings.parquet")
            .select(F.col("vec_id").alias("id"), F.col("embedding").alias("emb"))
        )
        S.cosine_neardup_pairs(df, threshold=0.35, method="gemm").count()

    neardup("/root/testdata/sf0.01")  # warm: codegen + Arrow kernel fork
    times = []
    for _ in range(reps):
        t0 = time.time()
        neardup(sf_dir)
        times.append(round(time.time() - t0, 3))
    print({"times": times, "best": min(times)})


if __name__ == "__main__":
    main()
