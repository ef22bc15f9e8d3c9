"""Micro-bench: just the wm_roundtrip timing from bench.py (best of N).

Usage: python tools/wm_bench_only.py [n_reps]
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
    from vectordb_watermark_spark.plans.codec import OrthogonalCodec
    from vectordb_watermark_spark.plans.embed import embed_watermark
    from vectordb_watermark_spark.plans.extract import extract_watermark

    spark = get_spark("wm-bench", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    spark.range(0, 128, 1, 32).mapInPandas(lambda it: it, schema="id long").count()

    def wm_roundtrip(sf_path):
        df = (
            spark.read.parquet(f"{sf_path}/embeddings.parquet")
            .select(F.col("vec_id").alias("id"), F.col("embedding").alias("emb"))
        )
        codec = OrthogonalCodec(len(df.select("emb").first()[0]), "bench-key")
        res = embed_watermark(df, "SPARK-GRAFT-2026", "bench-key", rate=0.1,
                              knn_method="broadcast", codec=codec)
        updated = res.updated.cache()
        updated.count()
        out = extract_watermark(updated, "bench-key", res.nonce_hex, rate=0.1,
                                knn_method="broadcast", codec=codec)
        assert out.success, out.error
        updated.unpersist()

    wm_roundtrip("/root/testdata/sf0.001")  # warm
    times = []
    for _ in range(reps):
        t0 = time.time()
        wm_roundtrip(sf_dir)
        times.append(round(time.time() - t0, 3))
    print({"times": times, "best": min(times)})


if __name__ == "__main__":
    main()
