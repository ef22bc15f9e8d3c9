"""Per-stage wall-clock profile of the watermark roundtrip at a given SF.

Usage: python tools/profile_roundtrip.py [sf_dir] [cpus]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"

    from pyspark.sql import functions as F

    from vectordb_watermark_spark import get_spark
    from vectordb_watermark_spark.operators import knn as K
    from vectordb_watermark_spark.operators.selection import select_carriers
    from vectordb_watermark_spark.plans.codec import OrthogonalCodec, with_graph_features
    from vectordb_watermark_spark.plans.embed import embed_watermark
    from vectordb_watermark_spark.plans.extract import extract_watermark

    spark = get_spark("profile", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    spark.range(0, int(cpus) * 4, 1, int(cpus)).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    t_all = time.time()
    marks: list[tuple[str, float]] = []

    def mark(name: str, t0: float) -> None:
        marks.append((name, time.time() - t0))

    df = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select(F.col("vec_id").alias("id"), F.col("embedding").alias("emb"))
    )
    dim = len(df.select("emb").first()[0])
    codec = OrthogonalCodec(dim, "bench-key")

    # ---- embed, stage by stage
    t0 = time.time()
    gdf = with_graph_features(df, codec).cache()
    gdf.count()
    mark("embed.graph_features", t0)

    t0 = time.time()
    edges = K.knn_edges(gdf, "id", "gfeat", k=16, method="broadcast")
    edges = edges.cache()
    edges.count()
    mark("embed.knn_edges", t0)

    t0 = time.time()
    degrees = K.gated_in_degrees(df, edges, "id", k=16).cache()
    n = degrees.count()
    mark("embed.gated_degrees", t0)

    t0 = time.time()
    carriers = select_carriers(degrees, key="bench-key", rate=0.1, total=n).cache()
    carriers.count()
    mark("embed.select_carriers", t0)

    t0 = time.time()
    res = embed_watermark(df, "SPARK-GRAFT-2026", "bench-key", rate=0.1,
                          knn_method="broadcast", codec=codec, degrees=degrees)
    updated = res.updated.cache()
    updated.count()
    mark("embed.encode_merge_cache", t0)

    # ---- extract end-to-end (its own kNN etc.)
    t0 = time.time()
    gdf2 = with_graph_features(updated, codec).cache()
    gdf2.count()
    mark("extract.graph_features", t0)

    t0 = time.time()
    edges2 = K.knn_edges(gdf2, "id", "gfeat", k=16, method="broadcast").cache()
    edges2.count()
    mark("extract.knn_edges", t0)

    t0 = time.time()
    degrees2 = K.gated_in_degrees(updated, edges2, "id", k=16).cache()
    degrees2.count()
    mark("extract.gated_degrees", t0)

    t0 = time.time()
    out = extract_watermark(updated, "bench-key", res.nonce_hex, rate=0.1,
                            knn_method="broadcast", codec=codec, degrees=degrees2)
    assert out.success, out.error
    mark("extract.decode_vote", t0)

    total = time.time() - t_all
    for name, s in marks:
        print(f"{name:28s} {s:7.2f}s")
    print(f"{'TOTAL':28s} {total:7.2f}s")


if __name__ == "__main__":
    main()
