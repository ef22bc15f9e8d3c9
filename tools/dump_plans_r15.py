"""Dump .explain("formatted") for the bench queries into plans/r14/.

Usage: python tools/dump_plans.py <suffix> [query ...]
  suffix: 'before' or 'after' (file name suffix)

Covers every bench.py entry: the 12 registry-backed queries plus the
composite pipelines (wm_roundtrip stages, knn_degrees, carrier_selection,
semdedup) whose final DataFrames are rebuilt here exactly as the bench
builds them.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15")


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from vectordb_watermark_spark import get_spark
    from vectordb_watermark_spark.operators import knn as K
    from vectordb_watermark_spark.operators.selection import select_carriers

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("plan-dump", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT_DIR, exist_ok=True)

    qs = E.queries()

    def emb(path=None):
        return (
            spark.read.parquet(f"{path or sf_dir}/embeddings.parquet")
            .select(F.col("vec_id").alias("id"), F.col("embedding").alias("emb"))
        )

    def dump(name: str, df) -> None:
        if only and name not in only:
            return
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(OUT_DIR, f"{name}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        print("dumped", name)

    for name in (
        "q1_pricing_summary", "q3_shipping_priority", "q5_nation_revenue",
        "events_hourly", "events_user_rollup", "dedup_minhash_pairs",
        "dedup_simhash", "text_stats", "lang_id", "ann_topk_cosine",
        "cosine_neardup",
    ):
        dump(name, qs[name](spark, sf_dir))

    # composite pipelines, rebuilt as bench.py builds them
    if not only or {"knn_degrees", "carrier_selection"} & only:
        df = emb()
        edges = K.knn_edges_broadcast(df, k=16)
        degrees = K.in_degrees(df, edges)
        dump("knn_degrees", degrees)
        gated = K.gated_in_degrees(df, K.knn_edges_broadcast(df, k=16))
        n = gated.count()
        dump("carrier_selection", select_carriers(gated, key="bench-key", rate=0.1, total=n))

    if not only or "semdedup" in only:
        from vectordb_watermark_spark.operators.similarity import semantic_dedup

        dump("semdedup", semantic_dedup(emb(), n_clusters=8, eps=0.1).filter("keep"))

    if not only or "wm_roundtrip" in only:
        from vectordb_watermark_spark.plans.codec import OrthogonalCodec
        from vectordb_watermark_spark.plans.embed import embed_watermark
        from vectordb_watermark_spark.plans import extract as X

        df = emb().cache()
        codec = OrthogonalCodec(len(df.select("emb").first()[0]), "bench-key")
        res = embed_watermark(df, "SPARK-GRAFT-2026", "bench-key", rate=0.1,
                              knn_method="broadcast", codec=codec)
        dump("wm_roundtrip_embed_updated", res.updated)
        updated = res.updated.cache()
        updated.count()
        # extract side: carrier re-derivation + decode + tally aggregation
        from vectordb_watermark_spark.plans.codec import with_graph_features

        gdf = with_graph_features(updated, codec).cache()
        edges = K.knn_edges(gdf, "id", "gfeat", k=16, method="broadcast")
        # mirror plans/extract.py: lineage truncated at the degree table
        degrees = K.gated_in_degrees(updated, edges, "id", k=16).localCheckpoint(eager=False)
        carriers = select_carriers(degrees, key="bench-key", rate=0.1)
        decoded = X.decode_carriers(updated, carriers, codec)
        from pyspark.sql import Window
        from vectordb_watermark_spark.functions import bits as B

        agg = (
            decoded.withColumn(
                "crc_ok",
                (F.col("blk") >= 0)
                & (F.col("blk") < B.BLOCK_COUNT)
                & (B.crc4_int_col(F.col("blk")) == F.col("crc")),
            )
            .groupBy("blk", "payload", "crc_ok")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        grp = Window.partitionBy("blk", "crc_ok")
        rk = Window.partitionBy("blk", "crc_ok").orderBy(F.col("cnt").desc(), F.col("payload").asc())
        tallies = (
            agg.withColumn("grp_total", F.sum("cnt").over(grp))
            .withColumn("rk", F.row_number().over(rk))
            .filter(F.col("rk") <= X.VOTE_TOPM)
        )
        dump("wm_roundtrip_extract_tallies", tallies)
        updated.unpersist()
        df.unpersist()

    print("done ->", OUT_DIR)


if __name__ == "__main__":
    main()


def dump_pagerank(suffix: str | None = None, only: set | None = None) -> None:
    """Capture the REAL first-iteration pagerank plan (VERDICT r14 #9: graph
    evidence must be plan dumps, not timing only).  pagerank checkpoints
    each iteration's scores, so the returned frame is a bare LogicalRDD and
    explain() of the result shows nothing; instead a localCheckpoint spy
    captures the pre-checkpoint iteration frame while the gate query
    knn_pagerank runs unmodified."""
    import sys

    suffix = suffix or (sys.argv[1] if len(sys.argv) > 1 else "before")
    only = set(sys.argv[2:]) if only is None else only
    if only and "knn_pagerank" not in only:
        return
    import io
    from contextlib import redirect_stdout

    # the classic subclass overrides localCheckpoint — patch it, not the base
    from pyspark.sql.classic.dataframe import DataFrame as _DF

    import __spark_entry__ as E
    from vectordb_watermark_spark import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("plan-dump", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    captured: list = []
    real_lc = _DF.localCheckpoint

    def spy(self, eager=True):
        captured.append(self)
        return real_lc(self, eager=eager)

    _DF.localCheckpoint = spy
    try:
        E.queries()["knn_pagerank"](spark, sf_dir)
    finally:
        _DF.localCheckpoint = real_lc
    # captured[0] = initial scores, captured[1] = iteration-1 update frame
    buf = io.StringIO()
    with redirect_stdout(buf):
        captured[1].explain("formatted")
    with open(os.path.join(OUT_DIR, f"knn_pagerank_{suffix}.txt"), "w") as f:
        f.write(buf.getvalue())
    print("dumped knn_pagerank (iteration-1 plan)")


if __name__ == "__main__" and "knn_pagerank" in sys.argv[2:]:
    dump_pagerank()
