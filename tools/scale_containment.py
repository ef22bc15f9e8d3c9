"""Rare-shingle containment scale probe (VERDICT r13 #4).

Scales the asymmetric-containment discovery path — batch
``rare_shingle_candidates`` / ``containment_pairs`` AND the streaming
shingle store (``ingest_shingles_batch`` / ``resolve_containment_store``)
— to 1M documents, and EMPIRICALLY asserts the store's bounded-state
claim: for every hot (boilerplate) shingle, the rows it ever accumulates
are at most ``max_df`` (the pre-crossing cumulative document frequency)
plus the crossing batch's own contribution.  Prints one JSON line.

Corpus: the scale_text.py 1M corpus (2% exact template copies, 18%
near-dup mutations, 80% unique zipf docs) PLUS 200 planted excerpts —
20-token slices of unique host docs, the Jaccard-~0.3 /
containment-~1.0 geometry this operator exists for (at 20-of-~40 tokens
the pair sits far below any banding threshold; CONTAINMENT_AB.json
measured the banded path at 0/100 recall on exactly this shape).
Template families give the probe realistic boilerplate pressure: a
family of ~100 docs shares most of its 8-gram shingles, so those cross
``max_df`` and exercise the hot-suppression lever at volume.

Usage::

    SPARK_GRAFT_DRIVER_MEM=48g SPARK_GRAFT_SHUFFLE_PARTITIONS=128 \
        python tools/scale_containment.py [--rows 1000000] [--batches 8]

(Local mode puts driver and executors in one heap — the 8g test default
is too small for the 1M distinct-(id,g) shuffles; on a real cluster
these are per-executor settings.)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(__file__))

CORPUS = ".scratch/containment_docs.parquet"
TRUTH = ".scratch/containment_truth.parquet"
STORE = ".scratch/containment_store"
N_PLANTED = 200
EXCERPT_LEN = 20


def make_containment_corpus(spark, rows: int, fresh: bool = False) -> None:
    from pyspark.sql import functions as F

    from scale_text import CORPUS as BASE, make_corpus

    if fresh or not os.path.exists(BASE):
        make_corpus(spark, rows, BASE)
    full = spark.read.parquet(BASE)
    base = full.select("doc_id", "text")
    # hosts: unique (non-template) docs with enough tokens that the
    # excerpt is a PROPER subset — deterministic pick, ids spread out.
    # Template members are excluded: their shingles are family-wide
    # (DF >> max_df, hot-suppressed), so an excerpt of one is an EXPECTED
    # miss of the DF cut, not a discovery-path datapoint.
    hosts = (
        full.filter(F.col("tpl") < 0).select("doc_id", "text")
        .filter(F.col("doc_id") % 97 == 7)
        .filter(F.size(F.split(F.col("text"), r"\s+")) >= EXCERPT_LEN + 8)
        .orderBy("doc_id")
        .limit(N_PLANTED)
    )
    excerpts = hosts.select(
        (F.col("doc_id") + rows * 10).alias("doc_id"),
        F.array_join(
            F.slice(F.split(F.col("text"), r"\s+"), 3, EXCERPT_LEN), " "
        ).alias("text"),
    )
    base.unionByName(excerpts).write.mode("overwrite").parquet(CORPUS)
    hosts.select(
        F.col("doc_id").alias("host"),
        (F.col("doc_id") + rows * 10).alias("excerpt"),
    ).write.mode("overwrite").parquet(TRUTH)


def planted_recall(spark, pairs_path: str) -> tuple[float, int]:
    from pyspark.sql import functions as F

    truth = spark.read.parquet(TRUTH)
    found = spark.read.parquet(pairs_path).select(
        F.least("a", "b").alias("host"), F.greatest("a", "b").alias("excerpt")
    )
    hit = truth.join(found, ["host", "excerpt"], "left_semi").count()
    total = truth.count()
    return round(hit / max(total, 1), 6), total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--max-df", type=int, default=5)
    ap.add_argument("--fresh", action="store_true")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))

    from pyspark.sql import functions as F

    from vectordb_watermark_spark import get_spark
    from vectordb_watermark_spark.operators import dedup as D
    from vectordb_watermark_spark.streaming.curation import (
        ingest_shingles_batch,
        resolve_containment_store,
    )

    spark = get_spark("scale-containment")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(".scratch", exist_ok=True)
    if args.fresh or not os.path.exists(CORPUS):
        make_containment_corpus(spark, args.rows, fresh=args.fresh)
    docs = spark.read.parquet(CORPUS)
    n = docs.count()

    timings: dict[str, float] = {}
    counts: dict[str, int] = {}

    def run(name, fn):
        t0 = time.time()
        counts[name] = fn()
        timings[name] = round(time.time() - t0, 1)
        spark.sparkContext._jvm.System.gc()

    # -- batch path ---------------------------------------------------------
    def _candidates():
        D.rare_shingle_candidates(docs, max_df=args.max_df).write.mode(
            "overwrite"
        ).parquet(".scratch/rare_cand.parquet")
        D.release_signature_caches()
        return spark.read.parquet(".scratch/rare_cand.parquet").count()

    run("rare_candidates", _candidates)

    def _batch_pairs():
        D.containment_pairs(
            docs,
            spark.read.parquet(".scratch/rare_cand.parquet"),
            threshold=args.threshold,
        ).write.mode("overwrite").parquet(".scratch/containment_pairs.parquet")
        return spark.read.parquet(".scratch/containment_pairs.parquet").count()

    run("containment_pairs", _batch_pairs)
    batch_recall, n_truth = planted_recall(spark, ".scratch/containment_pairs.parquet")

    # -- streaming path -------------------------------------------------------
    shutil.rmtree(STORE, ignore_errors=True)
    ingest_times = []
    for k in range(args.batches):
        t0 = time.time()
        ingest_shingles_batch(
            docs.filter(F.col("doc_id") % args.batches == k),
            STORE,
            k,
            max_df=args.max_df,
        )
        ingest_times.append(round(time.time() - t0, 1))
    timings["stream_ingest_total"] = round(sum(ingest_times), 1)

    def _resolve():
        resolve_containment_store(
            spark, STORE, docs, threshold=args.threshold
        ).write.mode("overwrite").parquet(".scratch/stream_pairs.parquet")
        return spark.read.parquet(".scratch/stream_pairs.parquet").count()

    run("stream_resolve", _resolve)
    stream_recall, _ = planted_recall(spark, ".scratch/stream_pairs.parquet")

    # -- store state + the bounded-state assertion ----------------------------
    rows_df = spark.read.parquet(f"{STORE}/rows")  # partition col: batch
    hot_df = spark.read.parquet(f"{STORE}/hot").select("g").distinct()
    counts["store_rows"] = rows_df.count()
    counts["hot_shingles"] = hot_df.count()
    # For every hot shingle: total store rows minus its single largest
    # per-batch contribution must be <= max_df (cumulative DF was <= max_df
    # before the crossing batch; the crossing batch contributes the rest;
    # suppression stops accumulation afterwards).
    per_batch = (
        rows_df.join(hot_df, "g", "left_semi")
        .groupBy("g", "batch")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    viol = (
        per_batch.groupBy("g")
        .agg((F.sum("c") - F.max("c")).alias("pre_cross"), F.sum("c").alias("tot"))
        .filter(F.col("pre_cross") > args.max_df)
    )
    n_viol = viol.count()
    worst = (
        per_batch.groupBy("g")
        .agg(F.sum("c").alias("tot"))
        .agg(F.max("tot"))
        .first()[0]
        or 0
    )
    counts["bounded_state_violations"] = n_viol
    counts["max_rows_per_hot_shingle"] = int(worst)
    assert n_viol == 0, (
        f"{n_viol} hot shingles exceed the bounded-state claim "
        f"(rows - crossing batch > max_df={args.max_df})"
    )

    out = {
        "metric": "scale_containment_seconds",
        "value": round(sum(timings.values()), 1),
        "unit": "sec",
        "rows": n,
        "batches": args.batches,
        "max_df": args.max_df,
        "threshold": args.threshold,
        "timings": timings,
        "ingest_seconds_per_batch": ingest_times,
        "counts": counts,
        "planted_pairs": n_truth,
        "planted_recall_batch": batch_recall,
        "planted_recall_stream": stream_recall,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
