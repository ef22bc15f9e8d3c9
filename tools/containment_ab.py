"""Recall A/B: banded-MinHash vs rare-shingle candidates on planted
asymmetric excerpt↔host pairs (VERDICT r12 #3 'done' evidence).

Plants N excerpt/host pairs over the sf0.1 documents corpus: host_i is the
source doc's text followed by 2000 filler tokens unique to i (so the pair's
token-set Jaccard is ~0.01 — the partial-copy geometry containment exists
for), excerpt_i is a 20-token slice of the source doc.  Measures, for each
candidate source: planted-pair recall, total candidate volume, and
wall-clock.  Prints one JSON line.

Usage: python tools/containment_ab.py [sf_dir] [n_plants]
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_plants = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    from pyspark.sql import functions as F

    from vectordb_watermark_spark import get_spark
    from vectordb_watermark_spark.functions.text import tokens
    from vectordb_watermark_spark.operators.dedup import (
        minhash_candidate_pairs,
        rare_shingle_candidates,
    )

    spark = get_spark("containment-ab", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n_docs = docs.count()
    step = max(1, n_docs // n_plants)
    src = docs.filter((F.col("doc_id") % step == 0)).limit(n_plants)

    filler = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.lit(2000)),
            lambda i: F.concat(
                F.lit("f"), F.col("doc_id").cast("string"), F.lit("x"),
                i.cast("string"),
            ),
        ),
        " ",
    )
    hosts = src.select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.concat_ws(" ", F.col("text"), filler).alias("text"),
    )
    exc = src.select(
        (F.col("doc_id") + 20_000_000).alias("doc_id"),
        F.concat_ws(" ", F.slice(tokens(F.col("text")), 1, 20)).alias("text"),
    ).filter(F.size(tokens(F.col("text"))) >= 8)  # need >= 1 shingle
    corpus = docs.unionByName(hosts).unionByName(exc).cache()
    corpus.count()

    planted = {
        (int(r[0]) + 10_000_000, int(r[0]) + 20_000_000)
        for r in src.select("doc_id").collect()
    }
    # a planted pair is recallable only if its excerpt survived the
    # >=8-token guard
    alive = {int(r[0]) - 20_000_000 for r in exc.select("doc_id").collect()}
    planted = {(a, b) for a, b in planted if b - 20_000_000 in alive}

    out: dict = {"sf_dir": sf_dir, "n_docs": n_docs, "n_planted": len(planted)}
    for tag, fn in (
        ("band", lambda: minhash_candidate_pairs(corpus)),
        ("rare_shingle", lambda: rare_shingle_candidates(corpus)),
    ):
        t0 = time.time()
        cand = fn().cache()
        total = cand.count()
        secs = round(time.time() - t0, 2)
        lo = F.least("a", "b")
        hi = F.greatest("a", "b")
        hit = (
            cand.select(lo.alias("a"), hi.alias("b"))
            .filter(
                (F.col("a") >= 10_000_000) & (F.col("a") < 20_000_000)
                & (F.col("b") == F.col("a") + 10_000_000)
            )
            .count()
        )
        cand.unpersist()
        out[tag] = {
            "planted_recall": round(hit / max(1, len(planted)), 4),
            "planted_hits": hit,
            "candidates_total": total,
            "seconds": secs,
        }
    corpus.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
