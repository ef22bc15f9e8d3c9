"""100k-document text-pipeline scale benchmark.

The driver's documents table tops out at 5k rows; this tool synthesizes a
100k-document corpus with realistic duplicate structure (template clusters +
token-level mutations + exact copies) and runs the dedup/text family at that
scale: exact groups, MinHash signatures + LSH candidate pairs, SimHash +
banded near-pairs, text stats, language ID.  Prints one JSON line.  Usage::

    python tools/scale_text.py [--rows 100000] [--fresh] [--pipeline]

``--pipeline`` additionally runs the full curation chain at that scale —
LSH candidates -> exact-Jaccard verify -> connected components ->
quality-aware canonical selection — the end-to-end path the
``corpus_curation``/``curation_keep_best`` oracles pin at small SF.

Round 9: the pipeline stage adds the lane-agreement pre-verify cut
``min_agree = ceil(t * n_hashes)`` — the volume lever that fixes round
8's honest caveat (1.59e9 candidates at 0.57% verify precision on this
zipf corpus).  ``--legacy-bands`` reverts to no agreement cut for A/B
comparison.  The corpus now carries ``tpl`` ground truth (template
family id, -1 for unique docs; the text/id streams are draw-identical
to the round-8 corpus), and the pipeline reports ``planted_recall`` —
the fraction of planted template-family members that land in their
family's largest connected component.

Measured A/B at 20k rows (recorded so the knob choice is evidence, not
taste): legacy 4x4 banding = 713,558 candidates, recall 0.97795;
4x4 + min_agree=8 = 135,524 candidates (5.3x cut), recall 0.97795 —
IDENTICAL, the cut costs zero planted recall because family docs far
exceed the estimated-Jaccard bar.  The volume-weighted
``minhash_band_plan(0.5, fp_weight=0.9)`` geometry (3 bands x 5 rows)
cuts harder (61,929) but costs 6pp of recall (0.91561) — banding
geometry, not the agreement cut, is what recall is bought with, so the
harness keeps the recall-strong 4x4 banding and takes the volume win in
the agreement filter.  The planner remains the right tool when the
TARGET threshold itself moves (e.g. verify at 0.8 wants 2x8 banding).

At >= 1M rows size the single local JVM for the data:
``SPARK_GRAFT_DRIVER_MEM=48g SPARK_GRAFT_SHUFFLE_PARTITIONS=128`` (local
mode puts driver and executors in ONE heap; the 8g default that fits the
test gate OOMs on the 1M shuffle, and more/smaller shuffle partitions cut
per-task memory 4x — on a real cluster these are per-executor settings
and the defaults story differs).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

CORPUS = ".scratch/docs100k.parquet"

#: ~20k-word zipf-ish vocabulary: realistic token-overlap statistics (a
#: 38-word vocabulary makes every random pair of documents genuinely
#: near-duplicate at the Jaccard level — the dedup answer explodes)
VOCAB_SIZE = 20_000


def make_corpus(spark, rows: int, path: str) -> None:
    """Deterministic synthetic corpus: 2% template clusters (exact copies),
    18% near-dups (template + small mutations), 80% unique documents.

    The template count scales with the corpus (``max(200, rows // 500)``)
    so the mean dup-cluster size stays ~100 docs while the cluster COUNT
    grows — the regime real corpora live in (a fixed 200 templates at 1M
    rows would instead benchmark the adversarial giant-cluster case, where
    within-cluster pair counts grow quadratically with corpus size)."""
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
                rng = np.random.default_rng(4242 + p)
                trng = np.random.default_rng(99)  # shared template stream

                def words(r, m):  # zipf-ish draw over the shared vocabulary
                    return [f"w{v}" for v in (r.zipf(1.3, m) % VOCAB_SIZE)]

                n_templates = max(200, rows // 500)
                templates = [" ".join(words(trng, 40)) for _ in range(n_templates)]
                ids, texts, tpls = [], [], []
                for i in range(lo, hi):
                    u = rng.random()
                    if u < 0.02:  # exact copy of a template
                        ti = int(rng.integers(0, len(templates)))
                        t = templates[ti]
                    elif u < 0.20:  # near-dup: template with a few swaps
                        ti = int(rng.integers(0, len(templates)))
                        toks = templates[ti].split()
                        for _ in range(rng.integers(1, 4)):
                            toks[rng.integers(0, len(toks))] = f"w{rng.integers(VOCAB_SIZE)}"
                        t = " ".join(toks)
                    else:  # unique
                        ti = -1
                        t = " ".join(words(rng, int(rng.integers(20, 60))))
                    ids.append(i)
                    texts.append(t)
                    tpls.append(ti)
                yield pd.DataFrame({"doc_id": ids, "text": texts, "tpl": tpls})

    base = spark.range(n_part).select(F.col("id").alias("p")).repartition(n_part, "p")
    base.mapInPandas(gen, schema="doc_id long, text string, tpl long").write.mode(
        "overwrite"
    ).parquet(path)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000)
    ap.add_argument("--fresh", action="store_true")
    ap.add_argument("--pipeline", action="store_true")
    ap.add_argument("--verify-threshold", type=float, default=0.5)
    ap.add_argument(
        "--legacy-bands", action="store_true",
        help="pipeline: fixed 4x4 banding, no lane-agreement cut (the "
        "round-8 configuration, kept for A/B comparison)",
    )
    ap.add_argument(
        "--pipeline-only", action="store_true",
        help="skip the four sweep stages (exact/minhash-count/simhash/"
        "stats) — for pipeline A/B runs where the sweep is unchanged",
    )
    ap.add_argument(
        "--n-hashes", type=int, default=None,
        help="pipeline: signature lanes (default: module N_MINHASH)",
    )
    ap.add_argument(
        "--band-size", type=int, default=None,
        help="pipeline: rows per LSH band (default: module BAND_SIZE; "
        "round-10 recall-first datapoint uses 3 — 5 bands x 3 rows lifts "
        "the band-hit probability at the J=0.5 boundary from 0.228 to "
        "0.487 at the cost of more false-positive candidates)",
    )
    ap.add_argument(
        "--min-agree", default=None,
        help="pipeline: lane-agreement cut — an int pins it, 'banded' "
        "uses minhash_min_agree_banded(t) (conditional-FN-bounded), "
        "default keeps the r9 ceil(t * n_hashes)",
    )
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))

    from pyspark.sql import functions as F

    from vectordb_watermark_spark import get_spark
    from vectordb_watermark_spark.functions import text as T
    from vectordb_watermark_spark.operators import dedup as D

    spark = get_spark("scale-text")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(".scratch", exist_ok=True)
    if args.fresh or not os.path.exists(CORPUS):
        make_corpus(spark, args.rows, CORPUS)

    docs = spark.read.parquet(CORPUS)
    n = docs.count()
    timings: dict[str, float] = {}
    counts: dict[str, int] = {}

    def run(name, fn):
        t0 = time.time()
        counts[name] = fn()
        timings[name] = round(time.time() - t0, 1)
        # nudge the ContextCleaner: shuffle files of no-longer-referenced
        # jobs are deleted on driver GC; at this scale waiting for a natural
        # GC leaves tens of GB of dead spill on the scratch volume
        spark.sparkContext._jvm.System.gc()

    if not args.pipeline_only:
        run("exact_groups", lambda: D.exact_dup_groups(docs).filter(F.col("dup_count") > 1).count())
        run("minhash_pairs", lambda: D.minhash_candidate_pairs(docs).count())
    # max_hamming=3 (the operator default): 12-bit pigeonhole segments.  A
    # budget of 6 means 6-BIT segments (64 buckets) whose candidate volume
    # grows as N^2/64 — at 1M rows that is ~5e10 pairs, the exact meltdown
    # the first 1M attempt died of (see simhash_near_pairs docstring).
    if not args.pipeline_only:
        run("simhash_pairs", lambda: D.simhash_near_pairs(D.simhash(docs), max_hamming=3).count())
        run(
            "text_stats",
            lambda: docs.select(
                T.token_count(F.col("text")).alias("nt"),
                T.quality_score(F.col("text")).alias("q"),
                T.lang_id(F.col("text")).alias("lang"),
            ).count(),
        )

    plan_info: dict = {}
    if args.pipeline:
        t = args.verify_threshold
        geo = {
            "n_hashes": args.n_hashes or D.N_MINHASH,
            "band_size": args.band_size or D.BAND_SIZE,
        }
        if args.legacy_bands:
            min_agree = None
        else:
            # estimated-Jaccard pre-verify cut: keep banded pairs only when
            # agreeing lanes / n_hashes clears the verify threshold.  The
            # 20k A/B (module docstring) measured this at a 5.3x candidate
            # cut with ZERO planted-recall cost; banding geometry stays at
            # the recall-strong module default unless overridden.
            import math

            if args.min_agree == "banded":
                min_agree = D.minhash_min_agree_banded(
                    t, geo["n_hashes"], geo["band_size"]
                )
            elif args.min_agree is not None:
                min_agree = int(args.min_agree)
            else:
                min_agree = math.ceil(t * geo["n_hashes"])
            plan_info = {"min_agree": min_agree, **geo}

        # full curation chain, one stage per timing row so the expensive
        # step is attributable.  Verified pairs / components / canonical
        # winners are materialized counts, not lazy handles.
        def _candidates():
            # stage candidates to parquet so the band-join's shuffle files
            # are released BEFORE the verify join shuffles (one mega-job
            # keeps every upstream shuffle on disk simultaneously — the
            # combination that filled the 94 GB scratch volume at 1M rows)
            D.minhash_candidate_pairs(
                docs, min_agree=min_agree, **geo
            ).write.mode("overwrite").parquet(".scratch/cand_pairs.parquet")
            return spark.read.parquet(".scratch/cand_pairs.parquet").count()

        run("candidates", _candidates)

        def _verified():
            cand = spark.read.parquet(".scratch/cand_pairs.parquet")
            # hashed_tokens: 8 B/token through the pair-verify shuffle (the
            # volume lever documented on jaccard_pairs)
            v = D.jaccard_pairs(
                docs, pairs=cand, threshold=t, hashed_tokens=True
            ).select("a", "b")
            v.write.mode("overwrite").parquet(".scratch/verified_pairs.parquet")
            return spark.read.parquet(".scratch/verified_pairs.parquet").count()

        run("verify_pairs", _verified)
        verified = spark.read.parquet(".scratch/verified_pairs.parquet")

        def _components():
            # reliable checkpoints: at this scale the propagation runs
            # multiple rounds — exercise the restart-safe knob at its
            # intended scale (VERDICT r6 task #4 / r7 task #1)
            labels = D.connected_components(
                verified, checkpoint_dir=".scratch/cc_checkpoints"
            )
            labels.write.mode("overwrite").parquet(".scratch/cc_labels.parquet")
            return spark.read.parquet(".scratch/cc_labels.parquet").count()

        run("components", _components)
        labels = spark.read.parquet(".scratch/cc_labels.parquet")

        run(
            "canonical",
            lambda: D.canonical_by_quality(docs, labels).count(),
        )
        D.release_signature_caches()

        # planted-recall against the tpl ground truth: every planted doc
        # (member of a template family of size >= 2) should land in its
        # family's largest connected component.  Singleton labels default
        # to the doc's own id (components only covers ids that had pairs).
        if "tpl" in docs.columns:
            planted = docs.filter(F.col("tpl") >= 0).select("doc_id", "tpl")
            fam = (
                planted.join(labels, planted["doc_id"] == labels["id"], "left")
                .select("tpl", F.coalesce("comp", F.col("doc_id")).alias("comp"))
            )
            per = fam.groupBy("tpl", "comp").count()
            tot = fam.groupBy("tpl").agg(F.count(F.lit(1)).alias("n_f"))
            mx = per.groupBy("tpl").agg(F.max("count").alias("m_f"))
            row = (
                tot.join(mx, "tpl")
                .filter(F.col("n_f") >= 2)
                .agg(F.sum("m_f").alias("m"), F.sum("n_f").alias("nn"))
                .first()
            )
            counts["planted_docs"] = int(row["nn"] or 0)
            plan_info["planted_recall"] = round(
                float(row["m"] or 0) / max(int(row["nn"] or 0), 1), 6
            )

    out = {
        "metric": "scale_text_seconds",
        "value": round(sum(timings.values()), 1),
        "unit": "sec",
        "rows": n,
        "timings": timings,
        "counts": counts,
    }
    if plan_info:
        out["band_plan"] = plan_info
    print(json.dumps(out))


if __name__ == "__main__":
    main()
