"""Streaming IVF-PQ maintenance scale benchmark (round-11 sink).

Synthesizes a clustered vector corpus, streams it through
``streaming/curation.incremental_pq_index`` as per-file micro-batches,
plants a DRIFTED far-cluster batch late in the stream, and verifies the
sink's whole maintenance loop at scale:

- bootstrap (train coarse + PQ codebooks on batch 0),
- steady-state tagged encode batches,
- the code_tv drift trigger firing a recompaction from the raw archive
  BETWEEN batch writes (through the manifest commit),
- post-maintenance recall: ADC recall@10 and exact-rerank recall@10 vs
  brute-force ground truth over the archive, for drifted AND base
  queries at a tight probe budget.

Prints one JSON line.  Usage::

    python tools/scale_pq_stream.py [--rows 400000] [--dim 64]
        [--batches 8] [--n-centroids 64] [--m 8] [--n-codes 64]
        [--tv-threshold 0.15] [--fresh]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

SCRATCH = ".scratch/pq_stream_scale"


def make_batches(spark, rows: int, dim: int, batches: int, src: str) -> None:
    """Deterministic clustered corpus, one parquet file per micro-batch.
    Batches 0..B-3 draw from 8 natural centers; batch B-2 is the DRIFTED
    far cluster (every coordinate shifted +6 — far outside the trained
    centroids); batch B-1 is a small follow-up whose pre-write drift
    check is what fires the recompaction.

    The first 10 rows of batch 0 and of the drifted batch are PROBES:
    each gets 9 planted near-copies (1e-3 noise, cos ~0.9999) appended to
    its own batch, so exact top-10 for a probe is its 10-group — a
    discriminative recall@10 target (raw same-cluster cosines sit around
    ~0.99 in thousands of near-ties, which no ANN metric can resolve)."""
    import numpy as np

    os.makedirs(src, exist_ok=True)
    per = rows // batches
    centers = np.random.default_rng(5).standard_normal((8, dim)).astype(np.float32)
    for b in range(batches):
        rng = np.random.default_rng(900 + b)
        n = per if b < batches - 1 else max(per // 10, 1000)
        if b == batches - 2:
            v = 6.0 + 0.3 * rng.standard_normal((n, dim)).astype(np.float32)
        else:
            cid = rng.integers(0, 8, n)
            v = centers[cid] + 0.4 * rng.standard_normal((n, dim)).astype(np.float32)
        ids = (b * per + np.arange(n)).astype(np.int64)
        if b in (0, batches - 2):
            copies = np.repeat(v[:10], 9, axis=0) + 1e-3 * rng.standard_normal(
                (90, dim)
            ).astype(np.float32)
            copy_ids = (
                100_000_000 + b * 1_000_000 + np.arange(90)
            ).astype(np.int64)
            v = np.vstack([v, copies])
            ids = np.concatenate([ids, copy_ids])
        import pandas as pd

        pdf = pd.DataFrame({"id": ids, "emb": [r.astype(np.float32).tolist() for r in v]})
        stage = f"{src}__stage_{b}"
        spark.createDataFrame(pdf, "id long, emb array<float>").coalesce(1)\
            .write.mode("overwrite").parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        shutil.copy(part, f"{src}/batch_{b:02d}.parquet")
        shutil.rmtree(stage)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=400_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--n-centroids", type=int, default=64)
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--n-codes", type=int, default=64)
    ap.add_argument("--tv-threshold", type=float, default=0.1)
    ap.add_argument("--fresh", action="store_true")
    args = ap.parse_args()

    from vectordb_watermark_spark import get_spark

    spark = get_spark("pq-stream-scale", master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    spark.sparkContext.setLogLevel("ERROR")

    src = f"{SCRATCH}/src_{args.rows}_{args.batches}"
    if args.fresh:
        shutil.rmtree(src, ignore_errors=True)
    if not os.path.isdir(src):
        t0 = time.time()
        make_batches(spark, args.rows, args.dim, args.batches, src)
        print(f"# corpus built in {time.time() - t0:.1f}s", file=sys.stderr)

    idx = f"{SCRATCH}/idx"
    arc = f"{SCRATCH}/raw"
    ckpt = f"{SCRATCH}/ckpt"
    for p in (idx, arc, ckpt):
        shutil.rmtree(p, ignore_errors=True)

    from vectordb_watermark_spark.operators.pq import (
        ivf_pq_index_drift,
        ivf_pq_query_index_batch,
    )
    from vectordb_watermark_spark.operators.similarity import (
        _current_index_version,
        _resolve_index_root,
        topk_cosine,
    )
    from vectordb_watermark_spark.streaming.curation import incremental_pq_index

    stream = (
        spark.readStream.schema("id long, emb array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    t0 = time.time()
    q = incremental_pq_index(
        stream, idx, arc, ckpt,
        n_centroids=args.n_centroids, m=args.m, n_codes=args.n_codes,
        key="pqscale", compact_code_tv_threshold=args.tv_threshold,
    ).trigger(availableNow=True).start()
    q.awaitTermination(3600)
    t_stream = time.time() - t0
    batch_ms = [
        int(p["durationMs"]["triggerExecution"])
        for p in q.recentProgress
        if p.get("durationMs")
    ]

    root = _resolve_index_root(spark, idx)
    version = _current_index_version(spark, idx)
    codes = spark.read.parquet(f"{root}/codes")
    n_codes_rows = codes.count()
    drift = ivf_pq_index_drift(spark, idx)

    # recall vs brute force over the archive, tight probe budget
    import numpy as np

    archive = spark.read.parquet(arc)
    per = args.rows // args.batches
    drift_lo = (args.batches - 2) * per
    drifted = archive.filter(
        "id >= %d and id < %d" % (drift_lo, drift_lo + 10)
    ).collect()
    basebatch = archive.filter("id < 10").collect()
    t_q = time.time()
    recalls = {}
    for tag, rows in (("drifted", drifted), ("base", basebatch)):
        qblock = spark.createDataFrame(
            [(int(r["id"]), [float(x) for x in r["v"]]) for r in rows],
            "qid long, qvec array<double>",
        )
        adc = ivf_pq_query_index_batch(spark, idx, qblock, k=10, n_probe=4)
        rr = ivf_pq_query_index_batch(
            spark, idx, qblock, k=10, n_probe=4,
            rerank_with=archive, id_col="id", vec_col="v",
        )
        got, got_rr = {}, {}
        for r in adc.collect():
            got.setdefault(int(r["qid"]), set()).add(int(r["id"]))
        for r in rr.collect():
            got_rr.setdefault(int(r["qid"]), set()).add(int(r["id"]))
        hits = hits_rr = tot = 0
        for r in rows:
            exact = {
                int(x["id"])
                for x in topk_cosine(
                    archive, [float(v) for v in r["v"]], 10, "id", "v"
                ).collect()
            }
            hits += len(exact & got.get(int(r["id"]), set()))
            hits_rr += len(exact & got_rr.get(int(r["id"]), set()))
            tot += len(exact)
        recalls[tag] = round(hits / tot, 4)
        recalls[tag + "_rerank"] = round(hits_rr / tot, 4)
    t_recall = time.time() - t_q

    print(json.dumps({
        "metric": "pq_stream_scale",
        "rows": int(n_codes_rows),
        "dim": args.dim,
        "batches": args.batches,
        "geometry": {"n_centroids": args.n_centroids, "m": args.m, "n_codes": args.n_codes},
        "stream_seconds": round(t_stream, 1),
        "batch_ms": batch_ms,
        "recompactions": int(version or 0),
        "post_drift": {"code_tv": drift["code_tv"], "drift_ratio": drift["drift_ratio"]},
        "recall_at10_nprobe4": recalls,
        "recall_eval_seconds": round(t_recall, 1),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
