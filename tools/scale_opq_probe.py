"""Scale probe: plain vs parametric-OPQ vs iterative-OPQ IVF-PQ at 500k x 64-d.

Measures what the parametric-OPQ rotation actually buys at scale on the
kind of data it targets (correlated, variance-concentrated — the shape
of real embedding-model output): build-time overhead of the extra
moment pass + rotation apply, reconstruction MSE, and recall@10 against
exact brute-force cosine for a query panel, at equal code budget.

Usage:  SPARK_GRAFT_DRIVER_MEM=48g python tools/scale_opq_probe.py [n_rows]
Prints one JSON object; fold the result into SCALE_OPQ.json.
"""

from __future__ import annotations

import json
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from vectordb_watermark_spark import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
D, M, N_CODES, N_CENT, N_PROBE, K = 64, 8, 256, 64, 8, 10
N_QUERIES = 20
SCRATCH = "/tmp/opq_scale"


def main() -> None:
    spark = get_spark("opq-scale", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    # anisotropic corpus: x = A z, z iid N(0,1), A fixed mixing with
    # exponential column scales (seeded -> reproducible); generated
    # distributed, one partition per executor thread
    rng = np.random.default_rng(2024)
    A = rng.normal(size=(D, D)) * np.exp(rng.normal(size=(1, D)))
    A_b = spark.sparkContext.broadcast(A)

    def gen(batches):
        import pyarrow as pa

        for rb in batches:
            ids = rb.column(0).to_numpy(zero_copy_only=False)
            g = np.random.default_rng(917 + int(ids[0]))
            X = (g.standard_normal((len(ids), D)) @ A_b.value.T).astype(
                np.float32
            )
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids.tolist(), type=pa.int64()),
                 pa.array(X.tolist(), type=pa.list_(pa.float32()))],
                names=["id", "emb"],
            )

    t0 = time.time()
    shutil.rmtree(SCRATCH, ignore_errors=True)
    (
        spark.range(N).repartition(32).mapInArrow(
            gen, schema="id long, emb array<float>"
        ).write.parquet(f"{SCRATCH}/vectors")
    )
    df = spark.read.parquet(f"{SCRATCH}/vectors")
    t_gen = time.time() - t0

    from vectordb_watermark_spark.operators.pq import (
        _load_codebooks,
        _load_rotation,
        _pq_base,
        ivf_pq_query_index_batch,
        ivf_pq_write_index,
        pq_reconstruction_mse,
    )
    from vectordb_watermark_spark.operators.opq import rotate_vectors
    from vectordb_watermark_spark.operators.similarity import topk_cosine

    # exact ground truth for the query panel
    qrows = df.filter(F.col("id") < N_QUERIES).collect()
    queries = {int(r["id"]): [float(x) for x in r["emb"]] for r in qrows}
    t0 = time.time()
    truth = {}
    for qid, qv in queries.items():
        truth[qid] = {
            int(r["id"])
            for r in topk_cosine(
                _pq_base(df, "id", "emb"), qv, K, "id", "v"
            ).collect()
        }
    t_truth = time.time() - t0

    out = {"n_rows": N, "dim": D, "m": M, "n_codes": N_CODES,
           "n_centroids": N_CENT, "n_probe": N_PROBE, "k": K,
           "n_queries": N_QUERIES, "gen_s": round(t_gen, 1),
           "truth_s": round(t_truth, 1)}

    variants = (
        ("plain", {}),
        ("opq", {"opq": True}),
        # non-parametric Ge-§5 refinement: 3 alternations on a 20% keyed
        # sample (each alternation = bounded codebook train + one d^2
        # cross-moment pass)
        ("opq_iter", {"opq": True, "opq_iters": 3,
                      "opq_sample_fraction": 0.2}),
    )
    for label, kw in variants:
        opq = bool(kw.get("opq"))
        path = f"{SCRATCH}/idx_{label}"
        shutil.rmtree(path, ignore_errors=True)
        t0 = time.time()
        _cents, books = ivf_pq_write_index(
            df, path, n_centroids=N_CENT, m=M, n_codes=N_CODES,
            key=f"sc-{label}", **kw,
        )
        t_build = time.time() - t0
        # reconstruction MSE in the index's own space (rotation is
        # orthogonal: MSE in rotated space == MSE in original space)
        base = _pq_base(df, "id", "emb")
        if opq:
            base = rotate_vectors(base, _load_rotation(spark, path), "v")
        # MSE of pure-PQ on the (possibly rotated) vectors at same geometry
        from vectordb_watermark_spark.operators.pq import pq_train

        t0 = time.time()
        mse = pq_reconstruction_mse(
            base.sample(0.02, seed=7),
            pq_train(base.sample(0.02, seed=7), m=M, n_codes=64,
                     n_iters=3, key=f"mse-{label}", id_col="id", vec_col="v"),
            id_col="id", vec_col="v",
        )
        t_mse = time.time() - t0
        qdf = spark.createDataFrame(
            [(qid, qv) for qid, qv in queries.items()],
            "qid long, qvec array<double>",
        )
        t0 = time.time()
        got = ivf_pq_query_index_batch(
            spark, path, qdf, k=K, n_probe=N_PROBE
        ).collect()
        t_query = time.time() - t0
        by_q: dict[int, set] = {}
        for r in got:
            by_q.setdefault(int(r["qid"]), set()).add(int(r["id"]))
        recall = np.mean([
            len(by_q.get(qid, set()) & truth[qid]) / K for qid in truth
        ])
        out[label] = {
            "build_s": round(t_build, 1),
            "recall_at_10": round(float(recall), 4),
            "pq_mse_sample": round(float(mse), 4),
            "mse_probe_s": round(t_mse, 1),
            "batch_query_s": round(t_query, 1),
        }
        print(json.dumps({label: out[label]}), flush=True)

    print(json.dumps(out))
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
