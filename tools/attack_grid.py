"""Robustness attack grid — the engine's reproduction of the reference's
published experiment tables (attack/README.md; mirrored in BASELINE.md).

Runs embed once per corpus, then the T1-T4 grid against blind extraction,
and prints a markdown table + one JSON line.  Usage::

    python tools/attack_grid.py [sf_dir] [--rate 0.1] [--quick]

The reference grid ran at 100 231 x 384-d with 10 023 carriers (~626 per
block); the driver corpora are smaller, so --rate defaults higher to land in
a comparable carriers-per-block regime at small N.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--rate", type=float, default=0.3)
    ap.add_argument("--quick", action="store_true", help="3-point grid")
    ap.add_argument("--corpus", default=None,
                    help="(id, emb) parquet overriding sf_dir (e.g. the 100k "
                         "scale corpus from tools/scale_bench.py)")
    ap.add_argument("--baseline", action="store_true",
                    help="run the reference's exact published grid "
                         "(attack/README.md tables mirrored in BASELINE.md)")
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from vectordb_watermark_spark import get_spark
    from vectordb_watermark_spark.operators import attacks as A
    from vectordb_watermark_spark.plans.embed import embed_watermark
    from vectordb_watermark_spark.plans.extract import extract_watermark

    spark = get_spark("attack-grid", master=f"local[{args.cpus}]",
                      shuffle_partitions=2 * args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    if args.corpus:
        df = spark.read.parquet(args.corpus).select("id", "emb").cache()
    else:
        df = (
            spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
            .select(F.col("vec_id").alias("id"), F.col("embedding").alias("emb"))
            .cache()
        )
    n = df.count()
    msg, key = "ABCDEFGHIJKLMNOP", "grid-key"
    # fixed nonce => fixed ciphertext => fixed per-carrier payload bits.
    # Everything downstream of the nonce is bit-deterministic (embed hash
    # verified identical across sessions), but truncation decode margins are
    # knife-edge, so the truncate row's CRC-pass count moves ~±1% with the
    # payload; pinning the nonce makes the whole grid run-reproducible.
    res = embed_watermark(df, msg, key, rate=args.rate, nonce=bytes(12))
    updated = res.updated.cache()
    updated.count()

    def run(attack_name: str, fn):
        t0 = time.time()
        attacked = fn(updated)
        out = extract_watermark(attacked, key, res.nonce_hex, rate=args.rate)
        ok = out.success and out.message == msg
        return {
            "attack": attack_name,
            "recovered": bool(ok),
            "blocks": out.recovered_blocks,
            "valid_decodes": out.valid_decodes,
            "total_decodes": out.total_decodes,
            "sec": round(time.time() - t0, 1),
        }

    grid = [("none", lambda d: d)]
    dim = len(df.first()["emb"])
    if args.baseline:
        # the reference's published experiment points (attack/README.md:37-179;
        # BASELINE.md table) at its 100 231 x 384-d / 10% scale
        gaussian = [(0.01, 0.1), (0.01, 1.0), (0.05, 1.0), (0.1, 1.0),
                    (0.2, 1.0), (0.5, 0.5)]
        subsets = [0.9, 0.5, 0.2]
        means = [0.1, 0.3, 0.5, 1.0]
        truncs = [284] if dim == 384 else [int(dim * 284 / 384)]
    else:
        gaussian = [(0.01, 0.5), (0.03, 0.5), (0.05, 1.0)] if args.quick else [
            (0.01, 0.1), (0.01, 1.0), (0.03, 0.5), (0.05, 0.5), (0.05, 1.0), (0.1, 1.0)
        ]
        subsets = [0.8, 0.5] if args.quick else [0.9, 0.8, 0.5, 0.3]
        means = [0.2] if args.quick else [0.1, 0.3, 0.5]
        truncs = [int(dim * f) for f in ([0.94] if args.quick else [0.97, 0.94])]
    for sigma, ratio in gaussian:
        grid.append((f"gaussian s={sigma} r={ratio}",
                     lambda d, s=sigma, r=ratio: A.gaussian_attack(d, ratio=r, sigma=s)))
    for keep in subsets:
        grid.append((f"subset keep={keep}",
                     lambda d, k=keep: A.subset_attack(d, keep_ratio=k)))
    for ratio in means:
        grid.append((f"mean_replace r={ratio}",
                     lambda d, r=ratio: A.mean_replace_attack(d, ratio=r)))
    for kd in truncs:
        grid.append((f"truncate keep={kd}/{dim}",
                     lambda d, k=kd: A.truncate_pad_attack(d, keep_dims=k, pad="zero")))
    if args.baseline:
        # beyond-reference: chained attacks (the reference publishes only
        # single-attack rows) — an adversary stacking transforms
        kd = truncs[0]
        grid.append((
            "gaussian s=0.05 r=0.5 + subset keep=0.5",
            lambda d: A.subset_attack(
                A.gaussian_attack(d, ratio=0.5, sigma=0.05), keep_ratio=0.5
            ),
        ))
        grid.append((
            f"truncate keep={kd}/{dim} + gaussian s=0.01 r=1.0",
            lambda d, k=kd: A.gaussian_attack(
                A.truncate_pad_attack(d, keep_dims=k, pad="zero"), ratio=1.0, sigma=0.01
            ),
        ))

    rows = [run(name, fn) for name, fn in grid]

    print(f"\n## Attack grid — {n} x {dim}-d, rate={args.rate} "
          f"({res.n_carriers} carriers, ~{res.n_carriers // 16}/block)\n")
    print("| attack | recovered | blocks | decodes |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['attack']} | {'16/16 OK' if r['recovered'] else 'FAILED'} "
              f"| {r['blocks']}/16 | {r['valid_decodes']}/{r['total_decodes']} |")
    print()
    print(json.dumps({"n": n, "dim": dim, "rate": args.rate, "grid": rows}))


if __name__ == "__main__":
    main()
