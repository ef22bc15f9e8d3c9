"""Micro-bench: just the dedup_minhash_pairs timing from bench.py (best of N).

Same steady-state protocol as neardup_bench_only.py: JVM + Arrow warm-up,
one warm pass at sf0.01, then N timed passes at sf0.1.  Written for the
round-6 A/B bisect of the round-5 "+48% dedup_minhash_pairs" bench swing
(VERDICT r5 "What's wrong" #1): run this interleaved from HEAD and a
pinned-commit worktree (pre-2c638e / c9ca9d0) to separate ambient load
from a real regression in the a<b filter + _tie_lifetime wiring.

Usage: python tools/minhash_bench_only.py [n_reps]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = "/root/testdata/sf0.1"

    from vectordb_watermark_spark import get_spark
    from vectordb_watermark_spark.operators import dedup as D

    spark = get_spark("minhash-bench", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    spark.range(0, 128, 1, 32).mapInPandas(lambda it: it, schema="id long").count()

    def pairs(sf_path):
        df = spark.read.parquet(f"{sf_path}/documents.parquet")
        D.minhash_candidate_pairs(df).count()

    pairs("/root/testdata/sf0.01")  # warm: codegen + Arrow kernel fork
    times = []
    for _ in range(reps):
        t0 = time.time()
        pairs(sf_dir)
        times.append(round(time.time() - t0, 3))
    print({"times": times, "best": min(times)})


if __name__ == "__main__":
    main()
