"""Micro-bench: just q5_nation_revenue (and optionally dedup_minhash_pairs).

Same steady-state protocol as bench.py / neardup_bench_only.py: JVM +
Arrow warm-up, one warm pass at sf0.01, then N timed passes at sf0.1.
Built for the round-10 "q5 +50%" A/B bisect (VERDICT r9 finding #2): run
this interleaved from HEAD and an r8-pinned worktree to separate ambient
load from code regressions, per the repo's bisect protocol (PLANS.md
r4/r5 precedents).

Usage: python tools/q5_bench_only.py [n_reps] [query_name]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    name = sys.argv[2] if len(sys.argv) > 2 else "q5_nation_revenue"
    sf_dir = "/root/testdata/sf0.1"

    import __spark_entry__ as E
    from vectordb_watermark_spark import get_spark

    spark = get_spark("q5-bench", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    spark.range(0, 128, 1, 32).mapInPandas(lambda it: it, schema="id long").count()

    fn = E.queries()[name]
    fn(spark, "/root/testdata/sf0.01").count()  # warm: codegen + Arrow fork
    times = []
    for _ in range(reps):
        t0 = time.time()
        fn(spark, sf_dir).count()
        times.append(round(time.time() - t0, 3))
    print({"query": name, "times": times, "best": min(times)})


if __name__ == "__main__":
    main()
