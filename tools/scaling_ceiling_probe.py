"""Measure this box's 8-vs-32-core scaling CEILING with a pure
embarrassingly-parallel codegen loop (no shuffle, no Python, no I/O):
``range(3e9) -> sum(xxhash64(id) % 1000)`` over 2x-cores partitions.

Any bench row's core-scaling ratio should be read against this number,
not against an idealized cores-ratio: on a shared host the 32-vCPU arm
gets fewer host cycles per vCPU (r15 measured best-of-3 0.85-1.10 s at
local[32] vs 1.92-2.12 s at local[8] -> ceiling ~2.0-2.3, where perfect
scaling would read 4.0).

Usage: python tools/scaling_ceiling_probe.py [cpus]  (run once per arm,
interleaved, on an otherwise idle box)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    cpus = sys.argv[1] if len(sys.argv) > 1 else "32"

    from pyspark.sql import functions as F

    from vectordb_watermark_spark import get_spark

    spark = get_spark("ceiling", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    def busy(n: int) -> None:
        # % 1000 keeps the 3e9-term sum inside a long under ANSI mode
        spark.range(0, n, 1, int(cpus) * 2).select(
            F.sum(F.xxhash64("id") % F.lit(1000))
        ).collect()

    busy(10_000_000)  # codegen warm-up
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        busy(3_000_000_000)
        best = min(best, time.time() - t0)
    print(f"ceiling probe: cpus={cpus} best {best:.2f}s")


if __name__ == "__main__":
    main()
