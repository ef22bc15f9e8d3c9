"""Job-level attribution of the bench-style wm_roundtrip.

Runs bench.py's wm_roundtrip body once warmed (sf0.001 warm-up first, then
one timed sf0.1 pass), then prints every Spark job of the timed pass with
submission gap, duration, and description — the AppStatusStore view of where
the wall-clock goes (execution vs inter-job driver time).

Usage: python tools/wm_jobs_profile.py [sf_dir] [cpus]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"

    from pyspark.sql import functions as F

    from vectordb_watermark_spark import get_spark
    from vectordb_watermark_spark.plans.codec import OrthogonalCodec
    from vectordb_watermark_spark.plans.embed import embed_watermark
    from vectordb_watermark_spark.plans.extract import extract_watermark

    spark = get_spark("wm-jobs", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    spark.range(0, int(cpus) * 4, 1, int(cpus)).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    # codecs resolved up front, mirroring bench.py (symmetric across reps)
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
        df = df.cache()
        codec = _codecs[sf_path or sf_dir]
        res = embed_watermark(df, "SPARK-GRAFT-2026", "bench-key", rate=0.1,
                              knn_method="broadcast", codec=codec)
        updated = res.updated.localCheckpoint(eager=True)
        out = extract_watermark(updated, "bench-key", res.nonce_hex, rate=0.1,
                                knn_method="broadcast", codec=codec)
        assert out.success, out.error
        df.unpersist()

    wm_roundtrip("/root/testdata/sf0.001")  # warm
    wm_roundtrip()                           # warm at sf0.1 too (codec probe)

    store = spark.sparkContext._jsc.sc().statusStore()
    first_job_after = max(
        (j.jobId() for j in _scala_list(store.jobsList(None))), default=-1
    )

    t0 = time.time()
    wm_roundtrip()
    wall = time.time() - t0

    jobs = [
        j for j in _scala_list(store.jobsList(None)) if j.jobId() > first_job_after
    ]
    jobs.sort(key=lambda j: j.jobId())
    prev_end = None
    tot_exec = 0.0
    tot_gap = 0.0
    print(f"{'job':>4} {'gap_ms':>7} {'dur_ms':>7}  description")
    for j in jobs:
        sub = j.submissionTime().get().getTime()
        comp = j.completionTime().get().getTime() if j.completionTime().isDefined() else sub
        gap = (sub - prev_end) if prev_end is not None else 0
        prev_end = comp
        dur = comp - sub
        tot_exec += dur
        tot_gap += max(gap, 0)
        desc = j.name()[:90].replace("\n", " ")
        print(f"{j.jobId():>4} {gap:>7} {dur:>7}  {desc}")
    print(f"\njobs={len(jobs)} exec={tot_exec/1000:.2f}s gaps={tot_gap/1000:.2f}s wall={wall:.2f}s")


def _scala_list(sl):
    it = sl.iterator()
    out = []
    while it.hasNext():
        out.append(it.next())
    return out


if __name__ == "__main__":
    main()
