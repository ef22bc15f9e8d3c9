"""A/B: resolve_transitions cost vs pair-dir count, and the compaction payoff.

Builds a transitions store batch-by-batch (ingest_transitions_batch), times
resolve at 8 / 32 / 128 accumulated dirs, then folds with
compact_transition_pairs and re-times, asserting the resolved matrix is
identical.  r15 measured (local fs, best-of-5): 0.329 s at 8 dirs, 0.310 s
at 32, 0.721 s at 128, 0.203 s folded back to one.
"""
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from vectordb_watermark_spark import get_spark
from vectordb_watermark_spark.streaming.curation import (
    compact_transition_pairs,
    ingest_transitions_batch,
    resolve_transitions,
)

spark = get_spark("resolve-ab", master="local[8]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1000).count()

base = tempfile.mkdtemp(prefix="resolve_ab_")
store = f"{base}/ctr"

ev = (
    spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    .select("event_id", "ts", "user_id", "event_type")
    .limit(512)
    .collect()
)
schema = "event_id long, ts timestamp, user_id long, event_type string"


def timed_resolve(tag, reps=5):
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        resolve_transitions(spark, store).collect()
        best = min(best, time.time() - t0)
    print(f"RES resolve {tag}: best {best:.3f}s", flush=True)
    return best


rows_per_batch = 4
k = 0
for target in (8, 32, 128):
    while k < target:
        batch = ev[(k * rows_per_batch) % 500:(k * rows_per_batch) % 500 + rows_per_batch]
        ingest_transitions_batch(spark.createDataFrame(batch, schema), store, k)
        k += 1
    timed_resolve(f"dirs={target}")

ref = {(r["from_type"], r["to_type"]): (r["n"], r["prob"])
       for r in resolve_transitions(spark, store).collect()}
folded = compact_transition_pairs(spark, store)
print(f"RES folded {folded} dirs", flush=True)
timed_resolve("dirs=1 (compacted)")
post = {(r["from_type"], r["to_type"]): (r["n"], r["prob"])
        for r in resolve_transitions(spark, store).collect()}
print("RES exact after fold:", post == ref, flush=True)

shutil.rmtree(base)
