"""Delete-at-scale probe over an existing streaming-PQ scale index.

Runs AFTER tools/scale_pq_stream.py (reuses its ``.scratch`` index +
archive): tombstone 5% of ids, measure the delete cost, the query-time
masking overhead (10-query ADC batch before vs after), the dead_fraction
reading, and the compaction FOLD (rows dropped, tombstones cleared).
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

SCRATCH = ".scratch/pq_stream_scale"


def main() -> int:
    from pyspark.sql import functions as F

    from vectordb_watermark_spark import get_spark
    from vectordb_watermark_spark.functions.hashing import keyed_uniform
    from vectordb_watermark_spark.operators.pq import (
        ivf_pq_compact_index,
        ivf_pq_index_drift,
        ivf_pq_query_index_batch,
    )
    from vectordb_watermark_spark.operators.similarity import (
        _resolve_index_root,
        ivf_delete_ids,
    )

    spark = get_spark(
        "pq-delete-probe",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
    )
    spark.sparkContext.setLogLevel("ERROR")

    idx = f"{SCRATCH}/idx"
    arc = f"{SCRATCH}/raw"
    archive = spark.read.parquet(arc)
    n = archive.count()

    qrows = archive.filter("id < 10").collect()
    qblock = spark.createDataFrame(
        [(int(r["id"]), [float(x) for x in r["v"]]) for r in qrows],
        "qid long, qvec array<double>",
    )

    def q_time():
        t0 = time.time()
        ivf_pq_query_index_batch(spark, idx, qblock, k=10, n_probe=4).collect()
        return round(time.time() - t0, 2)

    q_time()  # warm
    t_q_before = q_time()

    victims = archive.filter(keyed_uniform("probe", "d", F.col("id")) < 0.05).select("id")
    t0 = time.time()
    n_del = ivf_delete_ids(spark, idx, victims)
    t_delete = round(time.time() - t0, 2)

    t_q_after = q_time()
    d = ivf_pq_index_drift(spark, idx)

    tagged = spark.read.parquet(arc)  # partition col 'batch' from dir layout
    t0 = time.time()
    ivf_pq_compact_index(tagged, idx, id_col="id", vec_col="v", batch_col="batch")
    t_fold = round(time.time() - t0, 1)
    root = _resolve_index_root(spark, idx)
    rows_after = spark.read.parquet(f"{root}/codes").count()
    d2 = ivf_pq_index_drift(spark, idx)
    t_q_folded = q_time()

    print(json.dumps({
        "metric": "pq_delete_probe",
        "rows": int(n),
        "deleted": int(n_del),
        "delete_seconds": t_delete,
        "q10_batch_seconds": {
            "before": t_q_before, "masked": t_q_after, "after_fold": t_q_folded,
        },
        "dead_fraction": d["dead_fraction"],
        "fold_seconds": t_fold,
        "rows_after_fold": int(rows_after),
        "post_fold": {"dead_fraction": d2["dead_fraction"], "code_tv": d2["code_tv"]},
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
