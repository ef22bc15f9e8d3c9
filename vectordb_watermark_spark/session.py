"""SparkSession factory with scale-oriented defaults.

Testing runs on ``local[N]`` but every default here is chosen to also make
sense on a large cluster: AQE on (runtime shuffle-partition coalescing + skew
join handling), Arrow on (vectorized pandas-UDF transfer), broadcast threshold
sized for dimension tables, UTC session timezone for oracle comparability.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "vectordb_watermark_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 4) for
    local runs; on a real cluster pass ``None`` after setting spark.master
    externally, or pass an explicit master URL.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "4")
        master = f"local[{cpus}]"
    # one BLAS thread per Python worker: task-level parallelism already uses
    # every core, so nested OpenBLAS/MKL threading (default: ncpu threads x
    # ncpu workers) would thrash.  Set before the JVM forks the worker
    # daemons; respected by numpy in every mapInPandas kernel.
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # dimension tables (region/nation/customer at test SFs) broadcast freely
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
