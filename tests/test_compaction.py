"""compact_parquet contracts (sources/io.py): fewer files with content
preserved exactly, range-clustered output under sort_cols (disjoint
per-file key ranges), staged-swap safety, and input validation."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from vectordb_watermark_spark.sources.io import compact_parquet


@pytest.fixture()
def fragmented(spark, tmp_path):
    path = str(tmp_path / "tbl")
    spark.range(20000).select(
        "id", (F.col("id") % 97).alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    ).repartition(40).write.parquet(path)
    return path


def _files(path):
    return [
        f for f in glob.glob(os.path.join(path, "**", "*"), recursive=True)
        if os.path.isfile(f) and not os.path.basename(f).startswith(("_", "."))
    ]


def test_compact_reduces_files_preserves_content(spark, fragmented):
    before = spark.read.parquet(fragmented).orderBy("id").collect()
    n_before = len(_files(fragmented))
    stats = compact_parquet(spark, fragmented, target_mb=128)
    assert stats["files_before"] == n_before == 40
    assert stats["files_after"] < n_before
    assert stats["rows"] == 20000
    after = spark.read.parquet(fragmented).orderBy("id").collect()
    assert after == before
    # no staging/old leftovers next to the table
    parent = os.path.dirname(fragmented)
    assert not [d for d in os.listdir(parent) if d.startswith(".compact")]


def test_compact_sorted_clusters_ranges(spark, fragmented):
    compact_parquet(spark, fragmented, target_mb=1, sort_cols=["id"])
    files = _files(fragmented)
    assert len(files) > 1  # target 1 MB forces a multi-file layout
    ranges = []
    for f in files:
        r = spark.read.parquet(f).agg(
            F.min("id").alias("lo"), F.max("id").alias("hi")
        ).collect()[0]
        ranges.append((r["lo"], r["hi"]))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2  # disjoint id ranges -> min/max skipping works
    total = spark.read.parquet(fragmented).count()
    assert total == 20000


def test_compact_validation(spark, fragmented, tmp_path):
    with pytest.raises(ValueError, match="target_mb"):
        compact_parquet(spark, fragmented, target_mb=0)
    with pytest.raises(ValueError, match="no table"):
        compact_parquet(spark, str(tmp_path / "missing"))
