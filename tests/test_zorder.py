"""Z-order clustered write contracts (sources/io.zorder_value /
write_zordered): Morton interleaving verified bit-by-bit on hand
values, per-file value spans shrink on BOTH columns simultaneously
(the property a single-column sort cannot give), quantile bucketing
keeps skewed data balanced across files, rows survive exactly, and
validation guards."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectordb_watermark_spark.sources.io import write_zordered, zorder_value


def _spans(spark, path):
    d = spark.read.parquet(path).withColumn("f", F.input_file_name())
    agg = d.groupBy("f").agg(
        (F.max("x") - F.min("x")).alias("sx"),
        (F.max("y") - F.min("y")).alias("sy"),
        F.count(F.lit(1)).alias("n"),
    ).collect()
    return (
        float(np.mean([r["sx"] for r in agg])),
        float(np.mean([r["sy"] for r in agg])),
        [int(r["n"]) for r in agg],
    )


def test_morton_interleaving_bit_exact(spark):
    """bits=2, buckets known by construction: z = x0 y0 x1 y1."""
    # 4 quantile buckets per column over uniform ids 0..15
    rows = [(i, float(i), float(15 - i)) for i in range(16)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    # exact=True: the pin here is the Morton bit interleave given KNOWN
    # interpolated quantile buckets; the default bounded-state sketch picks
    # element boundaries (±ε bucket shifts) and is covered by the
    # span-narrowing / balance contracts below
    keyed, key = zorder_value(df, ["x", "y"], bits=2, exact=True)
    got = {r["id"]: r[key] for r in keyed.collect()}

    def morton(bx, by):
        z = 0
        for bit in range(2):
            z |= ((bx >> bit) & 1) << (bit * 2)
            z |= ((by >> bit) & 1) << (bit * 2 + 1)
        return z

    # bucket of value v in 0..15 at 4 buckets = v // 4
    for i in range(16):
        assert got[i] == morton(i // 4, (15 - i) // 4), i


def test_zorder_narrows_both_columns(spark, tmp_path):
    rng = np.random.default_rng(3)
    rows = [
        (int(i), float(x), float(y))
        for i, (x, y) in enumerate(rng.uniform(0, 1000, size=(60_000, 2)))
    ]
    df = spark.createDataFrame(rows, "id long, x double, y double").repartition(8)
    plain, zpath = str(tmp_path / "plain"), str(tmp_path / "z")
    df.write.parquet(plain)
    write_zordered(df, zpath, ["x", "y"], bits=8, n_files=16)
    sx_p, sy_p, _ = _spans(spark, plain)
    sx_z, sy_z, counts = _spans(spark, zpath)
    # plain random layout: every file covers ~the full range
    assert sx_p > 900 and sy_p > 900
    # z-ordered: BOTH axes shrink strongly (single-col sort would leave
    # one axis at ~full range)
    assert sx_z < 0.55 * sx_p and sy_z < 0.55 * sy_p, (sx_z, sy_z)
    # rows preserved
    z = spark.read.parquet(zpath)
    assert z.count() == 60_000
    assert z.select(F.sum("id")).collect()[0][0] == sum(range(60_000))
    assert "__zorder" not in z.columns


def test_zorder_quantile_buckets_balance_skew(spark, tmp_path):
    """Exponentially skewed column: rank bucketing (not uniform width)
    keeps file sizes balanced."""
    rng = np.random.default_rng(9)
    rows = [
        (int(i), float(v), float(u))
        for i, (v, u) in enumerate(
            zip(rng.exponential(5.0, 40_000), rng.uniform(0, 1, 40_000))
        )
    ]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    zpath = str(tmp_path / "zskew")
    write_zordered(df, zpath, ["x", "y"], bits=6, n_files=8)
    _, _, counts = _spans(spark, zpath)
    assert len(counts) == 8
    assert max(counts) < 3 * min(counts), counts


def test_zorder_constant_column_and_validation(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, 1.0, float(i)) for i in range(100)], "id long, x double, y double"
    )
    keyed, key = zorder_value(df, ["x", "y"], bits=4)
    assert keyed.count() == 100  # constant col degrades to bucket 0, no crash
    with pytest.raises(ValueError, match="no columns"):
        zorder_value(df, [])
    with pytest.raises(ValueError, match="bits"):
        zorder_value(df, ["x"], bits=0)
    wide = df.select(
        "id", "x", "y", F.col("x").alias("a"), F.col("y").alias("b")
    )
    with pytest.raises(ValueError, match="63-bit"):
        zorder_value(wide, ["x", "y", "a", "b"], bits=16)
