from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vectordb_watermark_spark import get_spark

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_TINY = os.path.join(TESTDATA, "sf0.001")
SF_SMALL = os.path.join(TESTDATA, "sf0.01")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("vdbwm-tests", master="local[4]", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the sf0.001 tables registered as views (same
    registration scheme as the driver's correctness gate)."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_TINY}/{t}.parquet')"
        )
    yield con
    con.close()


def load(spark, table: str, sf_dir: str = SF_TINY):
    return spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))
