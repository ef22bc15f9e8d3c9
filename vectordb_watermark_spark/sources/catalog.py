"""Catalog / metadata operators (SURVEY.md §2.2 C1-C6).

The reference introspects information_schema / Milvus collection schemas to
find tables, vector columns, and primary keys (database/pgvector/client.py:
50-176, database/milvus/client.py:56-188).  Spark-first: the catalog IS the
Spark catalog — parquet/Delta tables registered as (temp) views, vector
columns detected from the schema type (ARRAY<FLOAT/DOUBLE>), dimension as a
table property when declared (falling back to a one-row probe, S6).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def register_dir(spark: SparkSession, data_dir: str, suffix: str = ".parquet") -> list[str]:
    """Register every parquet table in a directory as a temp view (the
    engine's 'connect to database' — reference C5)."""
    names = []
    for fname in sorted(os.listdir(data_dir)):
        if fname.endswith(suffix):
            name = fname[: -len(suffix)]
            spark.read.parquet(os.path.join(data_dir, fname)).createOrReplaceTempView(name)
            names.append(name)
    return names


def list_tables(spark: SparkSession) -> list[str]:
    """C1: list visible tables/views."""
    return sorted(t.name for t in spark.catalog.listTables())


def _is_vector_type(dt: T.DataType) -> bool:
    return isinstance(dt, T.ArrayType) and isinstance(
        dt.elementType, (T.FloatType, T.DoubleType)
    )


def list_vector_columns(spark: SparkSession, table: str) -> list[str]:
    """C2: columns whose type is ARRAY<FLOAT/DOUBLE> (the engine's 'vector'
    type; reference filters udt_name='vector', client.py:78-107)."""
    df = spark.table(table)
    return [f.name for f in df.schema.fields if _is_vector_type(f.dataType)]


def list_key_candidates(spark: SparkSession, table: str) -> list[str]:
    """C3/C4: primary-key candidates.  Parquet has no PK constraint; the
    engine's convention is integral columns named ``id``/``*_id``/``*key``
    (checked, not trusted: uniqueness probe is :func:`is_unique_key`)."""
    df = spark.table(table)
    out = []
    for f in df.schema.fields:
        if not isinstance(f.dataType, (T.LongType, T.IntegerType)):
            continue
        n = f.name.lower()
        if n == "id" or n.endswith("_id") or n.endswith("key"):
            out.append(f.name)
    return out


def is_unique_key(spark: SparkSession, table: str, col: str) -> bool:
    """Uniqueness probe backing C3 — one distributed aggregate."""
    row = spark.table(table).agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct(F.col(col)).alias("d")
    ).first()
    return row["n"] == row["d"]


def vector_dimension(spark: SparkSession, table: str, vec_col: str) -> int | None:
    """C6/S6 dimension probe: LIMIT-1 sample (reference client.py:144-176)."""
    row = (
        spark.table(table)
        .select(F.size(F.col(vec_col)).alias("d"))
        .where(F.col(vec_col).isNotNull())
        .first()
    )
    return None if row is None else int(row["d"])


def describe_catalog(spark: SparkSession) -> DataFrame:
    """One-stop catalog description:
    ``(table, n_columns, vector_columns, key_candidates)``."""
    rows = []
    for t in list_tables(spark):
        rows.append(
            (
                t,
                len(spark.table(t).columns),
                list_vector_columns(spark, t),
                list_key_candidates(spark, t),
            )
        )
    return spark.createDataFrame(
        rows, "table string, n_columns int, vector_columns array<string>, key_candidates array<string>"
    )
