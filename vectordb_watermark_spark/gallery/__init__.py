"""Gate-query gallery: the driver-contract query registry and its DuckDB
oracle twins, split out of __spark_entry__.py (round 13)."""

from vectordb_watermark_spark.gallery.oracles import build_oracles
from vectordb_watermark_spark.gallery.queries import build_queries

__all__ = ["build_queries", "build_oracles"]
