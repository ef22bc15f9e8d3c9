"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship embed->extract watermark round trip on
sf0.001.  ``queries()`` exposes one callable per implemented operator from
SURVEY.md §2 (plus the training-data-pipeline extensions); ``oracle_sql()``
gives the DuckDB twin for every SQL-expressible one.  Column names and types
are aligned on both sides; doubles are rounded (5-6 dp) so value hashes match
across engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from vectordb_watermark_spark.gallery._common import KEY, _vectors


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full blind-watermark round trip on sf0.001 — embed a message
    into the embeddings table, extract it back, return the per-block vote
    stats plus recovery summary (stable schema, >= 1 row)."""
    from vectordb_watermark_spark.plans.embed import embed_watermark
    from vectordb_watermark_spark.plans.extract import extract_watermark

    df = _vectors(spark, "/root/testdata/sf0.001")
    msg = "SPARK-GRAFT-2026"
    res = embed_watermark(df, msg, KEY, rate=0.2, knn_method="exact")
    out = extract_watermark(res.updated, KEY, res.nonce_hex, rate=0.2, knn_method="exact")
    rows = [
        (
            int(r["blk"]),
            int(r["payload"]),
            int(r["samples"]),
            int(r["winner_count"]),
            bool(out.success),
            out.message if out.success else None,
        )
        for r in out.stats
    ]
    return spark.createDataFrame(
        rows, "blk int, payload int, samples bigint, winner_count bigint, success boolean, message string"
    )


# ---------------------------------------------------------------------------
# queries + oracles — thin registries over vectordb_watermark_spark.gallery
# (round 13, VERDICT r12 #8: the per-query bodies and oracle SQL moved into
# the package; dict contents and ORDER — the driver window — are unchanged,
# byte-identical strings, same hashes)
# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from vectordb_watermark_spark.gallery import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    from vectordb_watermark_spark.gallery import build_oracles

    return build_oracles()
