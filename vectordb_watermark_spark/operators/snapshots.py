"""Corpus snapshot diff — the audit primitive for incremental pipelines.

An incremental curation pipeline (streaming/curation.py) keeps mutating a
corpus: new crawls append, dedup removes, quality filters rewrite.  The
operational question "what changed between snapshot A and snapshot B" is
one full-outer hash-compare:

- ``added``    id in new only
- ``removed``  id in old only
- ``changed``  id in both, content hash differs

Scale shape: each side is reduced to ``(id, xxhash64(content))`` map-side
(8 bytes/row regardless of document size — the texts themselves never
shuffle), then ONE full-outer equi-join on id.  At 100 TB both sides
bucket/partition by id, and AQE handles the skewless equi-join; the output
is only the changed rows (typically a tiny fraction), so downstream
consumers (re-embed, re-index, re-dedup) process deltas, not corpora.

DuckDB oracle twin uses the same hash expression (Spark ``xxhash64`` ==
DuckDB has no xxhash64 — the twin therefore compares via md5, so the
operator takes a ``hash_expr`` hook; the driver query pins md5 on both
sides, while the default stays xxhash64 for production cheapness).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hash_inputs(content_cols: list[str]) -> list[Column]:
    """Null-disambiguated hash inputs: each content column is preceded by
    its is-null marker ('true'/'false').  Spark hash functions SKIP null
    inputs (the accumulator is unchanged) and concat_ws drops them, so
    without the marker a value swapped between a NULL and a sibling column
    — old ``(NULL, 'x')`` vs new ``('x', NULL)`` — would hash identically
    and be reported 'unchanged': a silent false negative in an audit
    primitive.  The marker makes the null PATTERN part of the hash while
    leaving values untouched (both engines cast booleans to
    'true'/'false', so the md5/concat_ws oracle twin stays exact)."""
    return [
        x
        for c in content_cols
        for x in (
            F.col(c).isNull().cast("string"),
            F.col(c).cast("string"),
        )
    ]


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_cols: list[str] | None = None,
    hash_fn=None,
) -> DataFrame:
    """``(id, change)`` with ``change in ('added', 'removed', 'changed')``;
    unchanged rows are absent.  ``content_cols`` defaults to every non-id
    column common to both sides (sorted by name for a deterministic hash
    input order); ``hash_fn(cols) -> Column`` defaults to ``xxhash64``.
    """
    if content_cols is None:
        common = (set(old.columns) & set(new.columns)) - {id_col}
        content_cols = sorted(common)
    if not content_cols:
        raise ValueError("snapshot_diff: no content columns to compare")

    def h(df: DataFrame) -> Column:
        cols = _hash_inputs(content_cols)
        return hash_fn(cols) if hash_fn is not None else F.xxhash64(*cols)

    o = old.select(F.col(id_col).alias("id"), h(old).alias("oh"))
    n = new.select(F.col(id_col).alias("id"), h(new).alias("nh"))
    joined = o.join(n, "id", "full_outer")
    return (
        joined.select(
            F.col("id").alias(id_col),
            F.when(F.col("oh").isNull(), F.lit("added"))
            .when(F.col("nh").isNull(), F.lit("removed"))
            .when(F.col("oh") != F.col("nh"), F.lit("changed"))
            .alias("change"),
        )
        .filter(F.col("change").isNotNull())
    )


def snapshot_diff_stats(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_cols: list[str] | None = None,
    hash_fn=None,
) -> DataFrame:
    """One-row ``(n_added, n_removed, n_changed, n_unchanged)`` rollup —
    the monitoring number an incremental pipeline alerts on (e.g. a crawl
    that 'changed' 90% of the corpus is a parser regression, not news)."""
    if content_cols is None:
        common = (set(old.columns) & set(new.columns)) - {id_col}
        content_cols = sorted(common)
    if not content_cols:
        raise ValueError("snapshot_diff_stats: no content columns to compare")

    def h(df: DataFrame) -> Column:
        cols = _hash_inputs(content_cols)
        return hash_fn(cols) if hash_fn is not None else F.xxhash64(*cols)

    o = old.select(F.col(id_col).alias("id"), h(old).alias("oh"))
    n = new.select(F.col(id_col).alias("id"), h(new).alias("nh"))
    joined = o.join(n, "id", "full_outer")
    return joined.agg(
        F.sum(F.when(F.col("oh").isNull(), 1).otherwise(0)).cast("long").alias("n_added"),
        F.sum(F.when(F.col("nh").isNull(), 1).otherwise(0)).cast("long").alias("n_removed"),
        F.sum(
            F.when(
                F.col("oh").isNotNull() & F.col("nh").isNotNull() & (F.col("oh") != F.col("nh")), 1
            ).otherwise(0)
        ).cast("long").alias("n_changed"),
        F.sum(
            F.when(
                F.col("oh").isNotNull() & (F.col("oh") == F.col("nh")), 1
            ).otherwise(0)
        ).cast("long").alias("n_unchanged"),
    )
