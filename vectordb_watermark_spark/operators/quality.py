"""Corpus-statistics quality scoring — the perplexity-proxy filter.

The per-row quality signals (functions/text.py: length, punctuation,
stopwords, repetition) need no corpus context.  This operator adds the one
that does: score each document by the mean log10 corpus frequency of its
tokens — a unigram-LM negative-cross-entropy proxy.  Word-salad and
random-string documents sit far from the corpus distribution and score low;
template boilerplate scores deceptively high on per-row rules but is caught
by the repetition rules — the two families are complementary, which is why
real curation stacks (C4, Gopher, RefinedWeb) run both.

Scale shape (two passes, both shuffle-minimal):

1. vocabulary: explode tokens -> one map-side-combined ``groupBy(token)``
   count.  Zipf's law keeps the vocabulary table tiny relative to the corpus
   (~millions of rows at web scale vs billions of documents).
2. scoring: explode tokens again, equi-join the vocabulary (broadcast while
   it fits, AQE decides), and aggregate the mean log-frequency per document
   — one join + one ``groupBy(doc)``.

No reference analogue (the reference has no text ops); DuckDB oracle twin in
``__spark_entry__.oracle_sql`` hash-checks the whole two-pass computation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectordb_watermark_spark.functions.text import tokens


def token_frequencies(
    df: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """Corpus token-frequency table ``(token, cnt)`` over lowercase
    whitespace tokens — pass 1 of :func:`corpus_logfreq_score`."""
    return (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )


def corpus_logfreq_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab: DataFrame | None = None,
) -> DataFrame:
    """``(id, n_tokens, logfreq_score)``: mean log10 corpus frequency of the
    document's tokens (token multiplicity counts — a doc repeating one
    common token is scored on every occurrence, mirroring cross-entropy).

    ``vocab`` may be a precomputed :func:`token_frequencies` table (e.g.
    built once and reused across scoring runs, or built from a sample at
    extreme scale); by default it is derived from ``df`` itself.  Tokens
    absent from ``vocab`` contribute log10(1) = 0 — the rare-token floor.
    """
    if vocab is None:
        vocab = token_frequencies(df, text_col)
    exploded = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("token"),
    )
    return (
        exploded.join(vocab, "token", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.avg(F.log10(F.coalesce(F.col("cnt"), F.lit(1)).cast("double"))), 6
            ).alias("logfreq_score"),
        )
        .select(F.col("id").alias(id_col), "n_tokens", "logfreq_score")
    )


def source_mix(
    df: DataFrame, source_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Training-mix audit: per-source document count, token mass, and share
    of the corpus — the inputs to any domain-weighting decision (Pile-style
    source weights).  One map-side-combined groupBy; the share join is a
    1-row broadcast."""
    per = df.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens(F.lower(F.col(text_col))))).alias("n_tokens"),
    )
    total = per.agg(F.sum("n_docs").alias("__t"))
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            source_col,
            "n_docs",
            "n_tokens",
            F.round(F.col("n_docs") / F.col("__t"), 6).alias("doc_share"),
        )
    )


def cap_per_source(
    df: DataFrame,
    max_per_source: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    key: str = "srccap",
) -> DataFrame:
    """Domain capping: keep at most ``max_per_source`` documents per source,
    chosen by keyed-hash order — a deterministic per-domain reservoir that
    bounds any one source's share of the training mix.

    One shuffle on ``source``; the rank is a window per source key.  A
    source so hot that its window partition is a straggler is better served
    by rate-based stratified sampling (functions/hashing keyed sampling with
    per-source rates from :func:`source_mix`) — exact caps need per-key
    order, rates do not.
    """
    from vectordb_watermark_spark.functions.hashing import keyed_uniform
    from pyspark.sql import Window

    u = keyed_uniform(key, F.col(id_col))
    w = Window.partitionBy(source_col).orderBy(u.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= max_per_source)
        .drop("__rk")
    )
