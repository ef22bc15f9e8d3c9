"""Sequence packing: assign documents to fixed token-budget packs for
training-batch construction (no reference analogue — a training-data-pipeline
extension, same family as dedup/quality filtering).

Semantics: *concat-then-chunk*.  Documents are laid out in a deterministic
order (by id within a deterministic hash group) and chunk boundaries fall at
multiples of ``token_budget`` over the running token count; a document is
assigned to the pack containing its FIRST token.  This is the standard
GPT-style packing approximation: a pack's total may exceed the budget by at
most ``max_doc_tokens - 1`` (the straddling document), and never by more.
True greedy packing ("open a new pack when the next document would
overflow") is a sequential recurrence with no prefix-sum form — it cannot be
expressed as a window without a per-group sequential pass; concat-then-chunk
gives the same asymptotic fill at a fraction of the cost and is what
large-scale pipelines actually run.

Scale shape: ONE window (sum over an ordered partition) per hash group.
Groups are deterministic (keyed sha256 of the id, mod n_groups), so parallelism is
``n_groups`` regardless of corpus size, pack ids are stable across runs and
partitionings, and no global sort exists anywhere.  At 100 TB raise
``n_groups`` so each group's doc list fits a task comfortably (the window
itself streams — memory is O(1) beyond the sort spill).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vectordb_watermark_spark.functions.hashing import keyed_hash_hex, word60
from vectordb_watermark_spark.functions.text import token_count

#: pack ids are ``group * _GROUP_STRIDE + local_pack`` — collision-free while
#: a single group holds < 2^40 packs (at budget >= 1 token that is 2^40 docs
#: per group; raise n_groups long before that)
_GROUP_STRIDE = 1 << 40


def pack_sequences(
    df: DataFrame,
    token_budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_groups: int = 32,
    salt_key: str = "pack",
) -> DataFrame:
    """``(id, n_tokens, pack_id)`` — deterministic token-budget packing.

    ``pack_id`` is globally unique and stable: documents are hash-assigned
    to ``n_groups`` independent streams, ordered by id within each, and
    chunked at ``token_budget`` boundaries of the exclusive running token
    count.  Every pack's token total is < ``token_budget + max_doc_tokens``.
    """
    if token_budget <= 0:
        raise ValueError("token_budget must be positive")
    toks = token_count(F.col(text_col))
    # keyed sha256 grouping (functions/hashing): deterministic under any
    # partitioning AND reproducible in the DuckDB oracle
    grp = F.pmod(word60(keyed_hash_hex(salt_key, F.col(id_col))), F.lit(n_groups))
    base = df.select(
        F.col(id_col).alias("id"),
        toks.alias("n_tokens"),
        grp.cast("long").alias("__grp"),
    )
    w = Window.partitionBy("__grp").orderBy("id")
    cum_excl = F.sum("n_tokens").over(w) - F.col("n_tokens")
    local = F.floor(cum_excl / F.lit(token_budget))
    return base.select(
        F.col("id").alias(id_col),
        "n_tokens",
        (F.col("__grp") * F.lit(_GROUP_STRIDE) + local).alias("pack_id"),
    )


def pack_stats(packed: DataFrame, token_budget: int) -> DataFrame:
    """Per-pack fill statistics ``(pack_id, n_docs, total_tokens, fill)`` —
    the packing-efficiency audit (one map-side-combined groupBy)."""
    return (
        packed.groupBy("pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .withColumn(
            "fill", F.round(F.col("total_tokens") / F.lit(float(token_budget)), 6)
        )
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window document chunking for embedding / retrieval pipelines:
    ``(id, chunk_idx, start_token, n_tokens, chunk_text)`` — one row per
    window of ``chunk_tokens`` whitespace tokens, stepping by
    ``chunk_tokens - overlap`` (the standard RAG/HF-embedding split; case
    is PRESERVED, unlike the analysis operators' lowercased token views).

    Boundary semantics (pinned by test + oracle): a document with
    ``n <= chunk_tokens`` tokens yields exactly one chunk; otherwise chunk
    ``i`` starts at ``i * step`` and the count is
    ``ceil((n - chunk_tokens) / step) + 1`` — every token is covered, the
    tail chunk may be short but never empty, and consecutive chunks share
    exactly ``overlap`` tokens (except possibly the tail).  Empty documents
    yield no chunks.

    Pure Catalyst — ``split``/``sequence``/``slice``/``array_join`` in
    whole-stage codegen, per-row work only, NO shuffle: chunking 100 TB is
    a map-only pass that parquet scan parallelism alone distributes.
    """
    if overlap < 0 or overlap >= chunk_tokens:
        raise ValueError("require 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    from vectordb_watermark_spark.functions.text import tokens

    base = df.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("__toks")
    )
    n = F.size(F.col("__toks"))
    n_chunks = F.when(n <= 0, F.lit(0)).when(
        n <= chunk_tokens, F.lit(1)
    ).otherwise(
        F.ceil((n - F.lit(chunk_tokens)).cast("double") / F.lit(step)).cast("int")
        + F.lit(1)
    )
    idx = F.explode(
        F.when(n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
            F.array().cast("array<int>")
        )
    )
    base = base.select("id", "__toks", idx.alias("chunk_idx"))
    start = F.col("chunk_idx") * F.lit(step)
    chunk = F.slice(F.col("__toks"), start + 1, chunk_tokens)
    return base.select(
        F.col("id").alias(id_col),
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        start.cast("int").alias("start_token"),
        F.size(chunk).cast("int").alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )
