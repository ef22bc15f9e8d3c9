"""Keyword retrieval (BM25) and hybrid rank fusion (RRF).

A RAG stack retrieves two ways: lexically (exact terms — BM25, the
Lucene/Elasticsearch default) and semantically (embedding ANN — the
engine's `similarity`/`pq` operators).  Production systems fuse the two
lists because each catches what the other misses; reciprocal rank
fusion (Cormack, Clarke, Buettcher 2009) is the standard fusion — it
needs only RANKS, so incomparable score scales (BM25 vs cosine) are a
non-issue.

Spark-first shapes:

- **BM25**: tokenize -> explode filtered to the query terms (a tiny
  broadcast `isin`) -> ONE groupBy for per-(doc, term) tf, ONE bounded
  groupBy for per-term df (output <= |query| rows), corpus scalars
  (N, avgdl) as a broadcast 1-row aggregate.  Everything is
  whole-stage-codegen expressions; cost is one corpus scan however
  large the corpus, and only documents containing at least one query
  term survive the explode-filter (the inverted-index sparsity, gotten
  relationally).
- **RRF**: union the ranked lists, one map-side-combined groupBy sum of
  ``1/(k + rank)``.

Scores are rounded (``round_dp``) so ranks are reproducible across
engines — the oracle twin recomputes BM25 + cosine + RRF declaratively
in DuckDB.

The reference has no keyword or hybrid retrieval (it searches vectors
only); cited pattern: Robertson et al. BM25 as shipped by Lucene
(the `k1`/`b` defaults and the +1-smoothed idf), RRF per Cormack 2009.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectordb_watermark_spark.functions.text import tokens

__all__ = [
    "bm25_append_index",
    "bm25_build_index",
    "bm25_query_index",
    "bm25_query_index_batch",
    "bm25_scores",
    "bm25_topk",
    "reciprocal_rank_fusion",
    "rm3_expansion",
    "mmr_rerank",
]


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_dp: int | None = 6,
) -> DataFrame:
    """Okapi BM25 per document for a bag of query terms -> ``(id,
    score)``; documents containing none of the terms are absent (score
    0 — the inverted-index convention).  Lucene's +1-smoothed idf
    (``ln(1 + (N - df + 0.5)/(df + 0.5))``), so scores are always
    nonnegative even for terms in more than half the corpus."""
    if not query_terms:
        raise ValueError("bm25_scores: empty query_terms")
    terms = sorted(set(query_terms))
    docs = df.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("__ts")
    ).select("id", F.size("__ts").alias("dl"), "__ts")
    # two corpus scans by design (corpus scalars + term hits) — no cache
    # is left behind; callers scoring many queries against one corpus
    # should persist their tokenized docs themselves and pass that in
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    hits = (
        docs.select("id", "dl", F.explode("__ts").alias("t"))
        .filter(F.col("t").isin(terms))
    )
    tf = hits.groupBy("id", "dl", "t").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    idf = dfreq.crossJoin(F.broadcast(stats)).select(
        "t",
        F.log(
            1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("idf"),
        "avgdl",
    )
    contrib = tf.join(F.broadcast(idf), "t").select(
        "id",
        (
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
        ).alias("c"),
    )
    score = F.sum("c")
    if round_dp is not None:
        score = F.round(score, round_dp)
    return contrib.groupBy("id").agg(score.alias("score"))


def _bm25_write_batch(
    docs: DataFrame, path: str, tag: str, n_files: int
) -> None:
    """Write one document batch's postings + sidecar PARTIALS under
    ``batch=<tag>`` subdirectories.  All three pieces are scoped to the
    tag and written with overwrite, so a retried streaming micro-batch
    replaces exactly its own contribution — idempotence WITHOUT any
    cross-batch read-modify-write (the merge happens at query time as
    exact integer sums)."""
    docs = docs.persist()
    try:
        (
            docs.agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("dl").cast("long").alias("sum_dl"),
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{path}/corpus_stats/batch={tag}")
        )
        tf = (
            docs.select("id", "dl", F.explode("__ts").alias("t"))
            .groupBy("t", "id", "dl")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
        (
            tf.repartitionByRange(n_files, "t")
            .sortWithinPartitions("t", "id")
            .write.mode("overwrite")
            .parquet(f"{path}/postings/batch={tag}")
        )
        spark = docs.sparkSession
        (
            spark.read.parquet(f"{path}/postings/batch={tag}")
            .groupBy("t")
            .agg(F.count(F.lit(1)).alias("df"))
            .repartitionByRange(max(1, n_files // 4), "t")
            .sortWithinPartitions("t")
            .write.mode("overwrite")
            .parquet(f"{path}/term_stats/batch={tag}")
        )
    finally:
        docs.unpersist()


def _bm25_docs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("__ts")
    ).select("id", F.size("__ts").alias("dl"), "__ts")


def bm25_build_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Build a persisted BM25 postings index — the production shape for
    the MANY-QUERY workload (:func:`bm25_scores` re-tokenizes the corpus
    per call; this tokenizes ONCE and each query then touches only its
    own terms' postings).

    Layout under ``path`` (every piece partitioned by a ``batch`` tag so
    batch builds, :func:`bm25_append_index` appends and the streaming
    :func:`~vectordb_watermark_spark.streaming.curation.incremental_postings`
    sink share ONE directory contract):

    - ``postings/batch=<tag>/`` — ``(t, id, dl, tf)``, one row per
      (term, document) pair, range-partitioned AND sorted by term:
      every parquet file covers a narrow contiguous term range, so the
      ``t IN (...)`` predicate of a query prunes to the handful of
      files containing its terms via min/max stats (the inverted-index
      seek, gotten from parquet statistics instead of a custom format);
    - ``term_stats/batch=<tag>/`` — ``(t, df)`` document-frequency
      PARTIALS (bounded by the batch's vocabulary);
    - ``corpus_stats/batch=<tag>/`` — one row ``(n_docs, sum_dl)``.

    Sidecars hold exact INTEGER partials, so query-time merging across
    any batch split is associative and bit-identical to a single-shot
    build — appends and streams never drift the scores.  Build cost is
    one corpus scan + one shuffle of the exploded tokens; at 100 TB the
    postings table is O(total distinct (term, doc) pairs) and the range
    partitioning keeps per-query IO proportional to the queried terms'
    document frequency, never the corpus.
    """
    if mode == "overwrite":
        spark = df.sparkSession
        jp = spark._jvm.org.apache.hadoop.fs.Path
        fs = jp(path).getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(jp(path)):
            fs.delete(jp(path), True)
    elif mode != "error":
        raise ValueError(f"mode must be 'overwrite' or 'error', got {mode!r}")
    _bm25_write_batch(
        _bm25_docs(df, id_col, text_col), path, "full", n_files
    )


def bm25_append_index(
    df: DataFrame,
    path: str,
    tag: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_files: int = 8,
) -> None:
    """Append a document batch to a postings index under its own
    ``batch=<tag>`` subdirectories (tag must be unique per append —
    reusing one overwrites that batch, which is exactly the retry
    semantics the streaming sink wants).  Scores after an append are
    bit-identical to a fresh build over the union: postings rows are the
    same set and the sidecar partials merge as exact integers."""
    if "=" in tag or "/" in tag:
        raise ValueError(f"invalid batch tag {tag!r}")
    _bm25_write_batch(_bm25_docs(df, id_col, text_col), path, tag, n_files)


def bm25_query_index(
    spark,
    path: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    round_dp: int | None = 6,
) -> DataFrame:
    """Score a query against a :func:`bm25_build_index` postings index ->
    ``(id, score)``, arithmetic-identical to :func:`bm25_scores` on the
    same corpus (same expression shapes, so the doubles match bit for
    bit at the shared rounding).

    NO full-corpus scan: the ``t IN (...)`` filter reaches the postings
    parquet scan as a pushed predicate and the build-time term-range
    sort turns it into file-level pruning — per-query IO is the queried
    terms' postings lists plus two tiny sidecar reads.  The sidecars
    hold per-batch integer PARTIALS (build/append/stream all write the
    same layout); merging them here is exact integer addition, so the
    scores are bit-identical however the corpus arrived."""
    if not query_terms:
        raise ValueError("bm25_query_index: empty query_terms")
    terms = sorted(set(query_terms))
    stats = (
        spark.read.parquet(f"{path}/corpus_stats")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            (
                F.sum("sum_dl").cast("double")
                / F.sum("n_docs").cast("double")
            ).alias("avgdl"),
        )
    )
    dfreq = (
        spark.read.parquet(f"{path}/term_stats")
        .filter(F.col("t").isin(terms))
        .groupBy("t")
        .agg(F.sum("df").cast("long").alias("df"))
    )
    idf = dfreq.crossJoin(F.broadcast(stats)).select(
        "t",
        F.log(
            1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("idf"),
        "avgdl",
    )
    post = spark.read.parquet(f"{path}/postings").filter(
        F.col("t").isin(terms)
    )
    contrib = post.join(F.broadcast(idf), "t").select(
        "id",
        (
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
        ).alias("c"),
    )
    score = F.sum("c")
    if round_dp is not None:
        score = F.round(score, round_dp)
    return contrib.groupBy("id").agg(score.alias("score"))


def bm25_query_index_batch(
    spark,
    path: str,
    queries: dict[int, list[str]],
    k1: float = 1.2,
    b: float = 0.75,
    round_dp: int | None = 6,
) -> DataFrame:
    """Score a BLOCK of queries against a postings index in ONE pruned
    scan -> ``(qid, id, score)``, per-query equal to
    :func:`bm25_query_index` (asserted in tests).

    The postings are read once filtered to the UNION of all queries'
    terms (still a pushed ``t IN (...)`` predicate); a tiny broadcast
    ``(qid, t)`` membership table then fans each posting out to exactly
    the queries containing its term.  Per-query cost amortizes the way
    the batched ANN paths do: N queries pay one scan of the union's
    postings, not N scans."""
    if not queries:
        raise ValueError("bm25_query_index_batch: empty query block")
    qt_rows = []
    for qid, terms in queries.items():
        if not terms:
            raise ValueError(
                f"bm25_query_index_batch: empty query_terms for qid {qid!r}"
            )
        for t in sorted(set(terms)):
            qt_rows.append((int(qid), t))
    union_terms = sorted({t for _, t in qt_rows})
    qt = spark.createDataFrame(qt_rows, "qid long, t string")
    stats = (
        spark.read.parquet(f"{path}/corpus_stats")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            (
                F.sum("sum_dl").cast("double")
                / F.sum("n_docs").cast("double")
            ).alias("avgdl"),
        )
    )
    dfreq = (
        spark.read.parquet(f"{path}/term_stats")
        .filter(F.col("t").isin(union_terms))
        .groupBy("t")
        .agg(F.sum("df").cast("long").alias("df"))
    )
    idf = dfreq.crossJoin(F.broadcast(stats)).select(
        "t",
        F.log(
            1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("idf"),
        "avgdl",
    )
    post = spark.read.parquet(f"{path}/postings").filter(
        F.col("t").isin(union_terms)
    )
    contrib = (
        post.join(F.broadcast(idf), "t")
        .join(F.broadcast(qt), "t")
        .select(
            "qid",
            "id",
            (
                F.col("idf")
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("c"),
        )
    )
    score = F.sum("c")
    if round_dp is not None:
        score = F.round(score, round_dp)
    return contrib.groupBy("qid", "id").agg(score.alias("score"))


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    **kwargs,
) -> DataFrame:
    """Top-k BM25 -> ``(id, score, rank)`` (tie-break: smallest id)."""
    from pyspark.sql import Window

    scored = bm25_scores(df, query_terms, **kwargs)
    top = scored.orderBy(F.col("score").desc(), F.col("id").asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col("id").asc())
    return top.select(
        "id", "score", F.row_number().over(w).cast("int").alias("rank")
    )


def reciprocal_rank_fusion(
    rankings: list[DataFrame],
    k: int = 60,
    id_col: str = "id",
    rank_col: str = "rank",
    top: int | None = None,
    round_dp: int | None = 9,
) -> DataFrame:
    """Fuse ranked lists by RRF: ``score(d) = sum over lists of
    1/(k + rank_d)`` (absent-from-list contributes nothing) ->
    ``(id, rrf, rank)`` ordered by fused score (tie-break: smallest
    id).  ``k=60`` is the original paper's constant.  One union + one
    map-side-combined groupBy — no joins, no per-list shuffles."""
    if not rankings:
        raise ValueError("reciprocal_rank_fusion: no rankings")
    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    parts = [
        r.select(
            F.col(id_col).alias("id"),
            (1.0 / (F.lit(float(k)) + F.col(rank_col).cast("double"))).alias(
                "part"
            ),
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    s = F.sum("part")
    if round_dp is not None:
        s = F.round(s, round_dp)
    fused = u.groupBy("id").agg(s.alias("rrf"))
    from pyspark.sql import Window

    w = Window.orderBy(F.col("rrf").desc(), F.col("id").asc())
    out = fused.select(
        "id", "rrf", F.row_number().over(w).cast("int").alias("rank")
    )
    if top is not None:
        out = out.filter(F.col("rank") <= top)
    return out


def rm3_expansion(
    df: DataFrame,
    query_terms: list[str],
    k_docs: int = 10,
    n_terms: int = 10,
    orig_weight: float = 0.5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """RM3 pseudo-relevance-feedback query expansion (Lavrenko &
    Croft 2001 relevance model, interpolated per Abdul-Jaleel 2004)
    -> ``(term, weight, is_original)`` — the expanded query, ready to
    feed back into :func:`bm25_scores` / the postings index.

    Practical RM3 as run in Anserini/Galago: BM25-score the original
    terms, keep the top ``k_docs`` feedback documents (tie-broken by
    id: BM25 scores are 6-dp rounded so ties are real), weight each by
    its normalized score, pool term probabilities ``P(t|d) = tf/dl``
    weighted by those doc weights, keep the ``n_terms`` heaviest
    expansion terms, and interpolate with the uniform original-query
    model at ``orig_weight``.

    Everything is relational: the feedback set is a TakeOrdered of
    ``k_docs`` rows (broadcast from there on), the pooled vocabulary is
    bounded by the feedback docs' tokens, and the final top-``n_terms``
    is a TakeOrdered over that small pool — no global sorts over the
    corpus.  At 100 TB the only corpus-wide work is the BM25 pass
    itself (or none, with the postings index).  Weights are 9-dp
    rounded ONCE, and ranking uses the rounded value, so tie-breaks
    (weight DESC, term ASC) bind identically cross-engine.
    """
    if k_docs < 1 or n_terms < 1:
        raise ValueError("k_docs and n_terms must be >= 1")
    if not 0.0 <= orig_weight <= 1.0:
        raise ValueError(f"orig_weight must be in [0, 1], got {orig_weight}")
    terms = sorted(set(query_terms))

    scores = bm25_scores(
        df, terms, k1=k1, b=b, id_col=id_col, text_col=text_col, round_dp=6
    )
    fb = scores.orderBy(F.col("score").desc(), F.col("id").asc()).limit(k_docs)
    fb_tot = fb.agg(F.sum("score").alias("s_tot"))
    fb_w = fb.crossJoin(F.broadcast(fb_tot)).select(
        "id", (F.col("score") / F.col("s_tot")).alias("w_d")
    )

    toks = df.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("__ts")
    ).join(F.broadcast(fb_w), "id").select(
        "id", "w_d", F.size("__ts").alias("dl"), F.explode("__ts").alias("t")
    )
    rm = (
        toks.groupBy("t", "id", "w_d", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
        .groupBy("t")
        .agg(F.sum(F.col("tf") / F.col("dl") * F.col("w_d")).alias("rm"))
    )
    rm_tot = rm.agg(F.sum("rm").alias("rm_tot"))
    rm_n = rm.crossJoin(F.broadcast(rm_tot)).select(
        "t", (F.col("rm") / F.col("rm_tot")).alias("rm_n")
    )
    q_model = 1.0 / len(terms)
    weighted = rm_n.withColumn(
        "weight",
        F.round(
            F.lit(orig_weight)
            * F.when(F.col("t").isin(terms), F.lit(q_model)).otherwise(F.lit(0.0))
            + F.lit(1.0 - orig_weight) * F.col("rm_n"),
            9,
        ),
    )
    return (
        weighted.orderBy(F.col("weight").desc(), F.col("t").asc())
        .limit(n_terms)
        .select(
            F.col("t").alias("term"),
            "weight",
            F.col("t").isin(terms).alias("is_original"),
        )
    )


def mmr_rerank(
    candidates: DataFrame,
    k: int = 10,
    lam: float = 0.7,
    qid_col: str = "qid",
    id_col: str = "doc_id",
    rel_col: str = "rel",
    vec_col: str = "emb",
) -> DataFrame:
    """Maximal-marginal-relevance diversification (Carbonell &
    Goldstein 1998) -> ``(qid, doc_id, mmr_rank, mmr_score)``.

    Greedy per query: pick the candidate maximizing
    ``lam * rel - (1 - lam) * max_cosine(candidate, already_picked)``
    (first pick is pure relevance), ``k`` times.  Ties break on the
    smaller doc id — fully deterministic.

    Scale shape: the greedy loop is inherently sequential PER QUERY but
    embarrassingly parallel ACROSS queries, and its input is the
    (bounded) candidate set a first-stage retriever already produced —
    so this is one ``applyInPandas`` over qid groups, with an N×N
    cosine matrix per group where N is the per-query candidate count
    (hundreds, by construction).  Nothing here ever touches the corpus.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    import numpy as np
    import pandas as pd

    qt = candidates.schema[qid_col].dataType.simpleString()
    it = candidates.schema[id_col].dataType.simpleString()
    schema = (
        f"{qid_col} {qt}, {id_col} {it}, mmr_rank int, mmr_score double"
    )

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        ids = pdf[id_col].to_numpy()
        rel = pdf[rel_col].to_numpy(dtype=np.float64)
        V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        V = V / (np.linalg.norm(V, axis=1, keepdims=True) + 1e-12)
        S = V @ V.T
        n = len(ids)
        picked: list[int] = []
        scores: list[float] = []
        max_sim = np.zeros(n)
        alive = np.ones(n, dtype=bool)
        for _ in range(min(k, n)):
            obj = lam * rel - (1.0 - lam) * (max_sim if picked else 0.0)
            obj = np.where(alive, obj, -np.inf)
            i = int(np.argmax(obj))  # first occurrence = smallest id (sorted)
            picked.append(i)
            scores.append(float(obj[i]))
            alive[i] = False
            max_sim = np.maximum(max_sim, S[:, i])
        return pd.DataFrame({
            qid_col: pdf[qid_col].iloc[picked].to_numpy(),
            id_col: ids[picked],
            "mmr_rank": np.arange(1, len(picked) + 1, dtype=np.int32),
            "mmr_score": np.round(np.asarray(scores), 9),
        })

    return candidates.groupBy(qid_col).applyInPandas(kernel, schema=schema)
