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


def gopher_quality_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 20,
    max_words: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    max_symbol_ratio: float = 0.3,
    min_stopwords: int = 2,
) -> DataFrame:
    """Gopher-style document-level quality rules (Rae et al. 2021 §A1.1),
    the non-repetition half (repetition rules live in
    functions/text.dup_token_fraction / top_bigram_fraction):

    - ``wc_ok``       word count within [min_words, max_words]
    - ``mean_len_ok`` mean token length within [min_mean_len, max_mean_len]
    - ``symbol_ok``   punctuation-to-word ratio below max_symbol_ratio
    - ``stopword_ok`` at least min_stopwords stopword hits
    - ``passes``      conjunction of all four

    Pure expression trees over one scan — no shuffle, no UDF; filters push
    to the parquet scan when ``passes`` is used as a predicate.
    """
    from vectordb_watermark_spark.functions.text import (
        mean_token_len,
        punct_count,
        stopword_count,
        token_count,
    )

    n = token_count(F.col(text_col))
    wc_ok = (n >= min_words) & (n <= max_words)
    ml = mean_token_len(F.col(text_col))
    mean_len_ok = (ml >= min_mean_len) & (ml <= max_mean_len)
    symbol_ok = (
        punct_count(F.col(text_col)).cast("double") / F.greatest(n, F.lit(1)).cast("double")
    ) < max_symbol_ratio
    stopword_ok = stopword_count(F.col(text_col)) >= min_stopwords
    return df.select(
        F.col(id_col),
        wc_ok.alias("wc_ok"),
        mean_len_ok.alias("mean_len_ok"),
        symbol_ok.alias("symbol_ok"),
        stopword_ok.alias("stopword_ok"),
        (wc_ok & mean_len_ok & symbol_ok & stopword_ok).alias("passes"),
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 5,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source top-``k`` TF-IDF terms ``(source, term, rank, tfidf)`` —
    corpus characterization (what distinguishes each domain's vocabulary).

    tf = term count within the source; idf = ln((1+S)/(1+df_s)) + 1 over
    the S sources (smoothed sklearn form).  Two map-side-combined groupBys
    (term-in-source counts, then source-document-frequencies — both tiny
    versus the corpus by Zipf), one broadcast-size join, and a per-source
    top-k window over the already-aggregated term table.  Deterministic
    tie-break: tfidf (rounded BEFORE ranking) desc, term asc.
    """
    from pyspark.sql import Window

    tf = (
        df.select(F.col(source_col).alias("source"),
                  F.explode(tokens(F.lower(F.col(text_col)))).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfs = tf.groupBy("term").agg(F.countDistinct("source").alias("dfs"))
    n_sources = df.agg(F.countDistinct(F.col(source_col)).alias("s"))
    scored = (
        tf.join(dfs, "term")
        .crossJoin(F.broadcast(n_sources))
        .select(
            "source", "term",
            F.round(
                F.col("tf")
                * (F.log((1.0 + F.col("s")) / (1.0 + F.col("dfs"))) + F.lit(1.0)),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("source").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("source", "term", "rank", (F.col("tfidf") + F.lit(0.0)).alias("tfidf"))
    )


def length_percentiles(
    df: DataFrame,
    value_col: str = "n_chars",
    group_col: str = "source",
    pcts: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
) -> DataFrame:
    """Per-group EXACT percentiles of a numeric column ``(group, pct, val)``
    — length-distribution audit before choosing truncation/packing budgets.

    Uses Spark's exact ``percentile`` aggregate (linear interpolation, the
    same definition as DuckDB ``quantile_cont`` / numpy 'linear'), not
    ``percentile_approx`` — at any scale this is one shuffle on the group
    key and a per-group sort of that group's values; the groups here are
    few (domains/sources), so exactness costs nothing material.
    """
    arr = "array({})".format(",".join(repr(p) for p in pcts))
    per = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.expr(f"percentile({value_col}, {arr})").alias("qs")
    )
    pct_arr = F.array(*[F.lit(p) for p in pcts])
    return per.select(
        F.col("grp").alias(group_col),
        F.posexplode("qs").alias("__i", "val"),
    ).select(
        F.col(group_col),
        F.element_at(pct_arr, F.col("__i") + 1).alias("pct"),
        F.round(F.col("val"), 6).alias("val"),
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


def bigram_counts(
    df: DataFrame, text_col: str = "text", min_count: int = 2
) -> DataFrame:
    """Corpus bigram-frequency table ``(w1, w2, cnt)`` over adjacent
    lowercase whitespace tokens, pruned to ``cnt >= min_count`` (the
    pruning is what gives the stupid-backoff in :func:`bigram_lm_score`
    something to back off TO — unpruned, every bigram of the training
    corpus trivially has count >= 1).  Adjacent pairs come from zipping the
    token array against itself shifted by one (``slice`` twice +
    ``arrays_zip``) — pure Catalyst, no shuffle until the ONE map-side-
    combined ``groupBy``."""
    toks = tokens(F.lower(F.col(text_col)))
    pairs = F.when(
        F.size(toks) >= 2,
        F.arrays_zip(
            F.slice(toks, 1, F.size(toks) - 1).alias("w1"),
            F.slice(toks, 2, F.size(toks) - 1).alias("w2"),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return (
        df.select(F.explode(pairs).alias("pr"))
        .select(F.col("pr.w1").alias("w1"), F.col("pr.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )


def bigram_lm_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.4,
    min_count: int = 2,
    unigrams: DataFrame | None = None,
    bigrams: DataFrame | None = None,
) -> DataFrame:
    """``(id, n_bigrams, bigram_lm_score)``: mean log10 bigram stupid-backoff
    probability of the document — the 2-gram upgrade of
    :func:`corpus_logfreq_score`'s unigram proxy (CCNet filters on exactly
    this signal, with a KenLM 5-gram; stupid backoff is Brants et al. 2007's
    web-scale simplification, no discounting to fit):

        P(w2 | w1) = cnt(w1 w2) / cnt(w1)           if cnt(w1 w2) >= min_count
                     alpha * cnt(w2) / total        otherwise (backoff)

    Word-salad scores low (its bigrams are all backoff), fluent-but-common
    text scores high; unlike the unigram score it catches shuffled-token
    documents whose unigram profile is perfectly corpus-typical.  Documents
    with fewer than 2 tokens emit no bigrams and are absent from the output
    (same contract as the oracle twin).

    ``unigrams``/``bigrams`` accept precomputed :func:`token_frequencies` /
    :func:`bigram_counts` tables — built once, reused across scoring shards
    (the 100 TB shape: two count passes, then a score pass that joins two
    Zipf-small side tables, broadcast while they fit, AQE decides).  Tokens
    ABSENT from a precomputed unigram table (OOV — new shard scored against
    an old vocabulary) back off with a floor count of 1, the rarest-possible
    in-vocab mass, so unseen tokens are penalized instead of silently
    dropped; every input document with >= 2 tokens appears in the output
    regardless of vocabulary coverage.  Self-scored corpora (the default,
    and the oracle twin) have no OOV tokens, so the floor never fires there.
    """
    if unigrams is None:
        unigrams = token_frequencies(df, text_col)
    if bigrams is None:
        bigrams = bigram_counts(df, text_col, min_count)
    total = unigrams.agg(F.sum("cnt").alias("__t"))

    toks = tokens(F.lower(F.col(text_col)))
    pairs = F.when(
        F.size(toks) >= 2,
        F.arrays_zip(
            F.slice(toks, 1, F.size(toks) - 1).alias("w1"),
            F.slice(toks, 2, F.size(toks) - 1).alias("w2"),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    doc_pairs = df.select(F.col(id_col).alias("id"), F.explode(pairs).alias("pr")).select(
        "id", F.col("pr.w1").alias("w1"), F.col("pr.w2").alias("w2")
    )
    u1 = unigrams.select(F.col("token").alias("w1"), F.col("cnt").alias("c1"))
    u2 = unigrams.select(F.col("token").alias("w2"), F.col("cnt").alias("c2"))
    bi = bigrams.select("w1", "w2", F.col("cnt").alias("cb"))
    # OOV floor (precomputed-table reuse): left-join the unigram tables and
    # coalesce the backoff count to 1 — an unseen w2 scores like the rarest
    # in-vocab token; a bigram hit with a pruned/missing w1 count also falls
    # through to backoff (cb/NULL would otherwise poison the average)
    lp = F.when(
        F.col("cb").isNotNull() & F.col("c1").isNotNull(),
        F.log10(F.col("cb") / F.col("c1").cast("double")),
    ).otherwise(
        F.log10(
            F.lit(alpha)
            * F.coalesce(F.col("c2"), F.lit(1)).cast("double")
            / F.col("__t").cast("double")
        )
    )
    return (
        doc_pairs.join(bi, ["w1", "w2"], "left")
        .join(u1, "w1", "left")
        .join(u2, "w2", "left")
        .crossJoin(F.broadcast(total))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(lp), 6).alias("bigram_lm_score"),
        )
        .select(F.col("id").alias(id_col), "n_bigrams", "bigram_lm_score")
    )


def lm_quality_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    n_buckets: int = 3,
    alpha: float = 0.4,
    min_count: int = 2,
    unigrams: DataFrame | None = None,
    bigrams: DataFrame | None = None,
) -> DataFrame:
    """CCNet-style LM-quality bucketing: ``(id, source, bigram_lm_score,
    bucket)`` where ``bucket`` splits each source's documents into
    equal-count quality tiers by bigram stupid-backoff score — with the
    default ``n_buckets=3`` they are the CCNet paper's literal
    ``head`` / ``middle`` / ``tail`` (Wenzek et al. 2020 keep head+middle
    and drop tail; with other counts buckets are ``q1..qN``, best first).

    Deterministic: ntile over (score DESC, id ASC) — ties cannot float
    between runs or partitionings.  Documents with < 2 tokens have no
    bigrams and are absent, inheriting :func:`bigram_lm_score`'s contract.

    Scale shape: the score pass is :func:`bigram_lm_score` (two Zipf-small
    broadcast-able count tables); the bucketing is ONE window partitioned
    by source — an ntile needs its partition sorted, so a pathologically
    hot source is the straggler bound; CCNet itself shards by language
    exactly this way.  Precomputed ``unigrams``/``bigrams`` reuse applies.
    """
    from pyspark.sql import Window

    scores = bigram_lm_score(
        df, id_col, text_col, alpha, min_count, unigrams, bigrams
    )
    src = df.select(F.col(id_col), F.col(source_col))
    w = Window.partitionBy(source_col).orderBy(
        F.col("bigram_lm_score").desc(), F.col(id_col).asc()
    )
    tile = F.ntile(n_buckets).over(w)
    name = (
        F.when(tile == 1, "head")
        .when(tile == 2, "middle")
        .otherwise("tail")
        if n_buckets == 3
        else F.concat(F.lit("q"), tile.cast("string"))
    )
    return (
        scores.join(src, id_col)
        .select(
            id_col,
            source_col,
            "bigram_lm_score",
            name.alias("bucket"),
        )
    )


def group_split(
    df: DataFrame,
    group_col: str,
    val_frac: float = 0.1,
    key: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Leakage-guarded train/validation split: EVERY row of a group lands
    on the same side, so near-duplicates that share the group (all pages
    of one domain, all turns of one conversation, all chunks of one
    document) can never straddle the boundary and leak eval answers into
    training — the standard contamination failure a ROW-level split
    invites (row-level sampling is ``functions.hashing.keyed_uniform`` on
    the row id; this operator is its group-level counterpart).

    Keyed-hash on the GROUP VALUE: deterministic, partition-order free,
    re-runnable (the same key always produces the same split), and
    map-only — no shuffle, no materialized group table, no join; the
    fraction is honored in expectation over groups (exact per-group
    atomicity, approximate global fraction — the leakage guarantee is
    the exact one, by construction).  NULL group values hash to NULL and
    deterministically land in ``train`` (the ``otherwise`` branch) — one
    atomic group, same in the DuckDB twin.
    """
    if not 0.0 <= val_frac <= 1.0:
        raise ValueError(f"val_frac must be in [0, 1]; got {val_frac!r}")
    from vectordb_watermark_spark.functions.hashing import keyed_uniform

    u = keyed_uniform(key, "grpsplit", F.col(group_col).cast("string"))
    return df.withColumn(
        split_col,
        F.when(u < F.lit(float(val_frac)), F.lit("val")).otherwise(
            F.lit("train")
        ),
    )


def group_kfold(
    df: DataFrame,
    group_col: str,
    n_folds: int = 5,
    key: str = "kfold",
    fold_col: str = "fold",
) -> DataFrame:
    """K-fold counterpart of :func:`group_split`: every row of a group
    lands in the SAME fold (``0 .. n_folds-1``), so cross-validation
    rotations carry the same leakage guarantee as the single split.
    Keyed-hash on the group value — deterministic, partition-order
    free, map-only; folds are equal-probability in expectation over
    groups.  NULL groups hash as one atomic group (same in the twin)."""
    if n_folds < 2:
        raise ValueError(f"n_folds must be >= 2; got {n_folds!r}")
    from vectordb_watermark_spark.functions.hashing import keyed_uniform

    u = keyed_uniform(key, "grpkfold", F.col(group_col).cast("string"))
    fold = F.least(
        F.floor(u * F.lit(float(n_folds))), F.lit(n_folds - 1)
    ).cast("int")
    return df.withColumn(fold_col, fold)


def split_by_components(
    df: DataFrame,
    pairs: DataFrame,
    val_frac: float = 0.1,
    id_col: str = "doc_id",
    a_col: str = "a",
    b_col: str = "b",
    key: str = "split",
    split_col: str = "split",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Near-dup-leakage-guarded train/validation split: every member of
    a near-duplicate CLUSTER (connected component of the ``pairs``
    graph) lands on the same side of the boundary.  :func:`group_split`
    guards groups you can NAME (domain, conversation); this guards the
    groups you have to DISCOVER — near-duplicates found by
    MinHash/SimHash/embedding dedup.  Splitting rows instead lets a
    training near-copy of an eval document leak its content across the
    boundary — the measured train/test contamination that motivates
    dedup-before-split (Lee et al. 2022, "Deduplicating training data
    makes language models better").

    Composition: ``dedup.connected_components`` labels each paired row
    with its cluster's canonical min-id; unpaired rows are their own
    singleton group; the split is then the keyed-hash group decision on
    the cluster label (same determinism/map-only properties as
    ``group_split`` once the labels exist; the only shuffles are the
    component rounds and one left join, both bounded by the PAIR graph,
    not the corpus).  Re-runnable: same key + same pairs -> same split.
    """
    if not 0.0 <= val_frac <= 1.0:
        raise ValueError(f"val_frac must be in [0, 1]; got {val_frac!r}")
    from vectordb_watermark_spark.functions.hashing import keyed_uniform
    from vectordb_watermark_spark.operators.dedup import connected_components

    comps = connected_components(
        pairs, a_col, b_col, checkpoint_dir=checkpoint_dir
    ).select(F.col("id").alias("__cc_id"), F.col("comp").alias("__cc_comp"))
    joined = df.join(comps, df[id_col] == F.col("__cc_id"), "left")
    group = F.coalesce(F.col("__cc_comp"), df[id_col])
    u = keyed_uniform(key, "grpsplit", group.cast("string"))
    return (
        joined.withColumn(
            split_col,
            F.when(u < F.lit(float(val_frac)), F.lit("val")).otherwise(
                F.lit("train")
            ),
        )
        .drop("__cc_id", "__cc_comp")
    )


def profile_columns(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = False,
    rsd: float = 0.02,
) -> DataFrame:
    """Per-column data profile -> one row per column: ``(column, n_rows,
    n_null, n_distinct, min_val, max_val)`` — the table-health sweep a
    pipeline runs before trusting a new corpus drop (null bursts, id
    collisions, truncated columns, out-of-range values).

    Scale shape: ONE aggregate job.  Default ``n_distinct`` is
    ``approx_count_distinct`` (HyperLogLog++, bounded state per column,
    relative error ``rsd``) so the whole profile is a single pass with
    map-side partial aggregation and no per-column shuffle;
    ``exact_distinct=True`` opts into Spark's exact distinct expansion
    (one grouping-set shuffle per column — fine at audit scale, dear at
    100 TB, hence not the default).  ``min_val``/``max_val`` are cast to
    strings so heterogeneous column types share one result schema;
    complex columns (arrays/structs/maps/binary) report null min/max
    (no total order) but still count nulls and distincts via their
    canonical string form.
    """
    cols = columns if columns is not None else df.columns
    if not cols:
        raise ValueError("profile_columns: no columns")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile_columns: unknown columns {missing}")
    aggs = [F.count(F.lit(1)).alias("__n")]
    complex_kinds = ("array", "map", "struct", "binary")
    for i, c in enumerate(cols):
        dt = df.schema[c].dataType.simpleString()
        is_complex = any(dt.startswith(k) for k in complex_kinds)
        # null-guarded: to_json(struct(NULL)) is "{}", which would count
        # null rows as one more distinct value
        probe = (
            F.when(F.col(c).isNotNull(), F.to_json(F.struct(F.col(c))))
            if dt.startswith(("array", "map", "struct"))
            else F.hex(F.col(c)) if dt.startswith("binary")
            else F.col(c)
        )
        aggs.append(
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__null_{i}")
        )
        aggs.append(
            (
                F.count_distinct(probe) if exact_distinct
                else F.approx_count_distinct(probe, rsd)
            ).alias(f"__dist_{i}")
        )
        if is_complex:
            aggs.append(F.lit(None).cast("string").alias(f"__min_{i}"))
            aggs.append(F.lit(None).cast("string").alias(f"__max_{i}"))
        else:
            aggs.append(F.min(F.col(c)).cast("string").alias(f"__min_{i}"))
            aggs.append(F.max(F.col(c)).cast("string").alias(f"__max_{i}"))
    row = df.agg(*aggs)
    # pivot the single wide row into one row per column with a stack —
    # driver never materializes data, it's all one plan
    parts = ", ".join(
        f"'{c}', __null_{i}, __dist_{i}, __min_{i}, __max_{i}"
        for i, c in enumerate(cols)
    )
    return row.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {parts}) AS "
            "(column, n_null, n_distinct, min_val, max_val)"
        ),
    ).select(
        "column",
        F.col("n_rows").cast("long"),
        F.col("n_null").cast("long").alias("n_null"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_val",
        "max_val",
    )


def check_expectations(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Declarative data-quality gate (the Deequ/expectations pattern) ->
    one row per rule: ``(rule_id, rule_type, col, n_violations, n_rows,
    passed)``.

    Rule dicts (``col`` where applicable):

    - ``{"type": "not_null", "col": c}`` — null cells violate.
    - ``{"type": "unique", "col": c}`` — violations = surplus copies
      (``count(c) - count_distinct(c)``; nulls don't participate).
    - ``{"type": "in_range", "col": c, "min": lo, "max": hi}`` — non-null
      cells outside ``[lo, hi]`` violate.
    - ``{"type": "in_set", "col": c, "values": [...]}`` — non-null cells
      outside the set violate.
    - ``{"type": "matches", "col": c, "pattern": regex}`` — non-null
      cells NOT containing the regex violate (``rlike`` semantics).
    - ``{"type": "min_rows", "n": k}`` — violations = shortfall.
    - ``{"type": "expr", "name": label, "expr": sql_bool}`` — rows where
      the SQL predicate is not true violate (escape hatch; any Catalyst
      boolean expression).

    Scale shape: every rule compiles to a conditional-count aggregate
    expression and ALL rules run in ONE ``agg()`` over the table — one
    scan, map-side partial aggregation, no matter how many rules (the
    exception is ``unique``'s exact ``count_distinct``, which Spark
    plans as an expand — still the same single job).  The wide one-row
    result is unpivoted to the per-rule table with ``stack`` — no second
    scan.  Checks across tables (referential integrity) are joins, not
    expectations — use an anti-join count directly.
    """
    if not rules:
        raise ValueError("check_expectations needs at least one rule")
    aggs = []
    meta = []  # (rule_id, rule_type, col)
    for i, r in enumerate(rules):
        t = r.get("type")
        c = r.get("col", "")
        if t == "not_null":
            v = F.count_if(F.col(c).isNull())
        elif t == "unique":
            v = F.count(F.col(c)) - F.count_distinct(F.col(c))
        elif t == "in_range":
            v = F.count_if(
                F.col(c).isNotNull()
                & ~F.col(c).between(F.lit(r["min"]), F.lit(r["max"]))
            )
        elif t == "in_set":
            v = F.count_if(
                F.col(c).isNotNull() & ~F.col(c).isin(list(r["values"]))
            )
        elif t == "matches":
            v = F.count_if(
                F.col(c).isNotNull() & ~F.col(c).rlike(r["pattern"])
            )
        elif t == "min_rows":
            v = F.greatest(F.lit(int(r["n"])) - F.count("*"), F.lit(0))
            c = ""
        elif t == "expr":
            v = F.count_if(~F.coalesce(F.expr(r["expr"]), F.lit(False)))
            c = r.get("name", r["expr"])
        else:
            raise ValueError(f"unknown expectation type {t!r} (rule {i})")
        if "'" in str(c) or "\\" in str(c):
            raise ValueError(
                f"rule {i}: column/name may not contain quotes or "
                f"backslashes (embedded in generated stack SQL): {c!r}"
            )
        aggs.append(v.cast("long").alias(f"v{i}"))
        meta.append((f"r{i}", t, c))
    wide = df.agg(F.count("*").cast("long").alias("nr"), *aggs)
    cells = ", ".join(
        f"'{rid}', '{rt}', '{col}', v{i}" for i, (rid, rt, col) in enumerate(meta)
    )
    return wide.select(
        F.expr(
            f"stack({len(meta)}, {cells}) AS (rule_id, rule_type, col, n_violations)"
        ),
        F.col("nr").alias("n_rows"),
    ).select(
        "rule_id", "rule_type", "col", "n_violations", "n_rows",
        (F.col("n_violations") == 0).alias("passed"),
    )


def check_ref_integrity(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str | None = None,
) -> DataFrame:
    """Cross-table referential-integrity expectation -> one row
    ``(n_child, n_orphans, passed)``: child rows whose (non-null) key has
    no match in the parent.  The join :func:`check_expectations` can't
    express single-table — one left-anti join on the key (broadcast when
    the parent is dimension-sized, AQE decides), counts only."""
    pk = parent_key or child_key
    # ONE pass over the child instead of two (count + anti-join count):
    # a left join against the distinct parent keys marks hits, and both
    # tallies fold into a single aggregate — at scale this halves the
    # child-table scans.  NULL child keys count toward n_child but are
    # never orphans (a NULL key joins nothing), matching the previous
    # filter-then-anti-join semantics.
    row = (
        child.select(F.col(child_key).alias("__k"))
        .join(
            parent.select(F.col(pk).alias("__k"))
            .distinct()
            .withColumn("__hit", F.lit(True)),
            "__k",
            "left",
        )
        .agg(
            F.count(F.lit(1)).alias("n_child"),
            F.count(
                F.when(F.col("__k").isNotNull() & F.col("__hit").isNull(), 1)
            ).alias("orphans"),
        )
        .collect()[0]
    )
    n_child, orphans = int(row["n_child"]), int(row["orphans"])
    spark = child.sparkSession
    return spark.createDataFrame(
        [(n_child, orphans, orphans == 0)],
        "n_child long, n_orphans long, passed boolean",
    )


def table_diff(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str] | str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Key-aligned table comparison -> one row ``(n_only_left,
    n_only_right, n_changed, n_equal)`` — the migration/backfill
    acceptance check ("the rewritten table equals the old one, except
    these N rows").

    One full outer join on the keys; ``compare_cols`` (default: all
    shared non-key columns) are compared null-safely (``<=>``), so a
    NULL-vs-NULL cell is equal and NULL-vs-value is a change.  Counts
    only — no row materialization; run the same call with a filter to
    drill into a specific partition.  Duplicate keys on either side are
    a ValueError (a diff keyed on a non-key is meaningless).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if compare_cols is None:
        shared = [c for c in left.columns if c in set(right.columns)]
        compare_cols = [c for c in shared if c not in set(keys)]
    # one fused dup guard instead of one job per side: both key sets scan
    # in a single union + groupBy, and the offending side rides in the row.
    # The fusion requires union-compatible key types; when the two sides'
    # key columns differ in type (the diff join itself still works through
    # implicit casts), fall back to the per-side guards rather than letting
    # an unrelated union AnalysisException preempt the intended duplicate-
    # key ValueError (ADVICE r14).  A lossy cast-to-common-type would be
    # wrong here: e.g. float keys -0.0 and 0.0 are one join key but two
    # distinct strings, so a casted guard could miss a real duplicate.
    same_key_types = [left.schema[k].dataType for k in keys] == [
        right.schema[k].dataType for k in keys
    ]
    if same_key_types:
        dup = (
            left.select(*[F.col(k) for k in keys], F.lit("left").alias("__side"))
            .unionByName(
                right.select(*[F.col(k) for k in keys], F.lit("right").alias("__side"))
            )
            .groupBy("__side", *keys)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .collect()
        )
    else:
        dup = []
        for side, frame in (("left", left), ("right", right)):
            if (
                frame.select(*[F.col(k) for k in keys])
                .groupBy(*keys)
                .count()
                .filter(F.col("count") > 1)
                .limit(1)
                .count()
            ):
                dup = [{"__side": side}]
                break
    if dup:
        raise ValueError(
            f"table_diff: duplicate keys on the {dup[0]['__side']} side — "
            f"keys must be unique for a row-level diff"
        )
    l = left.select(
        *[F.col(k).alias(f"__k{i}") for i, k in enumerate(keys)],
        F.lit(True).alias("__in_l"),
        *[F.col(c).alias(f"__l_{c}") for c in compare_cols],
    )
    r = right.select(
        *[F.col(k).alias(f"__k{i}") for i, k in enumerate(keys)],
        F.lit(True).alias("__in_r"),
        *[F.col(c).alias(f"__r_{c}") for c in compare_cols],
    )
    joined = l.join(r, [f"__k{i}" for i in range(len(keys))], "full_outer")
    eq = F.lit(True)
    for c in compare_cols:
        eq = eq & F.col(f"__l_{c}").eqNullSafe(F.col(f"__r_{c}"))
    return joined.agg(
        F.count_if(
            F.col("__in_l").isNotNull() & F.col("__in_r").isNull()
        ).cast("long").alias("n_only_left"),
        F.count_if(
            F.col("__in_l").isNull() & F.col("__in_r").isNotNull()
        ).cast("long").alias("n_only_right"),
        F.count_if(
            F.col("__in_l").isNotNull() & F.col("__in_r").isNotNull() & ~eq
        ).cast("long").alias("n_changed"),
        F.count_if(
            F.col("__in_l").isNotNull() & F.col("__in_r").isNotNull() & eq
        ).cast("long").alias("n_equal"),
    )


def rebalance_classes(
    df: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    per_class: int | None = None,
    salt: str = "rebalance",
) -> DataFrame:
    """Deterministic class rebalancing by keyed-hash undersampling:
    every class is cut to ``per_class`` rows (default: the SMALLEST
    class's count — exact balance), keeping each class's
    lowest-keyed-hash rows.  Returns the input columns unchanged.

    The pick is a pure function of (salt, id) — re-running, adding
    executors, or repartitioning cannot change which rows survive, and
    a grown corpus keeps its previous picks stable except where the
    class floor moved (the same partition-invariant keyed-hash contract
    as the engine's samplers).  One window per class (state bounded by
    the class partition) after an optional one-row-per-class tally for
    the floor.  The imbalanced-label fix for classifier training sets.
    """
    from vectordb_watermark_spark.functions.hashing import keyed_hash_hex

    if per_class is None:
        floor = df.groupBy(label_col).agg(F.count("*").alias("n")).agg(
            F.min("n").alias("target")
        )
        target_expr = F.col("target")
        base = df.crossJoin(F.broadcast(floor))
    else:
        if per_class < 1:
            raise ValueError(f"per_class must be >= 1, got {per_class}")
        target_expr = F.lit(int(per_class))
        base = df
    from pyspark.sql.window import Window

    w = Window.partitionBy(label_col).orderBy(
        keyed_hash_hex(salt, F.col(id_col)), F.col(id_col)
    )
    out = (
        base.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= target_expr)
        .drop("__rk")
    )
    return out.drop("target") if per_class is None else out


def temperature_mix(
    df: DataFrame,
    alpha: float = 0.3,
    source_col: str = "source",
    id_col: str = "doc_id",
    total_out: int | None = None,
    salt: str = "tempmix",
    total_rows: int | None = None,
) -> DataFrame:
    """Temperature-based source resampling — the multi-source mixing rule
    of the mT5 / XLM-R / multilingual-LM data recipes: source ``i`` gets
    output share ``n_i^alpha / sum_j n_j^alpha``.  ``alpha = 1`` keeps the
    natural mix, ``alpha = 0`` is uniform-per-source, and the standard
    ``0.2-0.7`` range lifts low-resource sources without letting a giant
    crawl drown them.

    Returns ``(id, source, copy)``: each input row appears ``reps`` times
    (``copy`` = 1..reps) where per-source target counts are apportioned by
    exact largest-remainder (floor + the ``leftover`` largest fractional
    parts, ties to the lexicographically first source — never off by one
    from rounding) and distributed within a source as ``target div n``
    repeats for every row plus one extra for the ``target mod n`` rows
    with the lowest keyed hash.  Oversampled sources (target > n) repeat
    rows — mT5's low-resource upsampling — deterministically.

    Every step is a pure function of (counts, alpha, salt): re-running,
    repartitioning, or adding executors cannot change the sample, and the
    whole derivation has a DuckDB SQL twin.  Scale shape: one map-side
    source tally, apportionment over the tiny source table (window over
    sources, broadcast back), one per-source-partition window for ranks,
    map-side ``explode`` for repeats — the corpus never globally sorts or
    shuffles beyond the per-source rank.

    ``total_out`` defaults to the corpus row count (resample in place);
    pass the token/document budget of the training run to size the mix.
    ``total_rows`` (the INPUT row count, when the caller knows it — a
    catalog statistic at scale) short-circuits the range-partitioned
    rank to a single window below ``topk.SMALL_TOTAL``, the same
    adaptivity contract as the other samplers.
    """
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    if total_out is not None and total_out < 1:
        raise ValueError(f"total_out must be >= 1, got {total_out}")
    from pyspark.sql.window import Window

    from vectordb_watermark_spark.functions.hashing import keyed_hash_hex

    per = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n"))
    tot = per.agg(
        F.sum("n").alias("__corpus"),
        F.sum(F.pow(F.col("n").cast("double"), F.lit(float(alpha)))).alias("__w"),
    )
    t_expr = (
        F.lit(int(total_out)).cast("long")
        if total_out is not None
        else F.col("__corpus").cast("long")
    )
    # exact largest-remainder apportionment; the 9-dp rounding before
    # floor/frac is the cross-engine cushion for the pow() doubles (same
    # shared-libm discipline as the ln-based oracles)
    exact = F.round(
        t_expr.cast("double")
        * F.pow(F.col("n").cast("double"), F.lit(float(alpha)))
        / F.col("__w"),
        9,
    )
    scored = per.crossJoin(F.broadcast(tot)).select(
        source_col,
        "n",
        t_expr.alias("__t"),
        F.floor(exact).cast("long").alias("__base"),
        F.round(exact - F.floor(exact), 9).alias("__frac"),
    )
    wsrc = Window.orderBy(F.col("__frac").desc(), F.col(source_col).asc())
    wall = Window.partitionBy(F.lit(1))
    targets = scored.select(
        source_col,
        "n",
        (
            F.col("__base")
            + (
                F.row_number().over(wsrc)
                <= (F.col("__t") - F.sum("__base").over(wall))
            ).cast("long")
        ).alias("__target"),
    )
    # Within-source rank WITHOUT a per-source window: a web corpus is
    # source-skewed (one crawl can be 90% of rows), and
    # Window.partitionBy(source) would single-task that source's whole
    # sort.  Instead: the engine's range-partitioned global_row_number
    # over (source, hash, id) — sources sort contiguously, so
    # within-source rank = global rank minus the cumulative count of
    # lexicographically-earlier sources (a window over the TINY source
    # table, broadcast back).  total<=SMALL_TOTAL short-circuits to one
    # plain window inside global_row_number, same as the other samplers.
    from vectordb_watermark_spark.operators.topk import global_row_number

    woff = Window.orderBy(F.col(source_col).asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    targets = targets.withColumn(
        "__off", F.coalesce(F.sum("n").over(woff), F.lit(0)).cast("long")
    )
    base = (
        df.select(F.col(id_col).alias("id"), F.col(source_col))
        .join(F.broadcast(targets), source_col)
        .withColumn("__h", keyed_hash_hex(salt, F.col("id")))
    )
    ranked = global_row_number(
        base, order_cols=[source_col, "__h", "id"], out_col="__grn",
        total=total_rows,
    )
    reps = F.expr("__target div n") + (
        (F.col("__grn") - F.col("__off")) <= F.col("__target") % F.col("n")
    ).cast("long")
    return (
        ranked.withColumn("__reps", reps)
        .filter(F.col("__reps") >= 1)
        .select(
            F.col("id").alias(id_col),
            F.col(source_col),
            F.explode(F.sequence(F.lit(1).cast("long"), F.col("__reps"))).alias(
                "copy"
            ),
        )
    )
