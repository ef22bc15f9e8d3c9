"""Text-analysis kernels for large-scale training-data pipelines.

Beyond reference parity (the reference has no text ops), these are the
document-pipeline operators a 100 TB curation job needs: token counting,
quality scoring, language ID, and fingerprinting.  Everything is built-in
Catalyst expressions (split / transform / aggregate / sha2) — no Python in
the hot path — and every operator has an exact DuckDB SQL twin so the
driver's oracle gate hash-checks it.

Design notes for scale:
- all per-document: embarrassingly parallel, no shuffle at all;
- tokenization is ``split`` on whitespace + a lowercase filter, not a UDF;
- hashes are sha2/md5 (JVM intrinsics, identical in DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny per-language marker lexicons for the n-gram/stopword language-ID
#: heuristic.  Deliberately small and deterministic: language ID at scale is
#: a scoring argmax, the lexicon is a tuning knob.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "nicht"],
    "es": ["el", "la", "los", "de", "y", "un", "una", "es"],
    "zh": ["de5", "shi4", "le5", "zai4", "you3", "he2", "wo3", "ta1"],
}

#: generic stopword list for quality scoring (subset of en markers + fillers)
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "that", "it", "on", "for", "as"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization with empty-string removal (split on runs of
    whitespace leaves '' for leading separators)."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    """Whitespace token count as BIGINT."""
    return F.size(tokens(text)).cast("long")


def word_count_regex(text: Column) -> Column:
    """BPE-ish token count: alphabetic runs, digit runs, and single
    non-space symbols each count as one token."""
    return F.size(F.regexp_extract_all(text, F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), 0)).cast(
        "long"
    )


def punct_count(text: Column) -> Column:
    """Number of .,!?; characters — computed by length difference, which is
    cheap and engine-agnostic (no regex dialect drift)."""
    stripped = text
    for ch in ".,!?;":
        stripped = F.replace(stripped, F.lit(ch), F.lit(""))
    return (F.length(text) - F.length(stripped)).cast("long")


def stopword_count(text: Column, stopwords: list[str] | None = None) -> Column:
    """Count of tokens that are stopwords (case-insensitive)."""
    sw = F.array(*[F.lit(s) for s in (stopwords or STOPWORDS)])
    return F.size(F.filter(tokens(F.lower(text)), lambda t: F.array_contains(sw, t))).cast("long")


def quality_score(text: Column) -> Column:
    """Composite document-quality score in [0,1]:

    0.4 * length_score (saturating at 1000 chars)
    + 0.3 * (1 - punct_ratio_clamped)
    + 0.3 * stopword_presence (saturating at 10 stopwords)

    The exact formula is an engine choice (the reference has no text ops);
    what matters is determinism + monotonicity in the underlying signals.
    """
    n = F.length(text).cast("double")
    length_score = F.least(n / F.lit(1000.0), F.lit(1.0))
    punct_ratio = punct_count(text).cast("double") / F.greatest(n, F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio * F.lit(10.0), F.lit(1.0))
    sw_score = F.least(stopword_count(text).cast("double") / F.lit(10.0), F.lit(1.0))
    return F.round(
        F.lit(0.4) * length_score + F.lit(0.3) * punct_score + F.lit(0.3) * sw_score, 6
    )


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language marker-hit counts over lowercase tokens."""
    toks = tokens(F.lower(text))
    out = {}
    for lang, markers in LANG_MARKERS.items():
        marr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(marr, t))).cast("long")
    return out


def lang_id(text: Column) -> Column:
    """Argmax language by marker score; ties break alphabetically; all-zero
    scores -> 'und' (undetermined)."""
    scores = lang_scores(text)
    pairs = F.array(
        *[F.struct(scores[lang].alias("s"), F.lit(lang).alias("l")) for lang in sorted(LANG_MARKERS)]
    )
    # array_sort on (s desc, l asc): sort by struct is (s asc, l asc), so sort
    # by negated score
    neg = F.array(
        *[
            F.struct((-scores[lang]).alias("ns"), F.lit(lang).alias("l"))
            for lang in sorted(LANG_MARKERS)
        ]
    )
    best = F.element_at(F.array_sort(neg), 1)
    return F.when(best.getField("ns") == 0, F.lit("und")).otherwise(best.getField("l"))


def shingle_hashes(text: Column, width: int = 8) -> Column:
    """Array of 32-bit hashes of all character ``width``-grams — the basis of
    rolling-hash document fingerprints and MinHash.  sha2-derived so DuckDB
    reproduces it exactly."""
    n = F.length(text)
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(width - 1), F.lit(1)))
    return F.transform(
        idx,
        lambda i: F.conv(
            F.substring(F.sha2(text.substr(i, F.lit(width)), 256), 1, 8), 16, 10
        ).cast("long"),
    )


def fingerprint(text: Column, width: int = 8) -> Column:
    """Document fingerprint: min shingle hash (winnowing-lite).  Two documents
    sharing their minimal ``width``-gram hash are near-dup candidates."""
    return F.array_min(shingle_hashes(text, width)).cast("long")


# ---------------------------------------------------------------------------
# DuckDB SQL twins (text_col is a raw SQL expression)
# ---------------------------------------------------------------------------

def sql_tokens(text_col: str) -> str:
    return f"list_filter(string_split_regex({text_col}, '\\s+'), t -> t <> '')"


def sql_token_count(text_col: str) -> str:
    return f"CAST(len({sql_tokens(text_col)}) AS BIGINT)"


def sql_word_count_regex(text_col: str) -> str:
    return (
        f"CAST(len(regexp_extract_all({text_col}, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS BIGINT)"
    )


def sql_punct_count(text_col: str) -> str:
    expr = text_col
    for ch in ".,!?;":
        lit = "'!'" if ch == "!" else f"'{ch}'"
        expr = f"replace({expr}, {lit}, '')"
    return f"CAST(length({text_col}) - length({expr}) AS BIGINT)"


def sql_stopword_count(text_col: str, stopwords: list[str] | None = None) -> str:
    sw = ", ".join(f"'{s}'" for s in (stopwords or STOPWORDS))
    return (
        f"CAST(len(list_filter({sql_tokens(f'lower({text_col})')}, "
        f"t -> list_contains([{sw}], t))) AS BIGINT)"
    )


def sql_quality_score(text_col: str) -> str:
    n = f"CAST(length({text_col}) AS DOUBLE)"
    length_score = f"least({n} / 1000.0, 1.0)"
    punct_ratio = f"CAST({sql_punct_count(text_col)} AS DOUBLE) / greatest({n}, 1.0)"
    punct_score = f"(1.0 - least({punct_ratio} * 10.0, 1.0))"
    sw_score = f"least(CAST({sql_stopword_count(text_col)} AS DOUBLE) / 10.0, 1.0)"
    return f"round(0.4 * {length_score} + 0.3 * {punct_score} + 0.3 * {sw_score}, 6)"


def sql_lang_id(text_col: str) -> str:
    toks = sql_tokens(f"lower({text_col})")
    cases = []
    for lang in sorted(LANG_MARKERS):
        markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
        cases.append(
            f"ROW(-CAST(len(list_filter({toks}, t -> list_contains([{markers}], t))) AS BIGINT),"
            f" '{lang}')"
        )
    arr = f"[{', '.join(cases)}]"
    best = f"list_sort({arr})[1]"
    return f"CASE WHEN ({best})[1] = 0 THEN 'und' ELSE ({best})[2] END"


def sql_shingle_hashes(text_col: str, width: int = 8) -> str:
    idx = f"generate_series(1, greatest(length({text_col}) - {width - 1}, 1))"
    h = f"CAST(CAST(('0x' || substr(sha256(substr({text_col}, CAST(i AS INT), {width})), 1, 8)) AS UBIGINT) AS BIGINT)"
    return f"list_transform({idx}, i -> {h})"


def sql_fingerprint(text_col: str, width: int = 8) -> str:
    return f"CAST(list_min({sql_shingle_hashes(text_col, width)}) AS BIGINT)"


# ---------------------------------------------------------------------------
# Repetition / quality-filter rules (Gopher-style) and PII redaction
# ---------------------------------------------------------------------------

def dup_token_fraction(text: Column) -> Column:
    """Fraction of tokens that are repeats of an earlier token:
    ``1 - distinct/total`` over lowercase whitespace tokens.  The
    list-duplication half of the Gopher repetition rules (line-level rules
    collapse to token-level for single-line documents)."""
    toks = tokens(F.lower(text))
    n = F.size(toks)
    frac = F.lit(1.0) - F.size(F.array_distinct(toks)).cast("double") / F.greatest(
        n, F.lit(1)
    )
    # n = 0 would read as "all tokens are repeats" (1 - 0/1); define it as 0
    return F.when(n > 0, F.round(frac, 6)).otherwise(F.lit(0.0))


def top_bigram_fraction(text: Column) -> Column:
    """Fraction of all token-bigram occurrences taken by the single most
    frequent bigram — high values flag boilerplate/templated text.

    Pure expression tree, O(n log n) per document: the bigram array is
    SORTED and the max count is the longest equal-run, found with one
    ``aggregate`` fold — no nested per-distinct-element rescan (a naive
    distinct x filter formulation re-evaluates the inlined bigram expression
    per distinct element and goes quadratic in interpreted HOF lambdas).
    0.0 when the document has fewer than two tokens (the n >= 2 guard also
    keeps ``sequence`` ascending — ``sequence(1, 0)`` would DESCEND)."""
    toks = tokens(F.lower(text))
    n = F.size(toks)
    bigrams = F.sort_array(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - F.lit(1), F.lit(1))),
            lambda i: F.concat(
                F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)
            ),
        )
    )
    zero = F.lit(0).cast("int")
    best = F.aggregate(
        bigrams,
        F.struct(
            F.lit("").alias("prev"), zero.alias("run"), zero.alias("best")
        ),
        lambda a, x: F.struct(
            x.alias("prev"),
            F.when(x == a.prev, a.run + F.lit(1)).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                a.best,
                F.when(x == a.prev, a.run + F.lit(1)).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda a: a.best,
    )
    frac = best.cast("double") / F.greatest(n - F.lit(1), F.lit(1))
    return F.when(n >= 2, F.round(frac, 6)).otherwise(F.lit(0.0))


def mean_token_len(text: Column) -> Column:
    """Mean character length of whitespace tokens (sequential left-fold sum
    so the DuckDB twin reduces in the same order)."""
    toks = tokens(F.lower(text))
    total = F.aggregate(
        toks, F.lit(0.0), lambda acc, x: acc + F.length(x).cast("double")
    )
    return F.round(total / F.greatest(F.size(toks), F.lit(1)), 6)


def distinct_token_count(text: Column) -> Column:
    """Number of distinct lowercase whitespace tokens."""
    return F.size(F.array_distinct(tokens(F.lower(text)))).cast("long")


def type_token_ratio(text: Column) -> Column:
    """Lexical diversity: distinct tokens / total tokens (0 for empty text).
    Low TTR flags template/boilerplate text that per-row quality scores
    miss; complements dup_token_fraction (TTR is its complement on the
    same token stream, exposed in ratio form for thresholding)."""
    toks = tokens(F.lower(text))
    n = F.size(toks)
    return F.when(
        n > 0,
        F.round(F.size(F.array_distinct(toks)).cast("double") / n.cast("double"), 6),
    ).otherwise(F.lit(0.0))


#: PII patterns — valid and identical under Java regex (Spark) and RE2
#: (DuckDB): no backreferences, no lookaround
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\- ]{6,}[0-9]"


def pii_counts(text: Column) -> tuple[Column, Column]:
    """(email_count, phone_count) per document."""
    n_email = F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), 0)).cast("long")
    n_phone = F.size(F.regexp_extract_all(text, F.lit(PHONE_RE), 0)).cast("long")
    return n_email, n_phone


def redact_pii(text: Column) -> Column:
    """Replace emails then phone-number-like spans with typed placeholders —
    the pre-training PII scrub, as pure JVM regexp (no UDF).  Email first so
    digits inside addresses are not half-eaten by the phone pass."""
    out = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(out, PHONE_RE, "<PHONE>")


def sql_dup_token_fraction(text_col: str) -> str:
    toks = sql_tokens(f"lower({text_col})")
    return (
        f"CASE WHEN len({toks}) > 0 THEN "
        f"round(1.0 - CAST(len(list_distinct({toks})) AS DOUBLE)"
        f" / greatest(len({toks}), 1), 6) ELSE 0.0 END"
    )


def sql_top_bigram_fraction(text_col: str) -> str:
    """O(n) via list_histogram — a distinct x list_filter formulation
    re-inlines (and re-splits) the bigram expression per distinct element
    and measures ~100x slower in DuckDB on 60-token documents."""
    toks = sql_tokens(f"lower({text_col})")
    bigrams = (
        f"list_transform(range(1, greatest(len({toks}), 2)),"
        f" i -> ({toks})[i] || ' ' || ({toks})[i+1])"
    )
    frac = (
        f"CAST(list_max(map_values(list_aggregate({bigrams}, 'histogram')))"
        f" AS DOUBLE) / greatest(len({bigrams}), 1)"
    )
    return f"CASE WHEN len({toks}) >= 2 THEN round({frac}, 6) ELSE 0.0 END"


def sql_mean_token_len(text_col: str) -> str:
    toks = sql_tokens(f"lower({text_col})")
    # coalesce: DuckDB's list_aggregate([], 'sum') is NULL, Spark's
    # zero-init fold is 0.0 (divergence caught by the cross-engine fuzz)
    return (
        f"round(coalesce(list_aggregate(list_transform({toks},"
        f" x -> CAST(length(x) AS DOUBLE)), 'sum'), 0.0)"
        f" / greatest(len({toks}), 1), 6)"
    )


def sql_distinct_token_count(text_col: str) -> str:
    toks = sql_tokens(f"lower({text_col})")
    return f"CAST(len(list_distinct({toks})) AS BIGINT)"


def sql_type_token_ratio(text_col: str) -> str:
    toks = sql_tokens(f"lower({text_col})")
    return (
        f"CASE WHEN len({toks}) > 0 THEN "
        f"round(CAST(len(list_distinct({toks})) AS DOUBLE)"
        f" / CAST(len({toks}) AS DOUBLE), 6) ELSE 0.0 END"
    )


def sql_pii(text_col: str) -> dict[str, str]:
    """email/phone count + redaction SQL twins (RE2 'g' flag for global)."""
    return {
        "n_email": f"CAST(len(regexp_extract_all({text_col}, '{EMAIL_RE}')) AS BIGINT)",
        "n_phone": f"CAST(len(regexp_extract_all({text_col}, '{PHONE_RE}')) AS BIGINT)",
        "redacted": (
            f"regexp_replace(regexp_replace({text_col}, '{EMAIL_RE}', '<EMAIL>', 'g'),"
            f" '{PHONE_RE}', '<PHONE>', 'g')"
        ),
    }


def hash_embed_documents(
    df, dim: int = 64, id_col: str = "doc_id", text_col: str = "text"
):
    """Bulk embedding generation (SURVEY §7.2 M6): deterministic
    feature-hashing document embeddings — the hashing trick (Weinberger et
    al. 2009): each token hashes to a bucket ``w mod dim`` with sign from an
    independent hash bit, contributions sum per bucket (token multiplicity
    counts), and the vector is L2-normalized.

    Returns the oracle-friendly exploded form ``(id, pos, val)`` with one
    row per RECEIVING bucket (a bucket whose +1/-1 contributions cancel
    still appears, with val 0.0).  Arrow kernel over one scan — the same
    plumbing (tokenize -> batch kernel -> vector column) a neural encoder
    drops into, with the hash replaced by a model forward; token words are
    the same 60-bit sha256 prefixes as the MinHash kernel.
    """
    import pyarrow as pa
    from pyspark.sql import functions as F

    from vectordb_watermark_spark.operators.dedup import _tokenize_ascii
    from vectordb_watermark_spark.operators.partitioning import spread_to_parallelism

    sel = spread_to_parallelism(df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__text")))

    def kernel(batches):
        import hashlib as _hl

        import numpy as np

        memo: dict = {}
        for rb in batches:
            if not rb.num_rows:
                continue
            ids_out, pos_out, val_out = [], [], []
            for rid, text in zip(rb.column(0).to_pylist(), rb.column(1).to_pylist()):
                acc: dict[int, float] = {}
                for t in _tokenize_ascii(text):
                    w = memo.get(t)
                    if w is None:
                        w = int(_hl.sha256(t.encode()).hexdigest()[:15], 16)
                        memo[t] = w
                    b = w % dim
                    acc[b] = acc.get(b, 0.0) + (1.0 if (w // dim) % 2 == 1 else -1.0)
                if not acc:
                    continue
                norm = max(float(np.sqrt(sum(v * v for v in acc.values()))), 1e-12)
                for b in sorted(acc):
                    x = acc[b] / norm
                    # DuckDB round() is half-AWAY-from-zero; Python round()
                    # is half-to-even — on representable ties (e.g. 1/128)
                    # they differ in the 6th decimal and the oracle hash
                    # would diverge.  floor(|x|*1e6 + 0.5) is the faithful
                    # twin over this value range.
                    q = float(np.floor(abs(x) * 1e6 + 0.5)) / 1e6
                    ids_out.append(rid)
                    pos_out.append(b)
                    val_out.append((q if x >= 0 else -q) + 0.0)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids_out, type=pa.int64()),
                    pa.array(pos_out, type=pa.int32()),
                    pa.array(val_out, type=pa.float64()),
                ],
                names=["id", "pos", "val"],
            )

    return sel.mapInArrow(kernel, schema="id long, pos int, val double")


def sql_hash_embed(dim: int = 64) -> str:
    """DuckDB twin of :func:`hash_embed_documents` over ``documents``."""
    from vectordb_watermark_spark.functions.hashing import sql_word60

    w = sql_word60("sha256(t)")
    return f"""
        WITH tok AS (
          SELECT doc_id, unnest({sql_tokens('lower(text)')}) AS t FROM documents
        ), words AS (
          SELECT doc_id, {w} AS w FROM tok
        ), contrib AS (
          SELECT doc_id, CAST(w % {dim} AS INT) AS pos,
                 CASE WHEN (w // {dim}) % 2 = 1 THEN 1.0 ELSE -1.0 END AS s
          FROM words
        ), acc AS (
          SELECT doc_id, pos, sum(s) AS v FROM contrib GROUP BY doc_id, pos
        ), nrm AS (
          SELECT doc_id, greatest(sqrt(sum(v * v)), 1e-12) AS n
          FROM acc GROUP BY doc_id
        )
        SELECT a.doc_id AS id, a.pos, round(a.v / nrm.n, 6) + 0.0 AS val
        FROM acc a JOIN nrm USING (doc_id)"""


def normalize_text(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    form: str = "NFC",
    collapse_ws: bool = True,
):
    """Unicode text normalization — the cleanup stage every corpus pipeline
    runs before dedup/tokenization (C4/CCNet shape): canonical Unicode
    composition (NFC by default; NFKC/NFD/NFKD accepted) plus optional
    whitespace-run collapse + trim.  Two bytewise-different encodings of
    the same text ('e' + COMBINING ACUTE vs the precomposed e-acute) must
    dedup/fingerprint identically — without this pass they silently don't.

    Spark-first split: the whitespace collapse is pure Catalyst
    (``regexp_replace`` in whole-stage codegen, explicit ``[ \\t\\n\\r\\f]``
    class so the Java and RE2 oracle twins agree); only the Unicode
    normalization itself — genuinely not expressible in Catalyst — runs in
    an Arrow-batched ``mapInPandas`` kernel (stdlib ``unicodedata``, no
    external deps).  Returns ``(id, norm_text)``.
    """
    import pandas as pd

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    id_type = df.schema[id_col].dataType.simpleString()
    sel = df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__t"))

    def kernel(batches):
        import unicodedata

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "__id": pdf["__id"],
                    "norm_text": pdf["__t"].map(
                        lambda s: unicodedata.normalize(form, s)
                        if s is not None
                        else None
                    ),
                }
            )

    out = sel.mapInPandas(kernel, schema=f"__id {id_type}, norm_text string")
    norm = F.col("norm_text")
    if collapse_ws:
        norm = F.trim(F.regexp_replace(norm, "[ \\t\\n\\r\\f]+", " "))
    return out.select(F.col("__id").alias(id_col), norm.alias("norm_text"))


# ---------------------------------------------------------------------------
# URL curation (RefinedWeb/C4-style canonicalization: web corpora dedup and
# filter by URL before any content pass — strict dedup by normalized URL is
# RefinedWeb's first pipeline stage)
# ---------------------------------------------------------------------------

#: tracking parameters stripped by url_normalize (the standard analytics
#: noise that makes byte-identical pages look like distinct URLs)
TRACKING_PARAM_RE = "^(utm_[^=]*|fbclid|gclid|msclkid|ref)="


def url_host(url: Column) -> Column:
    """Lowercased host of a URL (userinfo and port excluded); empty string
    when the value does not parse as ``scheme://...``."""
    return F.lower(
        F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://(?:[^@/?#]*@)?([^:/?#]+)", 1)
    )


def url_domain(url: Column) -> Column:
    """:func:`url_host` with a leading ``www.`` stripped — the grouping key
    web-corpus pipelines cap and blocklist by."""
    return F.regexp_replace(url_host(url), r"^www\.", "")


def url_normalize(url: Column, strip_params: str = TRACKING_PARAM_RE) -> Column:
    """Canonical URL: lowercase scheme and authority, drop the fragment,
    drop the scheme's default port (http:80 / https:443), empty path
    becomes ``/``, tracking parameters (``strip_params``, default
    :data:`TRACKING_PARAM_RE`) and empty params removed (remaining params
    keep their order).  Pure Catalyst regexp/array expressions — a
    map-only pass; the DuckDB twin (:func:`sql_url_normalize`) is
    hash-exact.

    The default strips every ``ref=`` param (RefinedWeb practice — it is
    overwhelmingly a referral tag on web corpora); on hosts where ``ref``
    is semantic (e.g. GitHub's ``?ref=branch``) pass a custom
    ``strip_params`` regex without it, same pattern on both twins.

    Simplification (documented): the whole authority is lowercased, which
    also lowercases any userinfo; corpus URLs with userinfo are vanishingly
    rare and usually discarded anyway."""
    scheme = F.lower(F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://", 1))
    auth = F.lower(F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]*)", 1))
    auth = F.when(scheme == "http", F.regexp_replace(auth, ":80$", "")).when(
        scheme == "https", F.regexp_replace(auth, ":443$", "")
    ).otherwise(auth)
    rest = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*([^#]*)", 1)
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(strip_params),
    )
    return F.when(scheme == "", url).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            auth,
            path,
            F.when(
                F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
            ).otherwise(F.lit("")),
        )
    )


def sql_url_host(url_sql: str) -> str:
    """DuckDB twin of :func:`url_host`."""
    return (
        f"lower(regexp_extract({url_sql}, "
        "'^[a-zA-Z][a-zA-Z0-9+.\\-]*://(?:[^@/?#]*@)?([^:/?#]+)', 1))"
    )


def sql_url_domain(url_sql: str) -> str:
    """DuckDB twin of :func:`url_domain`."""
    return f"regexp_replace({sql_url_host(url_sql)}, '^www\\.', '')"


def sql_url_normalize(url_sql: str, strip_params: str = TRACKING_PARAM_RE) -> str:
    """DuckDB twin of :func:`url_normalize` (same regexes).

    ``strip_params`` must be RE2-compatible (DuckDB's regex engine; no
    lookaround) for the twin guarantee to hold — Java's ``rlike`` on the
    Spark side accepts a superset.  Single quotes in the pattern are
    escaped for the SQL literal."""
    strip_params = strip_params.replace("'", "''")
    scheme = f"lower(regexp_extract({url_sql}, '^([a-zA-Z][a-zA-Z0-9+.\\-]*)://', 1))"
    auth0 = f"lower(regexp_extract({url_sql}, '^[a-zA-Z][a-zA-Z0-9+.\\-]*://([^/?#]*)', 1))"
    auth = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({auth0}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({auth0}, ':443$', '') "
        f"ELSE {auth0} END"
    )
    rest = f"regexp_extract({url_sql}, '^[a-zA-Z][a-zA-Z0-9+.\\-]*://[^/?#]*([^#]*)', 1)"
    path = f"(CASE WHEN regexp_extract({rest}, '^([^?]*)', 1) = '' THEN '/' ELSE regexp_extract({rest}, '^([^?]*)', 1) END)"
    query = f"regexp_extract({rest}, '\\?(.*)$', 1)"
    params = (
        f"list_filter(string_split({query}, '&'), "
        f"p -> p <> '' AND NOT regexp_matches(p, '{strip_params}'))"
    )
    return (
        f"CASE WHEN {scheme} = '' THEN {url_sql} ELSE "
        f"{scheme} || '://' || {auth} || {path} || "
        f"(CASE WHEN len({params}) > 0 THEN '?' || array_to_string({params}, '&') ELSE '' END) "
        f"END"
    )
