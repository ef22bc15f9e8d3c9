"""Cross-engine fuzz: every text-expression twin must agree between Spark
(Catalyst) and DuckDB on ARBITRARY text, not just the driver corpus.  The
oracle gate hash-checks the fixed testdata; this suite feeds
hypothesis-generated strings (whitespace runs, unicode-ish punctuation,
numbers, empty/one-token edge cases) through both engines and compares
value-for-value — the test that catches regex-dialect or list-function
drift before it reaches a gate failure.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from vectordb_watermark_spark.functions import text as T

# printable-ascii word soup with explicit whitespace variety; hypothesis
# shrinks failures to minimal examples
_word = st.text(
    alphabet=st.sampled_from("abcdefgzy019.,!?;@-+%_"), min_size=0, max_size=8
)
_texts = st.lists(
    st.lists(_word, min_size=0, max_size=12).map(lambda ws: " \t ".join(ws)),
    min_size=1,
    max_size=8,
)

_PAIRS = [
    ("n_tokens", lambda c: T.token_count(c), T.sql_token_count),
    ("n_words", lambda c: T.word_count_regex(c), T.sql_word_count_regex),
    ("n_punct", lambda c: T.punct_count(c), T.sql_punct_count),
    ("n_stop", lambda c: T.stopword_count(c), T.sql_stopword_count),
    ("quality", lambda c: T.quality_score(c) + F.lit(0.0), lambda t: f"{T.sql_quality_score(t)} + 0.0"),
    ("lang", lambda c: T.lang_id(c), T.sql_lang_id),
    ("dup_tok", lambda c: T.dup_token_fraction(c) + F.lit(0.0), lambda t: f"{T.sql_dup_token_fraction(t)} + 0.0"),
    ("top_bg", lambda c: T.top_bigram_fraction(c) + F.lit(0.0), lambda t: f"{T.sql_top_bigram_fraction(t)} + 0.0"),
    ("mean_tl", lambda c: T.mean_token_len(c) + F.lit(0.0), lambda t: f"{T.sql_mean_token_len(t)} + 0.0"),
]


@pytest.fixture(scope="module")
def fuzz_con():
    con = duckdb.connect()
    yield con
    con.close()


@given(_texts)
@settings(max_examples=30, deadline=None)
def test_text_twins_agree_on_arbitrary_text(spark, fuzz_con, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = (
        df.select(
            "doc_id", *[fn(F.col("text")).alias(name) for name, fn, _ in _PAIRS]
        )
        .orderBy("doc_id")
        .collect()
    )
    fuzz_con.execute("CREATE OR REPLACE TABLE fuzz(doc_id INT, text VARCHAR)")
    fuzz_con.executemany("INSERT INTO fuzz VALUES (?, ?)", rows)
    sql = "SELECT doc_id, " + ", ".join(
        f"{sql_fn('text')} AS {name}" for name, _, sql_fn in _PAIRS
    ) + " FROM fuzz ORDER BY doc_id"
    want = fuzz_con.execute(sql).fetchall()
    for g, w in zip(got, want):
        for (name, _, _), gv, wv in zip(_PAIRS, list(g)[1:], list(w)[1:]):
            if isinstance(gv, float) or isinstance(wv, float):
                assert gv == pytest.approx(wv, abs=1e-9), (name, g["doc_id"], gv, wv, texts[g["doc_id"]])
            else:
                assert gv == wv, (name, g["doc_id"], gv, wv, texts[g["doc_id"]])


_pii_text = st.lists(
    st.sampled_from([
        "plain words here", "a.b+c@ex-site.org", "b@x.io,", "x@y", "@@",
        "+1 555-0100", "(415) 555 2671", "12345678901", "555", "a@b.co end",
        "tel: +44 (0) 20 7946 0958 ok", "dot.dot@sub.domain.example.com",
    ]),
    min_size=1, max_size=6,
).map(" ".join)


@given(st.lists(_pii_text, min_size=1, max_size=6))
@settings(max_examples=30, deadline=None)
def test_pii_twins_agree(spark, fuzz_con, texts):
    """Email/phone patterns must behave identically under Java regex (Spark)
    and RE2 (DuckDB) — counts AND the redacted strings themselves."""
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    n_email, n_phone = T.pii_counts(F.col("text"))
    got = (
        df.select("doc_id", n_email.alias("e"), n_phone.alias("p"),
                  T.redact_pii(F.col("text")).alias("red"))
        .orderBy("doc_id").collect()
    )
    fuzz_con.execute("CREATE OR REPLACE TABLE fz2(doc_id INT, text VARCHAR)")
    fuzz_con.executemany("INSERT INTO fz2 VALUES (?, ?)", rows)
    pii = T.sql_pii("text")
    want = fuzz_con.execute(
        f"SELECT doc_id, {pii['n_email']} AS e, {pii['n_phone']} AS p, "
        f"{pii['redacted']} AS red FROM fz2 ORDER BY doc_id"
    ).fetchall()
    for g, w in zip(got, want):
        assert (g["e"], g["p"], g["red"]) == (w[1], w[2], w[3]), texts[g["doc_id"]]


@given(st.lists(st.integers(0, 2**40), min_size=1, max_size=20, unique=True))
@settings(max_examples=30, deadline=None)
def test_keyed_hash_twins_agree(spark, fuzz_con, ids):
    """keyed_uniform / word60 — the engine's only 'randomness' — must be
    bit-identical across engines for arbitrary ids."""
    from vectordb_watermark_spark.functions import hashing as H

    df = spark.createDataFrame([(i,) for i in ids], "id long")
    hexc = H.keyed_hash_hex("fz", F.col("id"))
    got = (
        df.select("id", H.hash_uniform(hexc).alias("u"), H.word60(hexc).alias("w"))
        .orderBy("id").collect()
    )
    fuzz_con.execute("CREATE OR REPLACE TABLE fz3(id BIGINT)")
    fuzz_con.executemany("INSERT INTO fz3 VALUES (?)", [(i,) for i in ids])
    hx = H.sql_keyed_hash_hex("'fz'", "id")
    want = fuzz_con.execute(
        f"SELECT id, {H.sql_hash_uniform(hx)} AS u, {H.sql_word60(hx)} AS w "
        "FROM fz3 ORDER BY id"
    ).fetchall()
    for g, w in zip(got, want):
        assert g["u"] == pytest.approx(w[1], abs=0) and g["w"] == w[2], g["id"]
