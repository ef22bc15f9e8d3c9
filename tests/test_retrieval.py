"""BM25 + RRF contracts (operators/retrieval.py): BM25 agrees with a
direct numpy implementation of the Lucene-variant formula on a
hand-built corpus (tf saturation, idf ordering, length normalization),
zero-hit documents are absent, rank/tie-break determinism, and RRF
matches the paper formula with absent-list handling."""

from __future__ import annotations

import math

import pytest

from vectordb_watermark_spark.operators.retrieval import (
    bm25_scores,
    bm25_topk,
    reciprocal_rank_fusion,
)

CORPUS = [
    (1, "data model data data"),
    (2, "data pipeline"),
    (3, "model training loop"),
    (4, "unrelated words entirely"),
    (5, "data data model pipeline pipeline pipeline"),
]


def _bm25_ref(corpus, terms, k1=1.2, b=0.75):
    toks = {i: t.split() for i, t in corpus}
    N = len(corpus)
    avgdl = sum(len(v) for v in toks.values()) / N
    out = {}
    for term in set(terms):
        df = sum(1 for v in toks.values() if term in v)
        if df == 0:
            continue
        idf = math.log(1 + (N - df + 0.5) / (df + 0.5))
        for i, v in toks.items():
            tf = v.count(term)
            if tf == 0:
                continue
            c = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
            out[i] = out.get(i, 0.0) + c
    return {i: round(s, 6) for i, s in out.items()}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_bm25_matches_reference_formula(spark, docs):
    got = {
        r["id"]: r["score"]
        for r in bm25_scores(docs, ["data", "model"]).collect()
    }
    want = _bm25_ref(CORPUS, ["data", "model"])
    assert got == want
    assert 4 not in got  # zero-hit docs absent


def test_bm25_semantics(spark, docs):
    got = {
        r["id"]: r["score"] for r in bm25_scores(docs, ["data"]).collect()
    }
    # tf saturation: doc 1 (tf=3, dl=4) beats doc 2 (tf=1, dl=2)
    assert got[1] > got[2]
    # length normalization is the b knob: at b=0.75 the long tf=2 doc 5
    # loses to the short tf=1 doc 2; with b=0 (no normalization) tf wins
    assert got[5] < got[2]
    got_b0 = {
        r["id"]: r["score"]
        for r in bm25_scores(docs, ["data"], b=0.0).collect()
    }
    assert got_b0[5] > got_b0[2]
    # a term in every doc still contributes positively (+1-smoothed idf)
    all_term = {
        r["id"]: r["score"]
        for r in bm25_scores(
            spark.createDataFrame(
                [(1, "x a"), (2, "x b")], "doc_id long, text string"
            ),
            ["x"],
        ).collect()
    }
    assert all(v > 0 for v in all_term.values())
    with pytest.raises(ValueError, match="empty query_terms"):
        bm25_scores(docs, [])


def test_bm25_topk_rank_and_ties(spark, docs):
    top = bm25_topk(docs, ["data", "model", "pipeline"], k=3).collect()
    assert [r["rank"] for r in top] == [1, 2, 3]
    scores = [r["score"] for r in top]
    assert scores == sorted(scores, reverse=True)
    # unknown-only terms -> empty result, not an error
    assert bm25_topk(docs, ["zzzznotfound"], k=3).count() == 0


def test_rrf_matches_formula_and_handles_absence(spark):
    a = spark.createDataFrame([(10, 1), (11, 2), (12, 3)], "id long, rank int")
    b = spark.createDataFrame([(11, 1), (13, 2)], "id long, rank int")
    got = {
        r["id"]: (r["rrf"], r["rank"])
        for r in reciprocal_rank_fusion([a, b], k=60).collect()
    }
    want = {
        10: 1 / 61,
        11: 1 / 62 + 1 / 61,
        12: 1 / 63,
        13: 1 / 62,
    }
    for i, s in want.items():
        assert got[i][0] == pytest.approx(round(s, 9), abs=1e-12)
    # fused order: 11 (in both lists) first
    assert got[11][1] == 1
    order = sorted(got.items(), key=lambda kv: kv[1][1])
    assert [i for i, _ in order] == [11, 10, 13, 12]
    # top cut
    cut = reciprocal_rank_fusion([a, b], k=60, top=2).collect()
    assert {r["id"] for r in cut} == {11, 10}
    with pytest.raises(ValueError, match="no rankings"):
        reciprocal_rank_fusion([])
    with pytest.raises(ValueError, match="k must be"):
        reciprocal_rank_fusion([a], k=0)


def test_bm25_index_parity_with_oneshot(spark, docs, tmp_path):
    """The persisted-postings path returns EXACTLY the one-shot scores
    (same expression shapes -> bit-identical doubles at the shared
    rounding), across multiple queries against one build."""
    from vectordb_watermark_spark.operators.retrieval import (
        bm25_build_index,
        bm25_query_index,
    )

    idx = str(tmp_path / "bm25_idx")
    bm25_build_index(docs, idx, n_files=4)
    for terms in (["data", "model"], ["pipeline"], ["data", "zzz_absent"]):
        got = {
            r["id"]: r["score"]
            for r in bm25_query_index(spark, idx, terms).collect()
        }
        want = {
            r["id"]: r["score"]
            for r in bm25_scores(docs, terms).collect()
        }
        assert got == want, terms

    # layout invariants: postings term-sorted per file, sidecars bounded,
    # everything under a batch=full tag (shared with append/stream)
    post = spark.read.parquet(f"{idx}/postings")
    assert sorted(post.columns) == ["batch", "dl", "id", "t", "tf"]
    assert post.select("batch").distinct().collect()[0]["batch"] == "full"
    stats = spark.read.parquet(f"{idx}/corpus_stats").collect()
    assert len(stats) == 1 and stats[0]["n_docs"] == 5
    tstats = spark.read.parquet(f"{idx}/term_stats")
    assert tstats.count() == post.select("t").distinct().count()

    with pytest.raises(ValueError, match="empty query_terms"):
        bm25_query_index(spark, idx, [])


def test_bm25_index_query_prunes_scan(spark, docs, tmp_path):
    """Query-time plan contract: the term predicate is PUSHED to the
    postings parquet scan (file pruning via the build-time term-range
    sort) and the original documents table is not in the plan at all."""
    from vectordb_watermark_spark.operators.retrieval import (
        bm25_build_index,
        bm25_query_index,
    )

    idx = str(tmp_path / "bm25_idx_plan")
    bm25_build_index(docs, idx, n_files=4)
    q = bm25_query_index(spark, idx, ["data", "model"])
    import contextlib
    import io
    import re

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    # the only file scans are the index sidecars + postings
    assert "postings" in plan
    assert "documents" not in plan and "text" not in plan
    # pushed term filter on the postings scan
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any("In(t" in p for p in pushed), plan


def test_bm25_append_and_stream_equal_oneshot(spark, docs, tmp_path):
    """Append and streaming maintenance both produce BIT-IDENTICAL
    scores to a one-shot build over the union (integer sidecar partials
    merge exactly); a replayed batch tag overwrites, never
    double-counts."""
    import shutil

    from vectordb_watermark_spark.operators.retrieval import (
        bm25_append_index,
        bm25_build_index,
        bm25_query_index,
    )
    from vectordb_watermark_spark.streaming.curation import (
        incremental_postings,
    )

    extra = [
        (6, "data shard streaming data"),
        (7, "pipeline model data batch"),
    ]
    all_rows = CORPUS + extra
    terms = ["data", "model", "pipeline"]

    # ground truth: one-shot build over the union
    full = spark.createDataFrame(all_rows, "doc_id long, text string")
    ref_idx = str(tmp_path / "bm25_full")
    bm25_build_index(full, ref_idx, n_files=4)
    want = {
        r["id"]: r["score"]
        for r in bm25_query_index(spark, ref_idx, terms).collect()
    }

    # batch build + append path
    idx = str(tmp_path / "bm25_appended")
    bm25_build_index(docs, idx, n_files=4)
    extra_df = spark.createDataFrame(extra, "doc_id long, text string")
    bm25_append_index(extra_df, idx, "append-1", n_files=2)
    got = {
        r["id"]: r["score"]
        for r in bm25_query_index(spark, idx, terms).collect()
    }
    assert got == want
    # tag replay overwrites its own batch — no double count
    bm25_append_index(extra_df, idx, "append-1", n_files=2)
    got2 = {
        r["id"]: r["score"]
        for r in bm25_query_index(spark, idx, terms).collect()
    }
    assert got2 == want
    with pytest.raises(ValueError, match="invalid batch tag"):
        bm25_append_index(extra_df, idx, "bad=tag")

    # streaming path: one file per micro-batch
    src = tmp_path / "docs_src"
    src.mkdir()
    for name, rows in (("a", all_rows[:3]), ("b", all_rows[3:5]),
                       ("c", all_rows[5:])):
        stage = tmp_path / f"docs_stage_{name}"
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(1)\
            .write.parquet(str(stage))
        part = next(p for p in stage.glob("part-*.parquet"))
        shutil.copy(part, src / f"{name}.parquet")
    sidx = str(tmp_path / "bm25_streamed")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = incremental_postings(
        stream, sidx, str(tmp_path / "bm25_ckpt"), n_files=2
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)
    tags = {
        r["batch"]
        for r in spark.read.parquet(f"{sidx}/postings")
        .select("batch").distinct().collect()
    }
    assert len(tags) == 3 and all(t.startswith("stream-") for t in tags)
    got_s = {
        r["id"]: r["score"]
        for r in bm25_query_index(spark, sidx, terms).collect()
    }
    assert got_s == want


def test_bm25_batch_query_equals_single(spark, docs, tmp_path):
    """The one-scan batch path is per-query EQUAL to the single path
    (same expression shapes, same merged idf) and validates its input."""
    from vectordb_watermark_spark.operators.retrieval import (
        bm25_build_index,
        bm25_query_index,
        bm25_query_index_batch,
    )

    idx = str(tmp_path / "bm25_batch_idx")
    bm25_build_index(docs, idx, n_files=4)
    queries = {
        0: ["data", "model"],
        1: ["pipeline"],
        2: ["data", "pipeline", "zzz_absent"],
    }
    got = {}
    for r in bm25_query_index_batch(spark, idx, queries).collect():
        got.setdefault(int(r["qid"]), {})[int(r["id"])] = r["score"]
    for qid, terms in queries.items():
        want = {
            int(r["id"]): r["score"]
            for r in bm25_query_index(spark, idx, terms).collect()
        }
        assert got.get(qid, {}) == want, qid

    with pytest.raises(ValueError, match="empty query block"):
        bm25_query_index_batch(spark, idx, {})
    with pytest.raises(ValueError, match="empty query_terms"):
        bm25_query_index_batch(spark, idx, {0: []})


def _rm3_ref(corpus, terms, k_docs, n_terms, ow=0.5):
    # python reference of the full RM3 chain on rounded bm25 scores
    scores = _bm25_ref(corpus, terms)
    scores = {i: round(s, 6) for i, s in scores.items()}
    fb = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k_docs]
    s_tot = sum(s for _, s in fb)
    toks = {i: t.split() for i, t in corpus}
    rm = {}
    for i, s in fb:
        w = s / s_tot
        dl = len(toks[i])
        for t in set(toks[i]):
            rm[t] = rm.get(t, 0.0) + toks[i].count(t) / dl * w
    rm_tot = sum(rm.values())
    q = 1.0 / len(set(terms))
    wt = {
        t: round(ow * (q if t in terms else 0.0) + (1 - ow) * rm[t] / rm_tot, 9)
        for t in rm
    }
    return sorted(wt.items(), key=lambda kv: (-kv[1], kv[0]))[:n_terms]


def test_rm3_matches_reference(spark):
    from vectordb_watermark_spark.operators.retrieval import rm3_expansion

    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = rm3_expansion(df, ["data", "model"], k_docs=3, n_terms=6).collect()
    ref = _rm3_ref(CORPUS, ["data", "model"], 3, 6)
    assert [(r["term"], r["weight"]) for r in got] == [
        (t, pytest.approx(w, abs=1e-9)) for t, w in ref
    ]
    # original terms flagged; expansion terms come from feedback docs only
    flags = {r["term"]: r["is_original"] for r in got}
    assert flags["data"] and flags["model"]
    assert not flags.get("pipeline", False)
    assert "unrelated" not in flags  # doc 4 never makes the feedback set


def test_rm3_validation(spark):
    from vectordb_watermark_spark.operators.retrieval import rm3_expansion

    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    with pytest.raises(ValueError, match="k_docs"):
        rm3_expansion(df, ["data"], k_docs=0)
    with pytest.raises(ValueError, match="orig_weight"):
        rm3_expansion(df, ["data"], orig_weight=1.5)


def _mmr_ref(rows, k, lam):
    import numpy as np

    rows = sorted(rows, key=lambda r: r[0])
    ids = np.array([r[0] for r in rows])
    rel = np.array([r[1] for r in rows], dtype=np.float64)
    V = np.stack([np.asarray(r[2], dtype=np.float64) for r in rows])
    V = V / (np.linalg.norm(V, axis=1, keepdims=True) + 1e-12)
    S = V @ V.T
    picks, max_sim = [], np.zeros(len(ids))
    alive = np.ones(len(ids), dtype=bool)
    for _ in range(min(k, len(ids))):
        obj = lam * rel - (1 - lam) * (max_sim if picks else 0.0)
        obj = np.where(alive, obj, -np.inf)
        i = int(np.argmax(obj))
        picks.append(int(ids[i]))
        alive[i] = False
        max_sim = np.maximum(max_sim, S[:, i])
    return picks


def test_mmr_diversifies_and_matches_bruteforce(spark):
    import numpy as np

    from vectordb_watermark_spark.operators.retrieval import mmr_rerank

    rng = np.random.default_rng(13)
    # two queries; query 0 has a clone pair (docs 0/1 identical vectors,
    # both high-rel): MMR must NOT pick both in the top ranks
    base = rng.normal(0, 1, (12, 8))
    base[1] = base[0]
    groups = {0: [], 1: []}
    for q in (0, 1):
        for d in range(12):
            rel = 0.95 if (q == 0 and d in (0, 1)) else float(rng.uniform(0.1, 0.8))
            groups[q].append((d + 100 * q, rel, (base[d] if q == 0 else rng.normal(0, 1, 8)).tolist()))
    cand = spark.createDataFrame(
        [(q, i, r, v) for q, rows in groups.items() for i, r, v in rows],
        "qid long, doc_id long, rel double, emb array<double>",
    )
    out = mmr_rerank(cand, k=5, lam=0.5)
    got = {
        q: [r["doc_id"] for r in sorted(
            [x for x in out.collect() if x["qid"] == q], key=lambda r: r["mmr_rank"]
        )]
        for q in (0, 1)
    }
    for q in (0, 1):
        assert got[q] == _mmr_ref(groups[q], 5, 0.5)
    # the clone (doc 1) is NOT adjacent to doc 0 despite equal relevance
    assert got[0][0] == 0 and got[0][1] != 1


def test_mmr_validation_and_small_group(spark):
    from vectordb_watermark_spark.operators.retrieval import mmr_rerank

    cand = spark.createDataFrame(
        [(0, 1, 0.9, [1.0, 0.0]), (0, 2, 0.5, [0.0, 1.0])],
        "qid long, doc_id long, rel double, emb array<double>",
    )
    rows = mmr_rerank(cand, k=10, lam=0.7).collect()  # k > group size
    assert sorted(r["mmr_rank"] for r in rows) == [1, 2]
    with pytest.raises(ValueError, match="lam"):
        mmr_rerank(cand, lam=-0.1)
    with pytest.raises(ValueError, match="k must"):
        mmr_rerank(cand, k=0)
