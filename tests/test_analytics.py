"""Contracts for operators/analytics.py and graph.triangle_count:
hand-computed funnels (strict ordering, repeat events), pandas
brute-force retention cohorts, transition tie-breaks, numpy-reference
NDCG/MRR, tie-aware AUC vs a rank-based reference, PSI identity/shift
behavior, and triangle counts vs an itertools brute force."""

from __future__ import annotations

import datetime as dt
import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectordb_watermark_spark.operators.analytics import (
    event_transitions,
    funnel,
    ndcg_at_k,
    psi_per_dim,
    retention_cohorts,
    roc_auc,
)
from vectordb_watermark_spark.operators.graph import triangle_count


def _ts(day, hour=0, minute=0):
    return dt.datetime(2024, 1, day, hour, minute)


@pytest.fixture(scope="module")
def toy_events(spark):
    # user 1: full ordered funnel; user 2: click before view (step 2 only
    # after the later view? no - no click after view); user 3: view+click
    # same ts (strict > excludes); user 4: view only; user 5: two funnels
    # worth of events (first-qualifying wins, still one user)
    rows = [
        (0, _ts(1), 1, "view"), (1, _ts(2), 1, "click"), (2, _ts(3), 1, "purchase"),
        (3, _ts(1), 2, "click"), (4, _ts(2), 2, "view"), (5, _ts(3), 2, "purchase"),
        (6, _ts(5), 3, "view"), (7, _ts(5), 3, "click"),
        (8, _ts(1), 4, "view"),
        (9, _ts(1), 5, "view"), (10, _ts(2), 5, "click"), (11, _ts(3), 5, "view"),
        (12, _ts(4), 5, "click"), (13, _ts(5), 5, "purchase"),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_funnel_strict_ordering(toy_events):
    out = {
        (r["step"], r["step_type"]): r["n_users"]
        for r in funnel(toy_events, ["view", "click", "purchase"]).collect()
    }
    # view: users 1,2,3,4,5; click after view: 1,5 (2 clicked before view,
    # 3 clicked at the same instant); purchase after that click: 1,5
    assert out == {(1, "view"): 5, (2, "click"): 2, (3, "purchase"): 2}


def test_funnel_user2_no_requalify(toy_events):
    # user 2 purchases at t3 but never clicked after viewing -> 0 at step 3
    out = {
        r["step"]: r["n_users"]
        for r in funnel(toy_events, ["view", "click"]).collect()
    }
    assert out[2] == 2


def test_funnel_single_step(toy_events):
    [row] = funnel(toy_events, ["purchase"]).collect()
    assert (row["step"], row["step_type"], row["n_users"]) == (1, "purchase", 3)


def test_funnel_validation(toy_events):
    with pytest.raises(ValueError, match="at least one"):
        funnel(toy_events, [])
    with pytest.raises(ValueError, match="distinct"):
        funnel(toy_events, ["view", "view"])


@pytest.fixture(scope="module")
def cohort_events(spark):
    # two weekly cohorts (w0 starts Mon 2024-01-01, w1 Mon 2024-01-08);
    # user 1,2 cohort w0; user 3 cohort w1; activity spread over 3 weeks
    rows = [
        (0, _ts(2), 1, "view"), (1, _ts(9), 1, "view"), (2, _ts(16), 1, "view"),
        (3, _ts(3), 2, "view"), (4, _ts(17), 2, "view"),
        (5, _ts(10), 3, "view"), (6, _ts(16), 3, "view"),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_retention_weekly(cohort_events):
    out = {
        (str(r["cohort"]), r["offset"]): (r["n_active"], r["n_cohort"], r["retention"])
        for r in retention_cohorts(cohort_events).collect()
    }
    assert out[("2024-01-01", 0)] == (2, 2, 1.0)
    assert out[("2024-01-01", 1)] == (1, 2, 0.5)
    assert out[("2024-01-01", 2)] == (2, 2, 1.0)
    assert out[("2024-01-08", 0)] == (1, 1, 1.0)
    assert out[("2024-01-08", 1)] == (1, 1, 1.0)
    assert len(out) == 5


def test_retention_daily(cohort_events):
    out = {
        (str(r["cohort"]), r["offset"]): r["n_active"]
        for r in retention_cohorts(cohort_events, granularity="day").collect()
    }
    assert out[("2024-01-02", 0)] == 1
    assert out[("2024-01-02", 7)] == 1
    assert out[("2024-01-02", 14)] == 1


def test_retention_validation(cohort_events):
    with pytest.raises(ValueError, match="granularity"):
        retention_cohorts(cohort_events, granularity="hour")


def test_transitions_counts_and_prob(spark):
    rows = [
        # user 1: a -> b -> a ; user 2: a -> b ; tie at t1 broken by id
        (0, _ts(1), 1, "a"), (1, _ts(2), 1, "b"), (2, _ts(3), 1, "a"),
        (3, _ts(1, 1), 2, "a"), (4, _ts(1, 1), 2, "b"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {
        (r["from_type"], r["to_type"]): (r["n"], r["prob"])
        for r in event_transitions(ev).collect()
    }
    assert out[("a", "b")] == (2, 1.0)
    assert out[("b", "a")] == (1, 1.0)
    assert len(out) == 2


def _ndcg_ref(run, qrels, k):
    # run: {qid: [(doc, score)]}, qrels: {(qid, doc): rel}
    out = {}
    for qid, docs in run.items():
        ranked = sorted(docs, key=lambda p: (-p[1], p[0]))[:k]
        dcg = sum(
            (2 ** qrels.get((qid, d), 0) - 1) / np.log2(i + 2)
            for i, (d, _) in enumerate(ranked)
        )
        rels = sorted(
            (r for (q, _), r in qrels.items() if q == qid and r > 0), reverse=True
        )[:k]
        idcg = sum((2 ** r - 1) / np.log2(i + 2) for i, r in enumerate(rels))
        rr = 0.0
        for i, (d, _) in enumerate(ranked):
            if qrels.get((qid, d), 0) > 0:
                rr = 1.0 / (i + 1)
                break
        if idcg > 0:
            out[qid] = (dcg, idcg, dcg / idcg, rr)
    return out


def test_ndcg_against_numpy(spark):
    rng = np.random.default_rng(7)
    run = {
        q: [(d, float(rng.integers(0, 50))) for d in range(30)] for q in range(4)
    }
    qrels = {
        (q, d): int(rng.integers(0, 3)) for q in range(4) for d in range(0, 30, 3)
    }
    results = spark.createDataFrame(
        [(q, d, s) for q, docs in run.items() for d, s in docs],
        "qid long, doc_id long, score double",
    )
    labels = spark.createDataFrame(
        [(q, d, r) for (q, d), r in qrels.items()], "qid long, doc_id long, rel int"
    )
    got = {r["qid"]: r for r in ndcg_at_k(results, labels, k=10).collect()}
    ref = _ndcg_ref(run, qrels, 10)
    assert set(got) == set(ref)
    for q, (dcg, idcg, ndcg, rr) in ref.items():
        assert got[q]["dcg"] == pytest.approx(dcg, abs=1e-6)
        assert got[q]["idcg"] == pytest.approx(idcg, abs=1e-6)
        assert got[q]["ndcg"] == pytest.approx(ndcg, abs=1e-6)
        assert got[q]["rr"] == pytest.approx(rr, abs=1e-9)


def test_ndcg_no_positive_labels_dropped(spark):
    results = spark.createDataFrame(
        [(0, 1, 5.0), (1, 1, 5.0)], "qid long, doc_id long, score double"
    )
    qrels = spark.createDataFrame(
        [(0, 1, 1), (1, 1, 0)], "qid long, doc_id long, rel int"
    )
    rows = ndcg_at_k(results, qrels, k=5).collect()
    assert [r["qid"] for r in rows] == [0]
    with pytest.raises(ValueError, match="k must be"):
        ndcg_at_k(results, qrels, k=0)


def _auc_ref(labels, scores):
    # midrank Mann-Whitney
    order = np.argsort(scores, kind="stable")
    s, l = np.asarray(scores)[order], np.asarray(labels)[order]
    ranks = np.empty(len(s))
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        ranks[i:j] = (i + j + 1) / 2.0
        i = j
    pos = l == 1
    return (ranks[pos].sum() - pos.sum() * (pos.sum() + 1) / 2) / (
        pos.sum() * (~pos).sum()
    )


def test_roc_auc_with_ties(spark):
    rng = np.random.default_rng(11)
    labels = rng.integers(0, 2, 400).tolist()
    scores = (rng.integers(0, 20, 400) / 2.0).tolist()  # heavy ties
    df = spark.createDataFrame(
        list(zip(labels, scores)), "label int, score double"
    )
    [row] = roc_auc(df).collect()
    assert row["auc"] == pytest.approx(_auc_ref(labels, scores), abs=1e-9)
    assert row["n_pos"] == sum(labels)
    assert row["n_neg"] == len(labels) - sum(labels)


def test_roc_auc_perfect_and_inverted(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (1, 9.0), (0, 2.0), (0, 1.0)], "label int, score double"
    )
    assert roc_auc(df).collect()[0]["auc"] == 1.0
    inv = spark.createDataFrame(
        [(0, 10.0), (0, 9.0), (1, 2.0), (1, 1.0)], "label int, score double"
    )
    assert roc_auc(inv).collect()[0]["auc"] == 0.0


def _psi_ref(base, cand, edges):
    nb = np.histogram(base, bins=[-np.inf] + edges + [np.inf])[0]
    nc = np.histogram(cand, bins=[-np.inf] + edges + [np.inf])[0]
    k = len(edges) + 1
    p = (nb + 0.5) / (nb.sum() + 0.5 * k)
    q = (nc + 0.5) / (nc.sum() + 0.5 * k)
    return float(np.sum((p - q) * np.log(p / q)))


def test_psi_identity_and_shift(spark):
    rng = np.random.default_rng(3)
    base = rng.normal(0, 0.15, (300, 2)).astype(np.float32)
    shifted = base.copy()
    shifted[:, 1] += 0.25  # dim 1 drifts, dim 0 identical
    b = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(base)], "id long, emb array<float>"
    )
    c = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(shifted)], "id long, emb array<float>"
    )
    out = {r["dim"]: r["psi"] for r in psi_per_dim(b, c, vec_col="emb").collect()}
    edges = [-0.4, -0.3, -0.2, -0.1, 0.0, 0.1, 0.2, 0.3, 0.4]
    for d in (0, 1):
        ref = _psi_ref(
            base[:, d].astype(np.float64), shifted[:, d].astype(np.float64), edges
        )
        assert out[d] == pytest.approx(ref, abs=1e-5)
    assert out[0] == pytest.approx(0.0, abs=1e-9)
    assert out[1] > 0.2  # conventional drift-action threshold


def _tri_ref(edges):
    nodes = sorted({x for e in edges for x in e})
    eset = {frozenset(e) for e in edges if e[0] != e[1]}
    per = {n: 0 for n in nodes}
    total = 0
    for a, b, c in itertools.combinations(nodes, 3):
        if (
            frozenset((a, b)) in eset
            and frozenset((b, c)) in eset
            and frozenset((a, c)) in eset
        ):
            total += 1
            per[a] += 1
            per[b] += 1
            per[c] += 1
    return total, {n: k for n, k in per.items() if k}


def test_triangles_k4(spark):
    edges = [(a, b) for a in range(4) for b in range(4) if a != b]  # directed K4
    df = spark.createDataFrame(edges, "src long, dst long")
    assert triangle_count(df).collect()[0]["n_triangles"] == 4
    per = {r["node"]: r["n_triangles"] for r in triangle_count(df, per_node=True).collect()}
    assert per == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangles_random_vs_bruteforce(spark):
    rng = np.random.default_rng(5)
    edges = {
        (int(a), int(b))
        for a, b in rng.integers(0, 30, (200, 2))
        if a != b
    }
    total, per_ref = _tri_ref(list(edges))
    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    assert triangle_count(df).collect()[0]["n_triangles"] == total
    per = {r["node"]: r["n_triangles"] for r in triangle_count(df, per_node=True).collect()}
    assert per == per_ref


def test_calibration_curve_and_ece(spark):
    from vectordb_watermark_spark.operators.analytics import (
        calibration_curve,
        expected_calibration_error,
    )

    # scores 0.05 (bin 0) with 1/4 pos, 0.95 (bin 9) with 3/4 pos, 1.0 folds
    # into bin 9
    rows = [(1, 0.05), (0, 0.05), (0, 0.05), (0, 0.05),
            (1, 0.95), (1, 0.95), (1, 0.95), (0, 0.95), (1, 1.0)]
    df = spark.createDataFrame(rows, "label int, score double")
    out = {r["bin"]: r for r in calibration_curve(df, n_bins=10).collect()}
    assert set(out) == {0, 9}
    assert out[0]["n"] == 4 and out[0]["frac_pos"] == 0.25
    assert out[9]["n"] == 5 and out[9]["frac_pos"] == 0.8
    assert out[9]["mean_score"] == pytest.approx((0.95 * 4 + 1.0) / 5, abs=1e-6)
    [e] = expected_calibration_error(df, n_bins=10).collect()
    ms0, fp0 = 0.05, 0.25
    ms9, fp9 = (0.95 * 4 + 1.0) / 5, 0.8
    ref = (4 * abs(fp0 - ms0) + 5 * abs(fp9 - ms9)) / 9
    assert e["ece"] == pytest.approx(ref, abs=1e-6)
    assert e["n_rows"] == 9
    with pytest.raises(ValueError, match="n_bins"):
        calibration_curve(df, n_bins=0)


def test_key_skew_stats(spark):
    from vectordb_watermark_spark.operators.partitioning import key_skew_stats

    # key 0 has 6 rows, keys 1..4 one each -> 10 rows, 5 keys, max 6
    rows = [(0,)] * 6 + [(1,), (2,), (3,), (4,)]
    df = spark.createDataFrame(rows, "k long")
    [r] = key_skew_stats(df, "k").collect()
    assert (r["n_rows"], r["n_keys"], r["max_key_n"]) == (10, 5, 6)
    assert r["top1_share_ppm"] == 600000
    assert r["skew_ratio_ppm"] == 3000000  # 6 / (10/5) = 3x


def test_check_expectations(spark):
    from vectordb_watermark_spark.operators.quality import check_expectations

    rows = [
        (1, "aa", 5.0), (2, "ab", 15.0), (2, None, 5.0), (4, "zz", -1.0),
    ]
    df = spark.createDataFrame(rows, "id long, s string, v double")
    out = {
        r["rule_id"]: r
        for r in check_expectations(df, [
            {"type": "not_null", "col": "s"},
            {"type": "unique", "col": "id"},
            {"type": "in_range", "col": "v", "min": 0, "max": 10},
            {"type": "in_set", "col": "s", "values": ["aa", "ab"]},
            {"type": "matches", "col": "s", "pattern": "^a"},
            {"type": "min_rows", "n": 10},
            {"type": "expr", "name": "v_pos", "expr": "v > 0"},
        ]).collect()
    }
    assert out["r0"]["n_violations"] == 1 and not out["r0"]["passed"]
    assert out["r1"]["n_violations"] == 1  # id=2 twice -> 1 surplus copy
    assert out["r2"]["n_violations"] == 2  # 15.0 and -1.0
    assert out["r3"]["n_violations"] == 1  # zz (null doesn't count)
    assert out["r4"]["n_violations"] == 1  # zz
    assert out["r5"]["n_violations"] == 6  # shortfall to 10
    assert out["r6"]["n_violations"] == 1  # v=-1
    assert all(r["n_rows"] == 4 for r in out.values())
    with pytest.raises(ValueError, match="at least one"):
        check_expectations(df, [])
    with pytest.raises(ValueError, match="unknown expectation"):
        check_expectations(df, [{"type": "nope"}])


def test_incremental_transitions_matches_batch(spark, tmp_path):
    """Streaming transition-matrix maintenance: after every micro-batch,
    resolve_transitions equals batch event_transitions over everything
    streamed so far (cross-batch boundary pairs included); a replayed
    batch (checkpoint retry) rewrites its own contribution idempotently;
    an empty store resolves empty."""
    import shutil

    from vectordb_watermark_spark.operators.analytics import event_transitions
    from vectordb_watermark_spark.streaming.curation import (
        incremental_transitions,
        ingest_transitions_batch,
        resolve_transitions,
    )

    schema = "event_id long, ts timestamp, user_id long, event_type string"
    batches = [
        # user 1: a b | user 2: a
        [(0, _ts(1), 1, "a"), (1, _ts(2), 1, "b"), (2, _ts(2), 2, "a")],
        # boundary pairs: u1 b->c, u2 a->a; new user 3
        [(3, _ts(3), 1, "c"), (4, _ts(4), 2, "a"), (5, _ts(3), 3, "b")],
        # u3 b->a, u1 c->a
        [(6, _ts(5), 3, "a"), (7, _ts(6), 1, "a")],
    ]

    store = str(tmp_path / "tr_store")
    src = tmp_path / "tr_src"
    src.mkdir()

    def batch_truth(rows):
        df = spark.createDataFrame(rows, schema)
        return {
            (r["from_type"], r["to_type"]): (r["n"], r["prob"])
            for r in event_transitions(df).collect()
        }

    assert resolve_transitions(spark, store).count() == 0

    seen = []
    for i, rows in enumerate(batches):
        stage = tmp_path / f"tr_stage_{i}"
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(stage))
        part = next(p for p in stage.glob("part-*.parquet"))
        shutil.copy(part, src / f"{i}.parquet")
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = incremental_transitions(
            stream, store, str(tmp_path / "tr_ck")
        ).trigger(availableNow=True).start()
        q.awaitTermination(240)
        seen += rows
        got = {
            (r["from_type"], r["to_type"]): (r["n"], r["prob"])
            for r in resolve_transitions(spark, store).collect()
        }
        assert got == batch_truth(seen), f"after batch {i}"

    # checkpoint-retry simulation: re-ingest batch 1 under its batch id —
    # it must overwrite exactly its own contribution, changing nothing
    ingest_transitions_batch(
        spark.createDataFrame(batches[1], schema), store, 1
    )
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["prob"])
        for r in resolve_transitions(spark, store).collect()
    }
    assert got == batch_truth(seen)

    # empty batch is a no-op (no pairs/state dirs written for its id)
    ingest_transitions_batch(spark.createDataFrame([], schema), store, 9)
    got2 = {
        (r["from_type"], r["to_type"]): (r["n"], r["prob"])
        for r in resolve_transitions(spark, store).collect()
    }
    assert got2 == got


def test_funnel_composite_entity(spark):
    from vectordb_watermark_spark.operators.analytics import funnel

    # same user, two sessions: session 1 converts view->click, session 2
    # has click BEFORE view (no conversion).  Per-user funnel would count
    # the user once; per-(user, session) counts exactly one converting
    # session.
    rows = [
        (0, _ts(1), 1, 1, "view"), (1, _ts(2), 1, 1, "click"),
        (2, _ts(3), 1, 2, "click"), (3, _ts(4), 1, 2, "view"),
        (4, _ts(1), 2, 1, "view"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, session_id long, "
        "event_type string",
    )
    out = {
        r["step"]: r["n_users"]
        for r in funnel(
            ev, ["view", "click"], user_col=["user_id", "session_id"]
        ).collect()
    }
    assert out == {1: 3, 2: 1}  # 3 sessions saw a view; only (u1, s1) converts


def test_rate_anomalies(spark):
    from vectordb_watermark_spark.operators.analytics import rate_anomalies

    # 10 calm hours of 3-5 events (varied so MAD > 0) + a 40-event burst
    rows = []
    eid = 0
    for h in range(10):
        for i in range(3 + h % 3):
            rows.append((eid, dt.datetime(2024, 1, 1, h, i), 1, "view"))
            eid += 1
    for i in range(40):
        rows.append((eid, dt.datetime(2024, 1, 1, 12, i % 60), 1, "view"))
        eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {r["bucket"]: r for r in rate_anomalies(ev, granularity="hour").collect()}
    assert len(out) == 11
    flagged = [b for b, r in out.items() if r["is_anomaly"]]
    assert flagged == ["2024-01-01 12:00:00"]
    # counts: 3,4,5 x3 + 3 + burst 40 -> median 4, MAD 1
    # burst mz = 0.6745 * 36 = 24.282; calm |mz| <= 0.6745
    burst = out["2024-01-01 12:00:00"]
    calm = out["2024-01-01 03:00:00"]
    assert burst["mz_ppm"] == 24282000
    assert abs(calm["mz_ppm"]) <= 674500


def test_rate_anomalies_mad_zero_and_validation(spark):
    from vectordb_watermark_spark.operators.analytics import rate_anomalies

    rows = [(i, dt.datetime(2024, 1, 1, i), 1, "view") for i in range(5)]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = rate_anomalies(ev).collect()  # every bucket count 1 -> MAD 0
    assert all(r["mz_ppm"] is None and not r["is_anomaly"] for r in out)
    with pytest.raises(ValueError, match="granularity"):
        rate_anomalies(ev, granularity="year")
    with pytest.raises(ValueError, match="threshold"):
        rate_anomalies(ev, threshold=0)


def test_funnel_within_window(spark):
    from vectordb_watermark_spark.operators.analytics import funnel

    # user 1 clicks 30 min after view (in window), user 2 clicks 2 h after
    rows = [
        (0, dt.datetime(2024, 1, 1, 10, 0), 1, "view"),
        (1, dt.datetime(2024, 1, 1, 10, 30), 1, "click"),
        (2, dt.datetime(2024, 1, 1, 10, 0), 2, "view"),
        (3, dt.datetime(2024, 1, 1, 12, 0), 2, "click"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {
        r["step"]: r["n_users"]
        for r in funnel(ev, ["view", "click"], within_seconds=3600).collect()
    }
    assert out == {1: 2, 2: 1}
    # boundary is inclusive: exactly 3600 s converts
    out2 = {
        r["step"]: r["n_users"]
        for r in funnel(ev, ["view", "click"], within_seconds=7200).collect()
    }
    assert out2[2] == 2
    # integer event time: bound is in the column's own units
    evl = ev.select("event_id", "user_id", "event_type",
                    F.unix_timestamp("ts").alias("ts"))
    out3 = {
        r["step"]: r["n_users"]
        for r in funnel(evl, ["view", "click"], within_seconds=1800).collect()
    }
    assert out3[2] == 1
    with pytest.raises(ValueError, match="within_seconds"):
        funnel(ev, ["view"], within_seconds=0)


def test_join_cardinality_exact(spark):
    from vectordb_watermark_spark.operators.partitioning import join_cardinality

    l = spark.createDataFrame([(1,), (1,), (2,), (3,)], "k long")
    r = spark.createDataFrame([(1,), (1,), (1,), (3,), (4,)], "k long")
    [row] = join_cardinality(l, r, "k").collect()
    true_n = l.join(r, "k").count()
    assert row["n_out"] == true_n == 7  # 2*3 + 1*1
    assert row["n_matching_keys"] == 2
    assert row["max_key_out"] == 6
    assert row["top_key_share_ppm"] == 857143  # floor(6/7*1e6+0.5)
    # disjoint keys -> all zeros
    [z] = join_cardinality(l, spark.createDataFrame([(9,)], "k long"), "k").collect()
    assert (z["n_out"], z["n_matching_keys"], z["max_key_out"]) == (0, 0, 0)


def test_check_ref_integrity(spark):
    from vectordb_watermark_spark.operators.quality import check_ref_integrity

    child = spark.createDataFrame([(1,), (2,), (9,), (None,)], "fk long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    [r] = check_ref_integrity(child, parent, "fk", "pk").collect()
    # null keys don't count as orphans; 9 does
    assert (r["n_child"], r["n_orphans"], r["passed"]) == (4, 1, False)
    [ok] = check_ref_integrity(
        child.filter(F.col("fk") != 9), parent, "fk", "pk"
    ).collect()
    assert ok["passed"]


def test_table_diff(spark):
    from vectordb_watermark_spark.operators.quality import table_diff

    l = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", None), (4, "d", 40)],
        "id long, s string, v int",
    )
    r = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (3, "c", None), (5, "e", 50)],
        "id long, s string, v int",
    )
    [d] = table_diff(l, r, "id").collect()
    # id 4 only left, id 5 only right, id 2 changed (s), ids 1+3 equal
    # (3 equal because NULL <=> NULL)
    assert (d["n_only_left"], d["n_only_right"], d["n_changed"], d["n_equal"]) \
        == (1, 1, 1, 2)
    # null vs value is a change
    r2 = spark.createDataFrame([(3, "c", 30)], "id long, s string, v int")
    [d2] = table_diff(l.filter(F.col("id") == 3), r2, "id").collect()
    assert d2["n_changed"] == 1
    with pytest.raises(ValueError, match="duplicate keys"):
        table_diff(l.unionByName(l), r, "id")


def test_table_diff_mixed_key_types(spark):
    """Union-incompatible key types must not preempt the duplicate-key
    guard with an unrelated union error (ADVICE r14): the guard falls back
    to per-side checks, and both the ValueError and the diff itself still
    work across an int-vs-string key."""
    from vectordb_watermark_spark.operators.quality import table_diff

    l = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    r = spark.createDataFrame([("1", "a"), ("2", "B")], "id string, s string")
    [d] = table_diff(l, r, "id").collect()
    assert (d["n_only_left"], d["n_only_right"], d["n_changed"], d["n_equal"]) \
        == (0, 0, 1, 1)
    with pytest.raises(ValueError, match="duplicate keys on the right"):
        table_diff(l, r.unionByName(r), "id")


def test_funnel_timing(spark):
    from vectordb_watermark_spark.operators.analytics import funnel_timing

    NS = 1_000_000_000
    # user 1: view@0, click@100s, purchase@400s; user 2: view@0, click@50s
    rows = [
        (0, 0 * NS, 1, "view"), (1, 100 * NS, 1, "click"),
        (2, 400 * NS, 1, "purchase"),
        (3, 0 * NS, 2, "view"), (4, 50 * NS, 2, "click"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string"
    )
    out = {
        r["step"]: r
        for r in funnel_timing(
            ev, ["view", "click", "purchase"], ts_col="ts"
        ).collect()
    }
    assert out[2]["n_converted"] == 2
    assert out[2]["avg_gap_ms"] == 75000  # (100 + 50) / 2 s
    assert out[2]["p50_gap_sec"] == 75.0
    assert out[3]["n_converted"] == 1
    assert out[3]["avg_gap_ms"] == 300000
    with pytest.raises(ValueError, match="two steps"):
        funnel_timing(ev, ["view"], ts_col="ts")
    tsev = ev.select("event_id", "user_id", "event_type",
                     F.timestamp_seconds(F.col("ts") / NS).alias("ts"))
    with pytest.raises(ValueError, match="integer event-time"):
        funnel_timing(tsev, ["view", "click"])


def test_rebalance_classes(spark):
    from vectordb_watermark_spark.operators.quality import rebalance_classes

    rows = [(i, i % 3 if i < 30 else 0) for i in range(60)]  # label 0: 40 rows
    df = spark.createDataFrame(rows, "doc_id long, label int")
    out = rebalance_classes(df, "label")
    sizes = {r["label"]: r["n"] for r in out.groupBy("label").agg(
        F.count("*").alias("n")).collect()}
    assert sizes == {0: 10, 1: 10, 2: 10}  # min class (1 and 2 have 10)
    # determinism + partition invariance
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in rebalance_classes(df.repartition(7), "label").collect()
    )
    assert a == b
    # survivors are a subset of the input per class
    fixed = rebalance_classes(df, "label", per_class=5)
    assert fixed.count() == 15
    with pytest.raises(ValueError, match="per_class"):
        rebalance_classes(df, "label", per_class=0)


def test_incremental_psi_matches_batch(spark, tmp_path):
    """Streaming drift monitor: resolve_psi equals batch psi_per_dim over
    everything streamed, at every micro-batch; a replayed batch is
    idempotent; empty store resolves empty."""
    import shutil

    import numpy as np

    from vectordb_watermark_spark.operators.analytics import psi_per_dim
    from vectordb_watermark_spark.streaming.curation import (
        incremental_psi,
        ingest_psi_batch,
        psi_baseline,
        resolve_psi,
    )

    rng = np.random.default_rng(21)
    base_np = rng.normal(0, 0.15, (200, 3)).astype(np.float32)
    stream_np = rng.normal(0.1, 0.15, (90, 3)).astype(np.float32)
    schema = "id long, emb array<float>"
    base = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(base_np)], schema
    )
    store = str(tmp_path / "psi_store")
    assert resolve_psi(spark, store).count() == 0
    psi_baseline(base, store, vec_col="emb")

    src = tmp_path / "psi_src"
    src.mkdir()
    seen = []
    for k in range(3):
        rows = [
            (k * 30 + i, v.tolist())
            for i, v in enumerate(stream_np[k * 30:(k + 1) * 30])
        ]
        stage = tmp_path / f"psi_stage_{k}"
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(stage))
        shutil.copy(
            next(stage.glob("part-*.parquet")), src / f"{k}.parquet"
        )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = incremental_psi(
            stream, store, str(tmp_path / "psi_ck"), vec_col="emb"
        ).trigger(availableNow=True).start()
        q.awaitTermination(240)
        seen += rows
        got = {r["dim"]: r["psi"] for r in resolve_psi(spark, store).collect()}
        want = {
            r["dim"]: r["psi"]
            for r in psi_per_dim(
                base, spark.createDataFrame(seen, schema), vec_col="emb"
            ).collect()
        }
        assert got == want, f"after batch {k}"

    # retry replay of batch 1 changes nothing
    ingest_psi_batch(
        spark.createDataFrame(
            [(30 + i, v.tolist()) for i, v in enumerate(stream_np[30:60])],
            schema,
        ),
        store, 1, vec_col="emb",
    )
    got2 = {r["dim"]: r["psi"] for r in resolve_psi(spark, store).collect()}
    assert got2 == got


def test_roc_auc_by_slices(spark):
    from vectordb_watermark_spark.operators.analytics import roc_auc, roc_auc_by

    rng = np.random.default_rng(17)
    rows = []
    for s in range(3):
        for _ in range(150):
            rows.append((s, int(rng.integers(0, 2)), float(rng.integers(0, 15))))
    # slice 9: all positive -> undefined auc
    rows += [(9, 1, 1.0), (9, 1, 2.0)]
    df = spark.createDataFrame(rows, "slc int, label int, score double")
    out = {r["slice"]: r for r in roc_auc_by(df, "slc").collect()}
    for s in range(3):
        [ref] = roc_auc(df.filter(F.col("slc") == s)).collect()
        assert out[s]["auc"] == ref["auc"], s
        assert out[s]["n_pos"] == ref["n_pos"]
    assert out[9]["auc"] is None and out[9]["n_neg"] == 0


def test_compact_transition_pairs(spark, tmp_path):
    from vectordb_watermark_spark.operators.analytics import event_transitions
    from vectordb_watermark_spark.streaming.curation import (
        compact_transition_pairs,
        ingest_transitions_batch,
        resolve_transitions,
    )

    schema = "event_id long, ts timestamp, user_id long, event_type string"
    batches = [
        [(0, _ts(1), 1, "a"), (1, _ts(2), 1, "b")],
        [(2, _ts(3), 1, "a"), (3, _ts(4), 2, "a")],
        [(4, _ts(5), 2, "b"), (5, _ts(6), 1, "b")],
    ]
    store = str(tmp_path / "ctr")
    all_rows = []
    for k, rows in enumerate(batches):
        ingest_transitions_batch(spark.createDataFrame(rows, schema), store, k)
        all_rows += rows
    before = {
        (r["from_type"], r["to_type"]): (r["n"], r["prob"])
        for r in resolve_transitions(spark, store).collect()
    }
    assert compact_transition_pairs(spark, store) == 3
    after = {
        (r["from_type"], r["to_type"]): (r["n"], r["prob"])
        for r in resolve_transitions(spark, store).collect()
    }
    assert after == before
    truth = {
        (r["from_type"], r["to_type"]): (r["n"], r["prob"])
        for r in event_transitions(
            spark.createDataFrame(all_rows, schema)
        ).collect()
    }
    assert after == truth
    # idempotent second pass: single dir left, nothing to fold
    assert compact_transition_pairs(spark, store) == 0
    # ingest continues cleanly after compaction (higher batch id)
    ingest_transitions_batch(
        spark.createDataFrame([(6, _ts(7), 1, "a")], schema), store, 5
    )
    final = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in resolve_transitions(spark, store).collect()
    }
    assert final[("b", "a")] == truth[("b", "a")][0] + 1


def test_transitions_in_stream_cadence_fold(spark, tmp_path):
    """The compact_every cadence form: folding with exclude=k inside batch
    k's handler keeps resolve exact, bounds the dir count, preserves the
    state dir a retry of batch k replays against, and a full retry of
    batch k (re-ingest + re-fold) changes nothing."""
    from vectordb_watermark_spark.operators.analytics import event_transitions
    from vectordb_watermark_spark.streaming.curation import (
        _latest_state_dir,
        compact_transition_pairs,
        ingest_transitions_batch,
        resolve_transitions,
    )

    schema = "event_id long, ts timestamp, user_id long, event_type string"
    batches = [
        [(0, _ts(1), 1, "a"), (1, _ts(2), 1, "b")],
        [(2, _ts(3), 1, "a"), (3, _ts(4), 2, "a")],
        [(4, _ts(5), 2, "b"), (5, _ts(6), 1, "b")],
        [(6, _ts(7), 1, "a"), (7, _ts(8), 2, "a")],
    ]
    store = str(tmp_path / "ctrc")
    all_rows: list = []
    # cadence: fold below the in-flight batch after each ingest from batch 2
    for k, rows in enumerate(batches):
        ingest_transitions_batch(spark.createDataFrame(rows, schema), store, k)
        all_rows += rows
        if k >= 2:
            compact_transition_pairs(spark, store, exclude=k)

    def pair_dirs() -> list[str]:
        import os

        return sorted(
            d for d in os.listdir(f"{store}/pairs") if d.startswith("batch=")
        )

    truth = {
        (r["from_type"], r["to_type"]): (r["n"], r["prob"])
        for r in event_transitions(
            spark.createDataFrame(all_rows, schema)
        ).collect()
    }
    resolved = {
        (r["from_type"], r["to_type"]): (r["n"], r["prob"])
        for r in resolve_transitions(spark, store).collect()
    }
    assert resolved == truth
    # bounded: batches 0..2 folded into one dir + batch 3's own dir
    assert pair_dirs() == ["batch=stream-2", "batch=stream-3"]
    # the state dir a retry of batch 3 would replay against survived
    assert _latest_state_dir(spark, store, 3) is not None
    # full retry of batch 3: re-ingest the same rows, re-run the fold —
    # overwrite-scoped dirs + exclude semantics make it a no-op overall
    ingest_transitions_batch(
        spark.createDataFrame(batches[3], schema), store, 3
    )
    compact_transition_pairs(spark, store, exclude=3)
    retried = {
        (r["from_type"], r["to_type"]): (r["n"], r["prob"])
        for r in resolve_transitions(spark, store).collect()
    }
    assert retried == truth
    assert pair_dirs() == ["batch=stream-2", "batch=stream-3"]


def test_class_margins(spark):
    from vectordb_watermark_spark.operators.analytics import class_margins

    rng = np.random.default_rng(23)
    # classes 0/1 share a direction (near-duplicate classes); class 2 is
    # orthogonal-ish
    base = rng.normal(0, 1, 4)
    rows = []
    for i in range(40):
        rows.append((0, (base + rng.normal(0, 0.01, 4)).tolist()))
        rows.append((1, (base * 1.1 + rng.normal(0, 0.01, 4)).tolist()))
        rows.append((2, (np.array([-base[1], base[0], -base[3], base[2]])
                         + rng.normal(0, 0.01, 4)).tolist()))
    df = spark.createDataFrame(rows, "label int, emb array<double>")
    out = {r["label"]: r for r in class_margins(df).collect()}
    assert set(out) == {0, 1, 2}
    assert all(r["n"] == 40 for r in out.values())
    # the blurred pair points at each other with cos ~ 1
    assert out[0]["nearest_label"] == 1 and out[0]["nearest_cos"] > 0.99
    assert out[1]["nearest_label"] == 0 and out[1]["nearest_cos"] > 0.99
    assert out[2]["nearest_cos"] < 0.5  # orthogonal class is separated
    # centroid agreement with numpy (6-dp centroid rounding)
    cent0 = np.round(np.mean([r[1] for r in rows if r[0] == 0], axis=0), 6)
    assert out[0]["centroid_norm"] == pytest.approx(
        float(np.linalg.norm(cent0)), abs=1e-5
    )


def test_incremental_kmv_exact_merge(spark, tmp_path):
    """Streaming KMV: resolve is bit-identical to one-shot kmv_distinct
    over everything streamed, at every batch; re-ingesting values is
    harmless (distinct hashing); empty store estimates 0."""
    from vectordb_watermark_spark.operators.sketch import kmv_distinct
    from vectordb_watermark_spark.streaming.curation import (
        incremental_kmv,
        ingest_kmv_batch,
        resolve_kmv,
    )
    import shutil

    store = str(tmp_path / "kmv_store")
    [empty] = resolve_kmv(spark, store, k=16).collect()
    assert empty["estimate"] == 0

    rng = np.random.default_rng(31)
    batches = [
        [(f"val{int(v)}",) for v in rng.integers(0, 400, 120)] for _ in range(3)
    ]
    src = tmp_path / "kmv_src"
    src.mkdir()
    seen = []
    for i, rows in enumerate(batches):
        stage = tmp_path / f"kmv_stage_{i}"
        spark.createDataFrame(rows, "v string").coalesce(1).write.parquet(str(stage))
        shutil.copy(next(stage.glob("part-*.parquet")), src / f"{i}.parquet")
        stream = (
            spark.readStream.schema("v string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = incremental_kmv(
            stream, store, str(tmp_path / "kmv_ck"), col="v", k=16
        ).trigger(availableNow=True).start()
        q.awaitTermination(240)
        seen += rows
        [got] = resolve_kmv(spark, store, k=16).collect()
        [want] = kmv_distinct(
            spark.createDataFrame(seen, "v string"), "v", k=16
        ).collect()
        assert (got["estimate"], got["exact_k"], got["kth_hash"]) == (
            want["estimate"], want["exact_k"], want["kth_hash"]
        ), f"after batch {i}"

    # retry replay of batch 1: identical store
    ingest_kmv_batch(
        spark.createDataFrame(batches[1], "v string"), store, 1, col="v", k=16
    )
    [again] = resolve_kmv(spark, store, k=16).collect()
    assert again["estimate"] == got["estimate"]


def test_incremental_rates_matches_batch(spark, tmp_path):
    """Streaming rate monitor: resolve equals batch rate_anomalies over
    everything streamed, under an ARBITRARY batch split; retry replay
    idempotent; empty store empty."""
    import shutil

    from vectordb_watermark_spark.operators.analytics import rate_anomalies
    from vectordb_watermark_spark.streaming.curation import (
        incremental_rates,
        ingest_rate_batch,
        resolve_rate_anomalies,
    )

    schema = "event_id long, ts timestamp, user_id long, event_type string"
    rows = []
    eid = 0
    for h in range(8):
        for i in range(3 + h % 3):
            rows.append((eid, dt.datetime(2024, 1, 1, h, i), 1, "view"))
            eid += 1
    for i in range(30):  # burst
        rows.append((eid, dt.datetime(2024, 1, 1, 9, i % 60), 1, "view"))
        eid += 1

    store = str(tmp_path / "rates_store")
    assert resolve_rate_anomalies(spark, store).count() == 0
    # arbitrary split by id mod 3 — deliberately NOT time-ordered
    src = tmp_path / "rates_src"
    src.mkdir()
    for k in range(3):
        part = [r for r in rows if r[0] % 3 == k]
        stage = tmp_path / f"rates_stage_{k}"
        spark.createDataFrame(part, schema).coalesce(1).write.parquet(str(stage))
        shutil.copy(next(stage.glob("part-*.parquet")), src / f"{k}.parquet")
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = incremental_rates(
            stream, store, str(tmp_path / "rates_ck")
        ).trigger(availableNow=True).start()
        q.awaitTermination(240)
    got = {r["bucket"]: (r["n"], r["mz_ppm"], r["is_anomaly"])
           for r in resolve_rate_anomalies(spark, store).collect()}
    want = {r["bucket"]: (r["n"], r["mz_ppm"], r["is_anomaly"])
            for r in rate_anomalies(
                spark.createDataFrame(rows, schema)
            ).collect()}
    assert got == want
    assert any(v[2] for v in got.values())  # the burst is flagged
    # retry replay of batch 1
    part1 = [r for r in rows if r[0] % 3 == 1]
    ingest_rate_batch(spark.createDataFrame(part1, schema), store, 1)
    got2 = {r["bucket"]: (r["n"], r["mz_ppm"], r["is_anomaly"])
            for r in resolve_rate_anomalies(spark, store).collect()}
    assert got2 == got


def test_retention_monthly(spark):
    rows = [
        (0, dt.datetime(2024, 1, 15), 1, "view"),
        (1, dt.datetime(2024, 2, 2), 1, "view"),
        (2, dt.datetime(2024, 4, 28), 1, "view"),
        (3, dt.datetime(2024, 2, 10), 2, "view"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {
        (str(r["cohort"]), r["offset"]): r["n_active"]
        for r in retention_cohorts(ev, granularity="month").collect()
    }
    assert out[("2024-01-01", 0)] == 1
    assert out[("2024-01-01", 1)] == 1
    assert out[("2024-01-01", 3)] == 1
    assert out[("2024-02-01", 0)] == 1
    assert len(out) == 4


def test_incremental_rates_granularity_pinned(spark, tmp_path):
    from vectordb_watermark_spark.streaming.curation import ingest_rate_batch

    schema = "event_id long, ts timestamp, user_id long, event_type string"
    df = spark.createDataFrame([(0, _ts(1), 1, "view")], schema)
    store = str(tmp_path / "gr_store")
    ingest_rate_batch(df, store, 0, granularity="hour")
    with pytest.raises(ValueError, match="granularity"):
        ingest_rate_batch(df, store, 1, granularity="day")
    ingest_rate_batch(df, store, 1, granularity="hour")  # matching is fine


def test_trending_types(spark):
    from vectordb_watermark_spark.operators.analytics import trending_types

    rows = [
        (0, dt.datetime(2024, 1, 1), 1, "a"), (1, dt.datetime(2024, 1, 1), 1, "a"),
        (2, dt.datetime(2024, 1, 2), 1, "a"), (3, dt.datetime(2024, 1, 2), 1, "a"),
        (4, dt.datetime(2024, 1, 2), 1, "a"), (5, dt.datetime(2024, 1, 2), 1, "a"),
        (6, dt.datetime(2024, 1, 2), 1, "b"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {(r["bucket"], r["event_type"]): r for r in trending_types(ev).collect()}
    assert out[("2024-01-01", "a")]["prev_n"] is None
    r = out[("2024-01-02", "a")]
    assert (r["n"], r["prev_n"], r["growth_ppm"]) == (4, 2, 2000000)
    assert out[("2024-01-02", "b")]["growth_ppm"] is None


def test_stickiness(spark):
    from vectordb_watermark_spark.operators.analytics import stickiness

    rows = []
    eid = 0
    # users 1..3 active day 1; only user 1 active days 2..3
    for d, users in [(1, [1, 2, 3]), (2, [1]), (3, [1])]:
        for u in users:
            rows.append((eid, dt.datetime(2024, 1, d), u, "view"))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {r["day"]: r for r in stickiness(ev, window_days=7).collect()}
    assert (out["2024-01-01"]["dau"], out["2024-01-01"]["wau"]) == (3, 3)
    assert (out["2024-01-03"]["dau"], out["2024-01-03"]["wau"]) == (1, 3)
    assert out["2024-01-03"]["stickiness_ppm"] == 333333
    # a 1-day window makes stickiness identically 1
    one = stickiness(ev, window_days=1).collect()
    assert all(r["stickiness_ppm"] == 1000000 for r in one)
    with pytest.raises(ValueError, match="window_days"):
        stickiness(ev, window_days=0)


def test_temperature_mix(spark):
    """mT5-style alpha-sampling: exact budget, alpha=1 identity at the
    corpus total, monotone flattening as alpha drops, deterministic
    upsampling (every copy index 1..reps present), partition invariance,
    guards."""
    import math

    from pyspark.sql import functions as F

    from vectordb_watermark_spark.operators.quality import temperature_mix

    rows = [(i, "big" if i < 900 else "small", "t") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")

    def mix(alpha, total=1000, d=df):
        out = temperature_mix(d, alpha=alpha, total_out=total)
        per = {
            r["source"]: r["n"]
            for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        return out, per

    # exact budget + largest-remainder apportionment matches the formula
    out, per = mix(0.2)
    assert sum(per.values()) == 1000
    w = 900**0.2 + 100**0.2
    assert abs(per["small"] - 1000 * 100**0.2 / w) <= 1  # floor/remainder
    # alpha=1 at the corpus total reproduces the natural mix exactly
    _, nat = mix(1.0)
    assert nat == {"big": 900, "small": 100}
    # flattening is monotone: smaller alpha gives the small source more
    _, p05 = mix(0.5)
    _, p00 = mix(0.0)
    assert 100 < per["small"] < p00["small"] and per["small"] < p05["small"] + 200
    assert p00["small"] == 500  # alpha=0 -> uniform per source
    # upsampled rows carry contiguous copy indices 1..reps
    copies = (
        out.filter(F.col("source") == "small")
        .groupBy("doc_id")
        .agg(F.count("*").alias("reps"), F.collect_list("copy").alias("cs"))
        .collect()
    )
    assert copies and all(sorted(r["cs"]) == list(range(1, r["reps"] + 1)) for r in copies)
    # deterministic under repartitioning
    a = sorted(map(tuple, temperature_mix(df.repartition(7), alpha=0.2, total_out=1000).collect()))
    b = sorted(map(tuple, out.collect()))
    assert a == b

    import pytest

    with pytest.raises(ValueError, match="alpha"):
        temperature_mix(df, alpha=-0.1)
    with pytest.raises(ValueError, match="total_out"):
        temperature_mix(df, total_out=0)
