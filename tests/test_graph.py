"""PageRank contracts (operators/graph.py): agreement with a dense
numpy power iteration (dangling + teleport completion), sum-to-one,
personalized teleport, isolated nodes via an explicit node table,
input validation, and partition invariance under per-iteration
rounding."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectordb_watermark_spark.operators.graph import pagerank


def _numpy_pagerank(n, edge_list, d=0.85, iters=5, t=None, round_dp=None):
    t = np.full(n, 1.0 / n) if t is None else np.asarray(t, dtype=np.float64)
    t = t / t.sum()
    out = np.zeros(n)
    for s, _ in edge_list:
        out[s] += 1
    pr = t.copy()
    if round_dp is not None:
        pr = np.round(pr, round_dp)
    for _ in range(iters):
        contrib = np.zeros(n)
        for s, v in edge_list:
            contrib[v] += pr[s] / out[s]
        dm = pr[out == 0].sum()
        pr = (1 - d) * t + d * (contrib + dm * t)
        if round_dp is not None:
            pr = np.round(pr, round_dp)
    return pr


@pytest.fixture(scope="module")
def toy(spark):
    # 6 nodes, node 5 dangling, node 4 isolated (no edges at all)
    edge_list = [
        (0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 5), (1, 5),
    ]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(6)], "node long")
    return edges, nodes, edge_list


def test_pagerank_matches_numpy(spark, toy):
    edges, nodes, edge_list = toy
    got = {
        r["node"]: r["pr"]
        for r in pagerank(edges, n_iter=5, nodes=nodes).collect()
    }
    ref = _numpy_pagerank(6, edge_list, iters=5)
    assert set(got) == set(range(6))
    for i in range(6):
        assert got[i] == pytest.approx(ref[i], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_default_node_set_excludes_isolated(spark, toy):
    edges, _, _ = toy
    got = pagerank(edges, n_iter=2).collect()
    assert {r["node"] for r in got} == {0, 1, 2, 3, 5}


def test_pagerank_personalized_teleport(spark, toy):
    edges, _, edge_list = toy
    w = [5.0, 0.0, 1.0, 1.0, 0.0, 1.0]
    nodes = spark.createDataFrame(
        [(i, w[i]) for i in range(6)], "node long, q double"
    )
    got = {
        r["node"]: r["pr"]
        for r in pagerank(
            edges, n_iter=4, nodes=nodes, reset_col="q"
        ).collect()
    }
    ref = _numpy_pagerank(6, edge_list, iters=4, t=w)
    for i in range(6):
        assert got[i] == pytest.approx(ref[i], abs=1e-12)
    # mass concentrates toward the teleport-heavy node vs uniform
    uni = _numpy_pagerank(6, edge_list, iters=4)
    assert got[0] > uni[0]


def test_pagerank_round_dp_partition_invariant(spark, toy):
    edges, nodes, edge_list = toy
    a = {
        r["node"]: r["pr"]
        for r in pagerank(
            edges.repartition(7), n_iter=5, nodes=nodes, round_dp=12
        ).collect()
    }
    b = {
        r["node"]: r["pr"]
        for r in pagerank(
            edges.coalesce(1), n_iter=5, nodes=nodes, round_dp=12
        ).collect()
    }
    assert a == b
    ref = _numpy_pagerank(6, edge_list, iters=5, round_dp=12)
    for i in range(6):
        assert a[i] == pytest.approx(ref[i], abs=1e-12)


def test_pagerank_validation(spark, toy):
    edges, nodes, _ = toy
    with pytest.raises(ValueError, match="damping"):
        pagerank(edges, damping=1.5)
    with pytest.raises(ValueError, match="n_iter"):
        pagerank(edges, n_iter=0)
    bad = spark.createDataFrame([(0, -1.0), (1, 2.0)], "node long, q double")
    with pytest.raises(ValueError, match="nonnegative"):
        pagerank(edges, nodes=bad, reset_col="q")
    empty = spark.createDataFrame([], "src long, dst long")
    with pytest.raises(ValueError, match="empty node set"):
        pagerank(empty)


def test_pagerank_tol_early_stop(spark, toy):
    """tol early-stop: a loose tolerance exits before the n_iter bound
    (scores match a SHORTER fixed run, proving the loop actually
    stopped), a zero tolerance runs to the bound and matches the
    fixed-n_iter path bit for bit, and a negative tolerance is refused."""
    edges, nodes, edge_list = toy

    def run(**kw):
        return {r["node"]: r["pr"] for r in pagerank(edges, nodes=nodes, **kw).collect()}

    # delta after iteration k of the numpy twin tells us where a given
    # tol must stop; a tol STRICTLY between two consecutive deltas is
    # robust to the last-ulp float differences between engines
    deltas = [float("inf")]
    prev = _numpy_pagerank(6, edge_list, iters=0)
    for k in range(1, 9):
        cur = _numpy_pagerank(6, edge_list, iters=k)
        deltas.append(float(np.abs(cur - prev).sum()))
        prev = cur
    ks = sorted(range(1, 9), key=lambda k: -deltas[k])
    # pick the midpoint of the widest gap between consecutive sorted
    # deltas so the stop iteration is unambiguous
    gap = max(range(len(ks) - 1), key=lambda i: deltas[ks[i]] - deltas[ks[i + 1]])
    tol = (deltas[ks[gap]] + deltas[ks[gap + 1]]) / 2
    stop_at = next(k for k in range(1, 9) if deltas[k] <= tol)
    assert stop_at < 8  # the early stop actually engages
    got = run(n_iter=8, tol=tol)
    ref = _numpy_pagerank(6, edge_list, iters=stop_at)
    for i in range(6):
        assert got[i] == pytest.approx(ref[i], abs=1e-12)

    # tol=0 on a converging chain: still bounded by n_iter, identical to
    # the fixed path (bit-identical trajectory contract)
    assert run(n_iter=3, tol=0.0) == run(n_iter=3)

    with pytest.raises(ValueError, match="tol"):
        pagerank(edges, nodes=nodes, tol=-1.0)


def test_pagerank_weighted_matches_numpy(spark, toy):
    """Edge-weighted propagation: mass splits proportionally to weights
    (dense numpy twin), zero-total-weight sources go dangling, the
    unweighted path is untouched, and negative weights are refused."""
    edges, nodes, edge_list = toy
    rng = np.random.default_rng(7)
    ws = {(s, v): float(round(rng.uniform(0.1, 1.0), 3)) for s, v in edge_list}
    wedges = spark.createDataFrame(
        [(s, v, ws[(s, v)]) for s, v in edge_list],
        "src long, dst long, w double",
    )

    def numpy_weighted(iters):
        n, d, t = 6, 0.85, np.full(6, 1 / 6)
        wsum = np.zeros(n)
        for (s, v), w in ws.items():
            wsum[s] += w
        pr = t.copy()
        for _ in range(iters):
            contrib = np.zeros(n)
            for (s, v), w in ws.items():
                contrib[v] += pr[s] * w / wsum[s]
            dm = pr[wsum == 0].sum()
            pr = (1 - d) * t + d * (contrib + dm * t)
        return pr

    got = {
        r["node"]: r["pr"]
        for r in pagerank(wedges, n_iter=4, nodes=nodes, weight_col="w").collect()
    }
    ref = numpy_weighted(4)
    for i in range(6):
        assert got[i] == pytest.approx(ref[i], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)

    # zero-weight source == dangling: all of node 3's weights zeroed
    z = spark.createDataFrame(
        [(s, v, 0.0 if s == 3 else ws[(s, v)]) for s, v in edge_list],
        "src long, dst long, w double",
    )
    got_z = {
        r["node"]: r["pr"]
        for r in pagerank(z, n_iter=3, nodes=nodes, weight_col="w").collect()
    }
    no3 = spark.createDataFrame(
        [(s, v, ws[(s, v)]) for s, v in edge_list if s != 3],
        "src long, dst long, w double",
    )
    got_no3 = {
        r["node"]: r["pr"]
        for r in pagerank(no3, n_iter=3, nodes=nodes, weight_col="w").collect()
    }
    for i in range(6):
        assert got_z[i] == pytest.approx(got_no3[i], abs=1e-12)

    # uniform weights == unweighted path exactly at shared rounding
    u = spark.createDataFrame(
        [(s, v, 2.5) for s, v in edge_list], "src long, dst long, w double"
    )
    assert (
        {r["node"]: r["pr"] for r in pagerank(u, n_iter=3, nodes=nodes,
                                              weight_col="w", round_dp=12).collect()}
        == {r["node"]: r["pr"] for r in pagerank(edges, n_iter=3, nodes=nodes,
                                                 round_dp=12).collect()}
    )

    bad = spark.createDataFrame([(0, 1, -1.0)], "src long, dst long, w double")
    with pytest.raises(ValueError, match="nonnegative"):
        pagerank(bad, nodes=nodes, weight_col="w")


def _kcore_ref(edges, k):
    # brute-force iterative peeling
    eset = {frozenset(e) for e in edges if e[0] != e[1]}
    while True:
        deg = {}
        for e in eset:
            for n in e:
                deg[n] = deg.get(n, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        nxt = {e for e in eset if all(n in keep for n in e)}
        if nxt == eset:
            break
        eset = nxt
    deg = {}
    for e in eset:
        for n in e:
            deg[n] = deg.get(n, 0) + 1
    return {n: d for n, d in deg.items() if d >= k}


def test_k_core_vs_bruteforce(spark):
    from vectordb_watermark_spark.operators.graph import k_core

    rng = np.random.default_rng(29)
    edges = {(int(a), int(b)) for a, b in rng.integers(0, 40, (260, 2)) if a != b}
    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    for k in (3, 5, 8):
        got = {r["node"]: r["deg"] for r in k_core(df, k).collect()}
        assert got == _kcore_ref(edges, k), k
    # a clique survives any k below its size; pendant nodes never do
    clique = [(a, b) for a in range(5) for b in range(5) if a != b]
    pend = clique + [(0, 100), (1, 101)]
    out = {r["node"]: r["deg"] for r in k_core(
        spark.createDataFrame(pend, "src long, dst long"), 4).collect()}
    assert out == {0: 4, 1: 4, 2: 4, 3: 4, 4: 4}
    with pytest.raises(ValueError, match="k must be"):
        k_core(df, 0)
