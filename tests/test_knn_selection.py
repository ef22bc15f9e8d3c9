"""M1: kNN graph, in-degrees, topk helpers, carrier selection (+ DuckDB oracle)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_TINY, load
from vectordb_watermark_spark.operators import knn as K
from vectordb_watermark_spark.operators import selection as S
from vectordb_watermark_spark.operators.topk import global_row_number, topk_by_coarse_key


@pytest.fixture(scope="module")
def emb(spark):
    return load(spark, "embeddings").select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("emb")
    ).cache()


@pytest.fixture(scope="module")
def exact_edges_np(emb):
    """Brute-force float64 kNN with (dist2, dst) tie-break, as ground truth."""
    pdf = emb.toPandas()
    ids = pdf["id"].to_numpy(np.int64)
    X = np.stack(pdf["emb"].map(lambda a: np.asarray(a, np.float64)))
    d2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    edges = {}
    for i in range(len(ids)):
        order = np.lexsort((ids, d2[i]))[:16]
        edges[ids[i]] = [(int(ids[j]), float(d2[i, j])) for j in order]
    return edges


def test_knn_exact_matches_bruteforce(emb, exact_edges_np):
    got = K.knn_edges_exact(emb, k=16).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r.src, []).append((r.rank, r.dst, r.dist2))
    assert set(by_src) == set(exact_edges_np)
    for src, lst in by_src.items():
        lst.sort()
        expect = exact_edges_np[src]
        assert [d for _, d, _ in lst] == [d for d, _ in expect], f"src {src}"
        for (_, _, got_d2), (_, exp_d2) in zip(lst, expect):
            assert abs(got_d2 - exp_d2) < 1e-9


def test_knn_broadcast_matches_exact(emb, exact_edges_np):
    got = K.knn_edges_broadcast(emb, k=16).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r.src, []).append((r.rank, r.dst))
    # allow ulp-level rank flips on near-ties: compare edge sets
    agree = total = 0
    for src, lst in by_src.items():
        got_set = {d for _, d in lst}
        exp_set = {d for d, _ in exact_edges_np[src]}
        agree += len(got_set & exp_set)
        total += 16
    assert agree / total > 0.999


def test_knn_lsh_recall(emb, exact_edges_np):
    got = K.knn_edges_lsh(emb, k=16, key="t", n_tables=12, n_bits=4, dim=64).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r.src, set()).add(r.dst)
    hit = total = 0
    for src, expect in exact_edges_np.items():
        exp_set = {d for d, _ in expect}
        hit += len(by_src.get(src, set()) & exp_set)
        total += len(exp_set)
    recall = hit / total
    assert recall > 0.55, f"LSH recall {recall:.3f} too low"


def test_knn_lsh_string_ids(spark, emb):
    """VERDICT r8 #7: the LSH graph path derives the id type from the input
    column — a string-keyed corpus produces string src/dst edges identical
    (as a graph) to the long-keyed run, including through the bucket-cap
    subsample path."""
    sdf = emb.select(
        F.concat(F.lit("doc-"), F.format_string("%04d", "id")).alias("id"), "emb"
    )
    got = K.knn_edges_lsh(sdf, k=8, key="t", n_tables=6, n_bits=4, dim=64).collect()
    assert got, "no edges on the string-keyed corpus"
    assert all(isinstance(r["src"], str) and r["src"].startswith("doc-") for r in got[:20])
    s_edges = {(r["src"], r["dst"]) for r in got}
    l_edges = {
        (f"doc-{r['src']:04d}", f"doc-{r['dst']:04d}")
        for r in K.knn_edges_lsh(emb, k=8, key="t", n_tables=6, n_bits=4, dim=64).collect()
    }
    # dist2 values are id-independent; rank ties break by id ORDER, and zero
    # padding makes the string order equal the numeric order -> identical
    assert s_edges == l_edges

    # bucket-cap subsample on string ids: tiny cap forces the hash-order
    # path; the run must stay deterministic across repartitionings
    a = {
        (r["src"], r["dst"])
        for r in K.knn_edges_lsh(
            sdf, k=4, key="t", n_tables=4, n_bits=1, dim=64, bucket_cap=32
        ).collect()
    }
    b = {
        (r["src"], r["dst"])
        for r in K.knn_edges_lsh(
            sdf.repartition(7), k=4, key="t", n_tables=4, n_bits=1, dim=64, bucket_cap=32
        ).collect()
    }
    assert a == b


def test_in_degrees_sum_and_zero_fill(spark, emb):
    edges = K.knn_edges_exact(emb, k=16)
    deg = K.in_degrees(emb, edges).cache()
    n = emb.count()
    assert deg.count() == n  # every id present
    total_deg = deg.agg(F.sum("degree")).first()[0]
    assert total_deg == n * 16  # each node emits 16 out-edges
    assert deg.filter(F.col("degree") < 0).count() == 0


def test_gated_degrees_clean_identity(emb):
    """On clean data the gate keeps everything: gated == plain in-degrees."""
    edges = K.knn_edges_exact(emb, k=16)
    plain = {r["id"]: r["degree"] for r in K.in_degrees(emb, edges).collect()}
    gated = {r["id"]: r["degree"] for r in K.gated_in_degrees(emb, edges, k=16).collect()}
    assert gated == plain


def test_gate_tau_plan_matches_driver_threshold(spark, emb):
    """The in-plan tau (knn.gate_tau_plan, broadcast scalar) must equal the
    driver-side edge_gate_threshold bit-for-bit — gated_in_degrees switched
    to the in-plan form; a drift here would silently desynchronize embed and
    extract carrier sets across engine versions."""
    edges = K.knn_edges_exact(emb, k=16).cache()
    tau_driver = K.edge_gate_threshold(edges)
    tau_plan = K.gate_tau_plan(edges).first()["tau"]
    assert tau_plan == tau_driver


def test_gate_tau_plan_empty_and_duplicate_only(spark):
    """No non-duplicate edges -> NULL tau (nothing kept), matching the
    driver fallback tau=0 final semantics."""
    dup = spark.createDataFrame(
        [(1, 2, 0.0, 1), (2, 1, 0.0, 1)], "src long, dst long, dist2 double, rank int"
    )
    assert K.gate_tau_plan(dup).first()["tau"] is None
    empty = dup.limit(0)
    assert K.gate_tau_plan(empty).first()["tau"] is None


def test_gated_degrees_excludes_destroyed_vectors(spark):
    """Off-manifold (destroyed) vectors must not enter the degree universe,
    and the surviving ids' degree ranking must not be swamped by edge spray
    from destroyed probes — the property that keeps blind carrier
    re-derivation aligned under heavy noise (knn.gated_in_degrees)."""
    rng = np.random.default_rng(7)
    dim = 16
    clean = rng.standard_normal((200, dim)) * 0.1 + rng.standard_normal((1, dim))
    clean /= np.linalg.norm(clean, axis=1, keepdims=True)
    destroyed = rng.standard_normal((100, dim)) * 10.0  # far off-manifold
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(clean)] + [
        (1000 + i, [float(x) for x in v]) for i, v in enumerate(destroyed)
    ]
    df = spark.createDataFrame(rows, "id long, emb array<float>")
    edges = K.knn_edges_exact(df, k=8)
    deg = K.gated_in_degrees(df, edges, k=8).collect()
    kept_ids = {r["id"] for r in deg}
    assert all(i < 1000 for i in kept_ids), "destroyed vectors must be excluded"
    assert len(kept_ids) >= 190, "clean vectors must stay eligible"


def test_gated_degrees_excludes_duplicate_blob(spark):
    """Mean-replacement creates a clique of identical vectors; tie-breaking
    gives the blob's in-edges to a handful of copies and leaves the rest at
    degree ~0, flooding the low-degree carrier pool.  The dup-out rule must
    exclude the whole blob (knn.gated_in_degrees step 4)."""
    rng = np.random.default_rng(11)
    dim = 16
    clean = rng.standard_normal((300, dim))
    clean /= np.linalg.norm(clean, axis=1, keepdims=True)
    mean_v = [float(x) for x in clean.mean(axis=0)]
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(clean)] + [
        (1000 + i, mean_v) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id long, emb array<float>")
    edges = K.knn_edges_exact(df, k=8)
    kept_ids = {r["id"] for r in K.gated_in_degrees(df, edges, k=8).collect()}
    assert all(i < 1000 for i in kept_ids), "duplicate blob must be excluded"
    assert len(kept_ids) >= 280, "clean vectors must stay eligible"


def test_topk_by_coarse_key_matches_sort(spark):
    import random

    random.seed(7)
    rows = [(i, random.randint(0, 5)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, degree long")
    for k in [1, 17, 250, 499, 500, 600]:
        got = topk_by_coarse_key(df, k, "degree", ["id"]).collect()
        expect = sorted(rows, key=lambda r: (r[1], r[0]))[:k]
        assert sorted((r.id, r.degree) for r in got) == sorted(expect), f"k={k}"


def test_global_row_number_matches_sort(spark):
    import random

    random.seed(11)
    rows = [(i, random.randint(0, 99)) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, v long").repartition(7)
    out = {r.id: r.rn for r in global_row_number(df, ["v", "id"]).collect()}
    expect = {row[0]: i + 1 for i, row in enumerate(sorted(rows, key=lambda r: (r[1], r[0])))}
    assert out == expect


def test_candidate_pool_size_step_function():
    # ratio <= 0.1 -> 50% buffer
    assert S.candidate_pool_size(1000, 100) == 150
    # ratio 0.3 -> 30%
    assert S.candidate_pool_size(1000, 300) == 390
    # ratio 0.5 -> 20%
    assert S.candidate_pool_size(1000, 500) == 600
    # ratio 0.7 -> 15%
    assert S.candidate_pool_size(1000, 700) == 805
    # ratio 0.85 -> 10%
    assert S.candidate_pool_size(1000, 850) == 935
    # ratio 1.0 -> clamped to total
    assert S.candidate_pool_size(1000, 1000) == 1000


@pytest.fixture(scope="module")
def degrees(emb):
    return K.in_degrees(emb, K.knn_edges_exact(emb, k=16)).cache()


def test_select_carriers_empty_degrees(spark):
    empty = spark.createDataFrame([], "id long, degree long")
    sel = S.select_carriers(empty, key="k", rate=0.1)
    assert sel.count() == 0
    assert sel.columns == ["id", "degree", "selection_order", "blk"]


def test_select_carriers_count_and_determinism(degrees):
    sel1 = S.select_carriers(degrees, key="test-key-1", rate=0.1)
    n = degrees.count()
    target = max(int(n * 0.1), 16)
    rows1 = sorted((r.id, r.selection_order, r.blk) for r in sel1.collect())
    assert len(rows1) == target
    # determinism under different partitioning
    sel2 = S.select_carriers(degrees.repartition(13), key="test-key-1", rate=0.1)
    rows2 = sorted((r.id, r.selection_order, r.blk) for r in sel2.collect())
    assert rows1 == rows2
    # different key -> different set
    sel3 = S.select_carriers(degrees, key="other-key", rate=0.1)
    assert sorted(r.id for r in sel3.collect()) != [r[0] for r in rows1]


def test_select_carriers_block_balance(degrees):
    sel = S.select_carriers(degrees, key="test-key-1", rate=0.5)
    counts = {r.blk: r.cnt for r in sel.groupBy("blk").agg(F.count("*").alias("cnt")).collect()}
    assert set(counts) == set(range(16))
    assert max(counts.values()) - min(counts.values()) <= 1  # round-robin balance


def test_select_carriers_prefers_low_degree(degrees):
    sel = S.select_carriers(degrees, key="test-key-1", rate=0.1)
    sel_avg = sel.agg(F.avg("degree")).first()[0]
    all_avg = degrees.agg(F.avg("degree")).first()[0]
    assert sel_avg < all_avg


def test_select_carriers_matches_duckdb_oracle(spark, degrees, duck):
    sel = S.select_carriers(degrees, key="test-key-1", rate=0.1)
    got = sorted((r.id, r.degree, r.selection_order, r.blk) for r in sel.collect())

    deg_pdf = degrees.toPandas()
    duck.register("deg_input", deg_pdf)
    sql = S.carrier_selection_oracle_sql("SELECT id, degree FROM deg_input", "test-key-1", 0.1)
    expect = sorted(tuple(t) for t in duck.execute(sql).fetchall())
    duck.unregister("deg_input")
    assert got == expect


def test_knn_join_cross_table_matches_bruteforce(emb):
    """knn_join: every probe row gets its k nearest BUILD rows; identity rows
    are kept (dist2=0 self-match is standard join semantics)."""
    probe = emb.filter(F.col("id") < 50)
    build = emb.filter(F.col("id") >= 50)
    got = {}
    for r in K.knn_join(probe, build, k=5).collect():
        got.setdefault(r.src, []).append((r.rank, r.dst))

    pp = probe.toPandas()
    bp = build.toPandas()
    bids = bp["id"].to_numpy(np.int64)
    B = np.stack(bp["emb"].map(lambda a: np.asarray(a, np.float64)))
    for _, row in pp.iterrows():
        x = np.asarray(row["emb"], np.float64)
        d2 = ((B - x[None, :]) ** 2).sum(-1)
        order = np.lexsort((bids, d2))[:5]
        expect = [(rk + 1, int(bids[j])) for rk, j in enumerate(order)]
        assert sorted(got[int(row["id"])]) == expect


def test_knn_join_self_overlap_matches_at_zero(emb):
    # a probe id also in the build side must match itself at rank 1; the
    # float32 GEMM leaves a cancellation residue on x=y (the same effect
    # DUP_EPS2 documents), so "zero" means <= DUP_EPS2, not == 0.0
    sub = emb.filter(F.col("id") < 30)
    got = K.knn_join(sub, sub, k=2).filter(F.col("rank") == 1).collect()
    assert len(got) == 30
    assert all(r.src == r.dst and r.dist2 <= K.DUP_EPS2 for r in got)


def test_knn_join_lsh_recall_contract(emb):
    """The LSH join's edges@k must overlap the exact join's edges@k above a
    recall floor, and every reported pair must be a genuine (probe, build)
    pair with correct ordering per src."""
    probe = emb.filter(F.col("id") < 100)
    build = emb.filter(F.col("id") >= 100)
    exact = {(r.src, r.dst) for r in K.knn_join(probe, build, k=8, method="broadcast").collect()}
    lsh_rows = K.knn_join(probe, build, k=8, method="lsh", key="jt", n_tables=12, n_bits=3).collect()
    lsh = {(r.src, r.dst) for r in lsh_rows}
    assert all(s < 100 <= d for s, d in lsh)
    recall = len(exact & lsh) / len(exact)
    assert recall >= 0.85, f"recall {recall:.3f}"
    by_src = {}
    for r in lsh_rows:
        by_src.setdefault(r.src, []).append((r.rank, r.dist2))
    for ranks in by_src.values():
        ranks.sort()
        assert [r for r, _ in ranks] == list(range(1, len(ranks) + 1))
        assert all(ranks[i][1] <= ranks[i + 1][1] for i in range(len(ranks) - 1))


def test_salted_join_equals_plain_join(spark):
    """salted_join must equal the unsalted join for any salt count and any
    input partitioning (the salt spreads hot keys; it must never change
    the result multiset)."""
    from vectordb_watermark_spark.operators.partitioning import salted_join

    # skewed left: key 0 holds half the rows
    left = spark.range(2000).selectExpr(
        "CASE WHEN id % 2 = 0 THEN 0 ELSE id % 7 END AS k", "id AS lval"
    )
    right = spark.range(7).selectExpr("id AS k", "id * 100 AS rval")
    plain = sorted(
        tuple(r) for r in left.join(right, "k").select("k", "lval", "rval").collect()
    )
    for n_salts, parts in [(4, 1), (16, 13)]:
        got = sorted(
            tuple(r)
            for r in salted_join(left.repartition(parts), right, ["k"], n_salts=n_salts)
            .select("k", "lval", "rval")
            .collect()
        )
        assert got == plain


def test_salted_join_rejects_right_and_full_outer(spark):
    """Right/full outer would emit each unmatched right row n_salts times
    (the right side is exploded per salt) — the API must refuse them."""
    import pytest

    from vectordb_watermark_spark.operators.partitioning import salted_join

    left = spark.range(10).selectExpr("id AS k", "id AS lval")
    right = spark.range(10).selectExpr("id AS k", "id AS rval")
    for how in ("right", "right_outer", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(left, right, ["k"], how=how)
    # the supported flavors still construct a plan
    for how in ("inner", "left", "left_semi", "left_anti"):
        salted_join(left, right, ["k"], how=how).schema
