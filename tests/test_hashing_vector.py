"""M0: keyed-hash randomness portability (Spark == DuckDB) and vector math."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectordb_watermark_spark.functions import hashing as H
from vectordb_watermark_spark.functions import vector as V
from tests.conftest import load


def test_keyed_hash_matches_duckdb(spark, duck):
    ids = list(range(100))
    df = spark.createDataFrame([(i,) for i in ids], "id bigint")
    got = {
        r.id: (r.hex, r.u, r.g)
        for r in df.select(
            "id",
            H.keyed_hash_hex("test-key", F.col("id")).alias("hex"),
            H.keyed_uniform("test-key", F.col("id")).alias("u"),
            H.hash_gauss(H.keyed_hash_hex("test-key", F.col("id"))).alias("g"),
        ).collect()
    }
    hex_sql = H.sql_keyed_hash_hex("'test-key'", "id")
    rows = duck.execute(
        f"""SELECT id, {hex_sql} AS hex, {H.sql_hash_uniform(hex_sql)} AS u,
                   {H.sql_hash_gauss(hex_sql)} AS g
            FROM (SELECT unnest(range(100)) AS id)"""
    ).fetchall()
    for i, hx, u, g in rows:
        shex, su, sg = got[i]
        assert shex == hx
        assert abs(su - u) < 1e-12
        assert abs(sg - g) < 1e-9  # libm cos/log may differ by ulps


def test_hash_uniform_distribution(spark):
    n = 20000
    df = spark.range(n).select(H.keyed_uniform("dist-key", F.col("id")).alias("u"))
    stats = df.agg(F.avg("u").alias("m"), F.stddev_samp("u").alias("s"),
                   F.min("u").alias("lo"), F.max("u").alias("hi")).first()
    assert abs(stats.m - 0.5) < 0.01
    assert abs(stats.s - math.sqrt(1 / 12)) < 0.01
    assert 0 < stats.lo and stats.hi < 1


def test_hash_gauss_distribution(spark):
    n = 20000
    df = spark.range(n).select(
        H.hash_gauss(H.keyed_hash_hex("g-key", F.col("id"))).alias("g")
    )
    stats = df.agg(F.avg("g").alias("m"), F.stddev_samp("g").alias("s")).first()
    assert abs(stats.m) < 0.03
    assert abs(stats.s - 1.0) < 0.03


def test_hash_deterministic_under_repartition(spark):
    df1 = spark.range(1000).repartition(1).select(
        "id", H.keyed_uniform("k", F.col("id")).alias("u"))
    df2 = spark.range(1000).repartition(16).select(
        "id", H.keyed_uniform("k", F.col("id")).alias("u"))
    a = {r.id: r.u for r in df1.collect()}
    b = {r.id: r.u for r in df2.collect()}
    assert a == b


# ---------------------------------------------------------------------------
# vector math vs numpy
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def emb_pdf(spark):
    return load(spark, "embeddings").select("vec_id", "embedding").limit(50).toPandas()


def test_vector_ops_match_numpy(spark, emb_pdf):
    df = spark.createDataFrame(emb_pdf)
    e = F.col("embedding")
    rows = df.select(
        "vec_id",
        V.l2_norm(e).alias("norm"),
        V.dot(e, e).alias("self_dot"),
        V.sq_euclidean(e, e).alias("self_dist"),
        V.cosine_similarity(e, e).alias("self_cos"),
        V.l2_norm(V.l2_normalize(e)).alias("unit_norm"),
    ).collect()
    by_id = {r.vec_id: r for r in rows}
    for _, p in emb_pdf.iterrows():
        v = np.asarray(p.embedding, dtype=np.float64)
        r = by_id[p.vec_id]
        assert abs(r.norm - np.linalg.norm(v)) < 1e-9
        assert abs(r.self_dot - v @ v) < 1e-9
        assert r.self_dist == 0.0
        assert abs(r.self_cos - 1.0) < 1e-9
        assert abs(r.unit_norm - 1.0) < 1e-6


def test_norm_save_restore_roundtrip(spark, emb_pdf):
    """normalize -> restore norm reproduces the original vector (P5 semantics,
    reference pg_func.py:363-377)."""
    df = spark.createDataFrame(emb_pdf)
    e = F.col("embedding")
    restored = df.select(
        "vec_id", "embedding",
        V.scale(V.l2_normalize(e), V.l2_norm(e)).alias("restored"),
    ).collect()
    for r in restored:
        orig = np.asarray(r.embedding, dtype=np.float64)
        back = np.asarray(r.restored, dtype=np.float64)
        assert np.allclose(orig, back, atol=1e-6)


def test_vector_mean_matches_numpy(spark, emb_pdf):
    df = spark.createDataFrame(emb_pdf)
    mean_vec = V.vector_mean(df, "embedding").first().mean_vec
    expected = np.mean(np.stack(emb_pdf.embedding.map(np.asarray)), axis=0)
    assert np.allclose(np.asarray(mean_vec), expected, atol=1e-9)


def test_vector_stats_schema(spark, emb_pdf):
    df = spark.createDataFrame(emb_pdf)
    row = V.vector_stats(df, "embedding").first()
    assert row.n_vectors == len(emb_pdf)
    assert row.min_norm <= row.avg_norm <= row.max_norm


def test_embedding_outlier_flags_planted(spark):
    """A planted corrupted vector (one coordinate blown up) is flagged;
    clean clustered vectors are not; constant dims only trip on deviation."""
    import numpy as np

    from vectordb_watermark_spark.functions.vector import embedding_outlier_flags

    rng = np.random.default_rng(7)
    rows = []
    for i in range(60):
        v = (0.01 * rng.standard_normal(8)).tolist()
        v[3] = 1.0  # near-constant dimension
        rows.append((i, [float(x) for x in v]))
    rows.append((100, [0.0, 0.0, 0.0, 1.0, 50.0, 0.0, 0.0, 0.0]))  # blown dim 4
    df = spark.createDataFrame(rows, "id long, emb array<float>")
    out = {r["id"]: r for r in embedding_outlier_flags(df).collect()}
    assert out[100]["outlier"] and out[100]["n_outlier_dims"] >= 1
    flagged = [i for i, r in out.items() if r["outlier"]]
    assert flagged == [100]


def test_embedding_outlier_flags_near_dead_dim(spark):
    """ADVICE r8: a near-constant dim (true MAD below the 6-dp rounding
    grain, e.g. float32 noise on a dead embedding dim) must NOT flag the
    whole corpus — the absolute threshold floor absorbs sub-1e-6 noise.
    A genuine deviation in that dim (> 1e-6) still trips."""
    import numpy as np

    from vectordb_watermark_spark.functions.vector import embedding_outlier_flags

    rng = np.random.default_rng(11)
    rows = []
    for i in range(60):
        v = (0.01 * rng.standard_normal(4)).tolist()
        # near-dead dim: float32-noise-scale jitter around 0.5, MAD ~ 2e-8
        v[2] = 0.5 + float(rng.standard_normal()) * 2e-8
        rows.append((i, [float(x) for x in v]))
    # one genuine deviation in the near-dead dim
    rows.append((200, [0.0, 0.0, 0.6, 0.0]))
    df = spark.createDataFrame(rows, "id long, emb array<float>")
    out = {r["id"]: r for r in embedding_outlier_flags(df).collect()}
    flagged = sorted(i for i, r in out.items() if r["outlier"])
    assert flagged == [200], f"near-dead dim degenerated the gate: {flagged[:10]}"
