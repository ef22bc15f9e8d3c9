"""Tests for the training/calibration path (M4), visualization operators
(M5), catalog introspection (C1-C6), and legacy selection (J6/J7)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_TINY, load
from vectordb_watermark_spark import training as TR
from vectordb_watermark_spark.operators import viz as VZ
from vectordb_watermark_spark.operators.knn import in_degrees, knn_edges_exact
from vectordb_watermark_spark.operators.selection import (
    load_carriers,
    save_carriers,
    select_by_threshold,
    select_carriers,
)
from vectordb_watermark_spark.sources import catalog as C


@pytest.fixture(scope="module")
def vectors(spark):
    return (
        load(spark, "embeddings")
        .select(F.col("vec_id").alias("id"), F.col("embedding").alias("emb"))
        .cache()
    )


# ---------------------------------------------------------------------------
# training / calibration
# ---------------------------------------------------------------------------

def test_train_codec_writes_checkpoint_and_loads(spark, vectors, tmp_path):
    ckpt = TR.train_codec(vectors, key="train-key", results_dir=str(tmp_path))
    assert ckpt["dim"] == 64
    assert ckpt["grade"] in ("excellent", "good", "poor")
    assert ckpt["val_ber"] <= 0.08  # clean+mild-noise curriculum on 64d
    assert TR.model_exists(64, str(tmp_path))
    codec = TR.load_codec(64, "train-key", str(tmp_path))
    assert codec.delta == ckpt["delta"]
    # history covers the adaptive grid, BER reported per delta
    assert len(ckpt["history"]) >= 3
    assert all(0.0 <= h["val_ber"] <= 0.5 for h in ckpt["history"])


def test_load_codec_without_checkpoint_falls_back(tmp_path):
    codec = TR.load_codec(64, "k", str(tmp_path / "nope"))
    assert codec.delta == pytest.approx(0.08)


def test_adaptive_params_scale_with_dim():
    p64, p384 = TR.adaptive_params(64), TR.adaptive_params(384)
    assert max(p64["delta_grid"]) > max(p384["delta_grid"])


def test_torch_trainer_is_import_gated():
    with pytest.raises((ImportError, NotImplementedError)):
        TR.TorchTrainer()


# ---------------------------------------------------------------------------
# viz
# ---------------------------------------------------------------------------

def test_pairwise_stats_shape_and_bounds(vectors):
    row = VZ.pairwise_stats(vectors, max_rows=200).first()
    assert row["n_pairs"] > 100
    assert row["mean_dist"] > 0
    assert -1.0 <= row["min_cos"] <= row["mean_cos"] <= row["max_cos"] <= 1.0


def test_distributed_pca_matches_numpy(spark, vectors):
    mean, comps = VZ.distributed_pca(vectors, k=2)
    X = np.stack([np.asarray(r["emb"], dtype=np.float64) for r in vectors.collect()])
    assert np.allclose(mean, X.mean(axis=0), atol=1e-9)
    cov = np.cov(X, rowvar=False, bias=True)
    vals, vecs = np.linalg.eigh(cov)
    top2 = vecs[:, np.argsort(vals)[::-1][:2]]
    # compare up to sign
    for c in range(2):
        dot = abs(float(top2[:, c] @ comps[:, c]))
        assert dot > 0.999


def test_project_2d_deterministic(vectors):
    a = {r["id"]: (r["x"], r["y"]) for r in VZ.project_2d(vectors, max_rows=100).collect()}
    b = {r["id"]: (r["x"], r["y"]) for r in VZ.project_2d(vectors, max_rows=100).collect()}
    assert a == b
    assert len(a) > 30


def test_tsne_import_gated(vectors):
    try:
        import sklearn  # noqa: F401
        pytest.skip("sklearn present; t-SNE path exercised implicitly")
    except ImportError:
        with pytest.raises(ImportError, match="scikit-learn"):
            VZ.project_2d(vectors, method="tsne")


# ---------------------------------------------------------------------------
# catalog
# ---------------------------------------------------------------------------

def test_catalog_register_and_introspect(spark):
    names = C.register_dir(spark, SF_TINY)
    assert "embeddings" in names and "lineitem" in names
    assert set(names) <= set(C.list_tables(spark))
    assert C.list_vector_columns(spark, "embeddings") == ["embedding"]
    assert C.list_vector_columns(spark, "lineitem") == []
    keys = C.list_key_candidates(spark, "embeddings")
    assert "vec_id" in keys
    assert C.is_unique_key(spark, "embeddings", "vec_id")
    assert not C.is_unique_key(spark, "lineitem", "l_orderkey")
    assert C.vector_dimension(spark, "embeddings", "embedding") == 64
    desc = {r["table"]: r for r in C.describe_catalog(spark).collect()}
    assert desc["embeddings"]["vector_columns"] == ["embedding"]


# ---------------------------------------------------------------------------
# legacy selection + persistence
# ---------------------------------------------------------------------------

def test_select_by_threshold_and_persistence(spark, vectors, tmp_path):
    degrees = in_degrees(vectors, knn_edges_exact(vectors, k=8)).cache()
    legacy = select_by_threshold(degrees, max_degree=5)
    rows = legacy.collect()
    assert all(r["degree"] <= 5 for r in rows)
    ordered = [(r["degree"], r["id"]) for r in rows]
    assert ordered == sorted(ordered)

    carriers = select_carriers(degrees, key="k", rate=0.1)
    path = str(tmp_path / "carriers")
    save_carriers(carriers, path)
    back = load_carriers(spark, path)
    assert {tuple(r) for r in back.collect()} == {
        tuple(r) for r in carriers.select("id", "degree", "selection_order", "blk").collect()
    }


# ---------------------------------------------------------------------------
# io helpers (S7/S11/P14) + union viz (JN5)
# ---------------------------------------------------------------------------

def test_load_npy_roundtrip(spark, tmp_path):
    import numpy as np
    from vectordb_watermark_spark.sources.io import load_npy

    mat = np.arange(12, dtype=np.float32).reshape(3, 4)
    p = str(tmp_path / "m.npy")
    np.save(p, mat)
    df = load_npy(spark, p)
    rows = {r["id"]: r["emb"] for r in df.collect()}
    assert len(rows) == 3
    assert rows[1] == [0.0, 1.0, 2.0, 3.0]
    assert df.schema.simpleString() == "struct<id:bigint,emb:array<float>>"


def test_truncate_and_identifier(spark, vectors):
    from vectordb_watermark_spark.sources.io import truncate_table, validate_identifier

    assert truncate_table(vectors).count() == 0
    assert truncate_table(vectors).schema == vectors.schema
    assert validate_identifier("ok_name1") == "ok_name1"
    import pytest as _pytest
    with _pytest.raises(ValueError):
        validate_identifier("bad;drop")


def test_project_2d_compare_shared_basis(spark, vectors):
    from vectordb_watermark_spark.operators.viz import project_2d_compare

    shifted = vectors.withColumn("emb", F.transform("emb", lambda x: x + F.lit(0.5)))
    out = project_2d_compare(vectors, shifted, max_rows=120)
    rows = out.collect()
    srcs = {r["source"] for r in rows}
    assert srcs == {"original", "watermarked"}
    # shared basis: the constant shift must separate the two clouds' means
    import numpy as np
    xs = {s: np.mean([r["x"] for r in rows if r["source"] == s]) for s in srcs}
    assert abs(xs["original"] - xs["watermarked"]) > 0.01


# ---------------------------------------------------------------------------
# JDBC pgvector wrapper: pure pieces (no database/driver in this environment)
# ---------------------------------------------------------------------------

def test_pgvector_text_codec_roundtrip(spark):
    """vector-text parse/render must round-trip through Catalyst expressions,
    including spaces and scientific notation from pgvector's output."""
    from vectordb_watermark_spark.sources.io import array_to_pgvector, pgvector_to_array

    df = spark.createDataFrame(
        [("[0.1,0.25,-3]",), ("[1e-05, 2.5E2 ,0]",)], "v string"
    ).withColumn("arr", pgvector_to_array("v"))
    rows = df.select("arr").collect()
    assert [round(x, 6) for x in rows[0]["arr"]] == [0.1, 0.25, -3.0]
    assert [round(x, 6) for x in rows[1]["arr"]] == [1e-05, 250.0, 0.0]

    back = (
        df.select(array_to_pgvector("arr").alias("txt"))
        .select(pgvector_to_array("txt").alias("arr2"))
        .collect()
    )
    assert back[0]["arr2"] == rows[0]["arr"]
    assert back[1]["arr2"] == rows[1]["arr"]


def test_merge_from_staging_sql():
    from vectordb_watermark_spark.sources.io import merge_from_staging_sql

    sql = merge_from_staging_sql("vectors", "vectors_staging")
    assert sql == (
        "UPDATE vectors t SET embedding = s.embedding::vector "
        "FROM vectors_staging s WHERE t.id = s.id"
    )
    sql2 = merge_from_staging_sql(
        "t1", "st", key_col="pk", update_cols=["embedding", "label"]
    )
    assert "embedding = s.embedding::vector" in sql2
    assert "label = s.label" in sql2 and "::vector" not in sql2.split("label")[1]


def test_read_jdbc_vectors_requires_driver(spark):
    """Without a JDBC driver jar the read must fail at the JDBC layer (no
    silent empty frame) — documents the gating for live-database use."""
    from vectordb_watermark_spark.sources.io import read_jdbc_vectors

    with pytest.raises(Exception):
        read_jdbc_vectors(
            spark, "jdbc:postgresql://localhost:5432/nope", "vectors",
            lower=0, upper=10, num_partitions=2,
        ).schema


def test_train_learned_codec_spark_wrapper(spark, tmp_path):
    """The Spark-side wrapper: S5 scan -> sample -> torch-free trainer ->
    npz checkpoint at model_path(dim) loadable by TorchCodec."""
    import numpy as np

    from vectordb_watermark_spark.plans.codec import TorchCodec
    from vectordb_watermark_spark.training import train_learned_codec

    df = load(spark, "embeddings").select(F.col("embedding").alias("emb"))
    out = train_learned_codec(
        df, sample_limit=400, results_dir=str(tmp_path), epochs=2, batch_size=128
    )
    assert out["model_path"].endswith("vector_64d/best.npz")
    assert len(out["history"]) == 2
    codec = TorchCodec(64, checkpoint_path=out["model_path"])
    w = codec.encode_batch(np.ones((2, 64), dtype=np.float32), np.array([1, 2]))
    assert w.shape == (2, 64)

    # the check-model-first flow must now SEE the learned checkpoint:
    # model_exists probes both kinds and load_codec returns the TorchCodec
    # (previously it silently fell back to OrthogonalCodec — embed/extract
    # never picked up a learned model)
    from vectordb_watermark_spark.training import load_codec, model_exists, model_info

    assert model_exists(64, str(tmp_path))
    info = model_info(64, str(tmp_path))
    assert info["learned_exists"] and info["active"] == "learned"
    assert not info["calibrated_exists"]
    loaded = load_codec(64, "any-key", str(tmp_path))
    assert isinstance(loaded, TorchCodec)
    # and the loaded codec decodes what it encodes (sanity, not accuracy)
    got = loaded.decode_batch(loaded.encode_batch(
        np.random.default_rng(0).standard_normal((4, 64)).astype(np.float32),
        np.array([5, 6, 7, 8]),
    ))
    assert got.shape == (4,)


def test_cli_verbs_roundtrip(spark, tmp_path):
    """The reference's backend API verbs as CLI subcommands: catalog probes,
    embed -> extract roundtrip, attack sink, evaluation report — each
    printing one JSON object."""
    import contextlib
    import io
    import json

    from vectordb_watermark_spark import cli

    def run(argv):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            assert cli.main(argv) == 0
        return json.loads(buf.getvalue().strip().splitlines()[-1])

    tab = f"{SF_TINY}/embeddings.parquet"
    remap = ["--id-col", "vec_id", "--vec-col", "embedding"]
    assert "embeddings" in run(["tables", SF_TINY])["tables"]
    assert run(["dim", tab, *remap])["dimension"] == 64
    assert run(["check-model", "64", "--results-dir", str(tmp_path)])["exists"] is False
    emb = run(["embed", tab, *remap, "--message", "ABCDEFGHIJKLMNOP",
               "--key", "k1", "--rate", "0.2", "--out", str(tmp_path / "wm")])
    assert emb["embedded"] and emb["carriers"] == 100
    ext = run(["extract", str(tmp_path / "wm"), "--key", "k1",
               "--nonce", emb["nonce_hex"], "--rate", "0.2"])
    assert ext["success"] and ext["message"] == "ABCDEFGHIJKLMNOP"
    atk = run(["attack", str(tmp_path / "wm"), "--kind", "subset",
               "--ratio", "0.8", "--out", str(tmp_path / "atk")])
    assert 300 < atk["rows"] < 500
    ev = run(["evaluate", tab, *remap])
    assert ev["ber"] == 0.0 and ev["crc_valid_rate"] == 1.0


def test_jdbc_derby_roundtrip(spark, tmp_path):
    """End-to-end JDBC writeback against a REAL JDBC endpoint: Spark ships
    Apache Derby (embedded, in-memory), so the stage -> server-side merge ->
    partitioned re-read cycle runs for real — the same shape as the pgvector
    writeback (stage_jdbc_updates + merge_from_staging_sql), minus the
    ::vector cast (ansi dialect).  Identifiers are uppercase because Spark's
    JDBC writer quotes them and Derby is case-sensitive for quoted names."""
    import numpy as np

    from vectordb_watermark_spark.sources.io import (
        merge_from_staging_sql,
        read_jdbc_vectors,
        stage_jdbc_updates,
    )

    url = "jdbc:derby:memory:wmtest;create=true"
    rng = np.random.default_rng(3)
    base = [(i, [float(round(x, 4)) for x in rng.standard_normal(8)]) for i in range(40)]
    updated = [(i, [float(round(x, 4)) for x in rng.standard_normal(8)])
               for i, _ in base[:15]]

    df = spark.createDataFrame(base, "ID long, EMBEDDING array<float>")
    # target table: initial state
    stage_jdbc_updates(df, url, "VECTORS", vec_col="EMBEDDING")
    # staging table: the 15 re-encoded rows
    stage_jdbc_updates(
        spark.createDataFrame(updated, "ID long, EMBEDDING array<float>"),
        url, "STAGING", vec_col="EMBEDDING",
    )

    # server-side set-based merge (one statement, not a per-row loop)
    sql = merge_from_staging_sql("VECTORS", "STAGING", key_col="ID",
                                 vec_col="EMBEDDING", dialect="ansi")
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        st.executeUpdate(sql)
        st.close()
    finally:
        conn.close()

    # partitioned re-read with in-plan text->array parse + derived bounds
    back = read_jdbc_vectors(spark, url, "VECTORS", id_col="ID",
                             vec_col="EMBEDDING", num_partitions=4)
    assert back.rdd.getNumPartitions() == 4
    got = {r["ID"]: list(r["EMBEDDING"]) for r in back.collect()}
    want = dict(base)
    want.update(dict(updated))
    assert set(got) == set(want)
    for i, vec in want.items():
        assert np.allclose(got[i], vec, atol=1e-6), i


def test_write_with_bloom_emits_bloom_filters(spark, tmp_path):
    """The parquet files must actually carry the bloom filter (this
    pyarrow's metadata API doesn't expose bloom offsets, so the check is
    behavioral: the bloomed file grows by ~the sized filter vs an identical
    plain write) and the table must read back correctly — the S4
    point-lookup pruning lever at 100 TB."""
    import glob
    import os

    from vectordb_watermark_spark.sources.io import write_with_bloom

    df = spark.range(0, 5000).selectExpr("id", "id * 2 AS payload").coalesce(1)
    bloomed = str(tmp_path / "bloomed")
    plain = str(tmp_path / "plain")
    write_with_bloom(df, bloomed, ["id"], ndv=5000)
    df.write.mode("overwrite").parquet(plain)

    nbytes = lambda d: sum(
        os.path.getsize(p) for p in glob.glob(f"{d}/part-*.parquet")
    )
    delta = nbytes(bloomed) - nbytes(plain)
    # an ndv=5000 split-block bloom filter is ~8 KiB; identical data
    # otherwise, so the delta IS the filter
    assert 4096 < delta < 64 * 1024, delta

    back = spark.read.parquet(bloomed)
    assert back.count() == 5000
    assert back.filter(F.col("id") == 4321).first()["payload"] == 8642


def test_group_split_atomic_deterministic_partition_invariant(spark):
    """Leakage guard (round 11): every row of a group lands on ONE side,
    the split is a pure function of (key, group value) — re-runs and
    repartitionings agree — and the val fraction is honored over groups."""
    import pytest

    from vectordb_watermark_spark.operators.quality import group_split

    rows = [(i, f"domain-{i % 97}") for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, domain string")

    out = group_split(df, "domain", val_frac=0.3, key="k1")
    # group atomicity: one split value per domain
    per = out.groupBy("domain").agg(
        F.countDistinct("split").alias("n")
    ).collect()
    assert all(r["n"] == 1 for r in per)
    # fraction honored over GROUPS (97 domains, expectation 0.3)
    val_domains = {
        r["domain"] for r in out.filter("split = 'val'").select("domain").distinct().collect()
    }
    assert 0.15 <= len(val_domains) / 97 <= 0.45
    # deterministic + partition-invariant
    a = {(r["id"], r["split"]) for r in out.collect()}
    b = {
        (r["id"], r["split"])
        for r in group_split(df.repartition(13), "domain", 0.3, key="k1").collect()
    }
    assert a == b
    # a different key reshuffles the groups
    c = {
        r["domain"]
        for r in group_split(df, "domain", 0.3, key="k2")
        .filter("split = 'val'").select("domain").distinct().collect()
    }
    assert c != val_domains
    with pytest.raises(ValueError, match="val_frac"):
        group_split(df, "domain", val_frac=1.5)


def test_profile_columns_contracts(spark):
    """Column profiling: nulls / exact distincts / min-max strings match
    hand counts, complex columns degrade to null min/max but still count
    distincts, approx mode stays within its rsd on a known cardinality,
    and unknown columns fail loudly."""
    import pytest as _pytest

    from vectordb_watermark_spark.operators.quality import profile_columns

    rows = [
        (1, "a", [1.0, 2.0]),
        (2, "b", [1.0, 2.0]),
        (2, None, [3.0]),
        (None, "b", None),
    ]
    df = spark.createDataFrame(rows, "k long, s string, v array<double>")
    got = {
        r["column"]: r.asDict()
        for r in profile_columns(df, exact_distinct=True).collect()
    }
    assert got["k"]["n_rows"] == 4
    assert got["k"]["n_null"] == 1 and got["k"]["n_distinct"] == 2
    assert (got["k"]["min_val"], got["k"]["max_val"]) == ("1", "2")
    assert got["s"]["n_null"] == 1 and got["s"]["n_distinct"] == 2
    assert (got["s"]["min_val"], got["s"]["max_val"]) == ("a", "b")
    # complex column: distinct via canonical json, no ordering
    assert got["v"]["n_distinct"] == 2 and got["v"]["n_null"] == 1
    assert got["v"]["min_val"] is None and got["v"]["max_val"] is None

    # approx mode: HLL++ within rsd at a known cardinality
    big = spark.range(5000).select(F.col("id").alias("k"))
    est = {
        r["column"]: r["n_distinct"]
        for r in profile_columns(big, rsd=0.02).collect()
    }["k"]
    assert abs(est - 5000) <= 5000 * 0.06

    with _pytest.raises(ValueError, match="unknown columns"):
        profile_columns(df, columns=["nope"])
    with _pytest.raises(ValueError, match="no columns"):
        profile_columns(df, columns=[])


def test_snapshot_backup_roundtrip(spark, tmp_path):
    """S10 backup sink: snapshot -> read back preserves rows, schema and
    vector payloads exactly (the reference's .npz carrier backup as a
    columnar snapshot); overwrite replaces, error mode refuses."""
    import pytest as _pytest

    from vectordb_watermark_spark.sources.io import snapshot

    rows = [(i, [float(i), float(-i)]) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, emb array<float>")
    path = str(tmp_path / "backup")
    snapshot(df, path)
    back = spark.read.parquet(path)
    assert back.schema == df.schema
    got = sorted((r["id"], list(r["emb"])) for r in back.collect())
    assert got == [(i, [float(i), float(-i)]) for i in range(50)]

    snapshot(df.filter(F.col("id") < 10), path)  # overwrite replaces
    assert spark.read.parquet(path).count() == 10
    with _pytest.raises(Exception):
        snapshot(df, path, mode="error")
