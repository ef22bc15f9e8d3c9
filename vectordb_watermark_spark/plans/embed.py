"""EMBED pipeline — the engine's re-expression of the reference's
``embed_watermark`` dataflow (database/pgvector/pg_func.py:616-720,
lifecycle documented in SURVEY.md §3.1).

One declarative lineage::

    scan -> knn_edges -> in_degrees -> select_carriers -> payload assembly
         -> mapInArrow(codec.encode) -> merge_update

The driver only touches scalars (message encryption, block payload table);
every per-row step is distributed.  Shuffle inventory (what matters at
100 TB): one shuffle for the degree groupBy, one tiny boundary window in
selection, one join of carriers back to vectors (broadcast when carriers are
small relative to the table), one shuffle in the final merge.  The kNN stage
dominates — choose its method per table size (operators/knn.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectordb_watermark_spark.functions import bits as B
from vectordb_watermark_spark.functions import crypto as C
from vectordb_watermark_spark.operators import knn as K
from vectordb_watermark_spark.operators.selection import select_carriers
from vectordb_watermark_spark.plans.codec import with_graph_features
from vectordb_watermark_spark.sources.io import merge_update, vector_dim


@dataclass
class EmbedResult:
    updated: DataFrame        # full table, carrier vectors watermarked
    carriers: DataFrame       # (id, degree, selection_order, blk)
    cipher32: str
    nonce_hex: str
    n_carriers: int
    embed_rate: float
    #: embed-time pinning metadata (persist NEXT TO the nonce): the RESOLVED
    #: kNN method ('auto' is resolved against the embed-time row count, so a
    #: later extract never re-dispatches on a changed count), k, rate, dim,
    #: and the codec kind + content fingerprint.  extract_watermark accepts
    #: this dict as ``embed_meta``: the pinned knn_method/k/rate drive the
    #: blind re-derivation, and a mismatched graph/codec rebuild raises
    #: plans.extract.EmbedMetaMismatchError instead of silently decoding
    #: nothing.  JSON-serializable by construction.
    metadata: dict | None = None


def _msg24_col(blk: F.Column, payloads: list[int]) -> F.Column:
    """24-bit per-carrier message: 4-bit block idx | 4-bit CRC | 16-bit payload
    (reference layout, pg_func.py:349-358) as a packed int — pure Catalyst."""
    payload_arr = F.array(*[F.lit(p) for p in payloads])
    payload = F.element_at(payload_arr, blk + F.lit(1))
    crc = B.crc4_int_col(blk)
    return (blk.cast("long") * F.lit(1 << 20) + crc.cast("long") * F.lit(1 << 16) + payload).alias(
        "msg24"
    )


def encode_carriers(
    vectors: DataFrame, carriers_msg: DataFrame, codec, id_col: str = "id", vec_col: str = "emb"
) -> DataFrame:
    """Run the codec over carrier rows: (id, emb, msg24) -> (id, emb_stego).

    ``mapInArrow``: vectors move Arrow-buffer -> numpy matrix with no
    per-element Python boxing (functions/arrowmat.py); the codec re-derives
    its basis/weights once per python worker (executor-cached), then encodes
    whole batches — the vectorized replacement for the reference's per-row
    torch loop (pg_func.py:369-375).
    """
    import pyarrow as pa

    from vectordb_watermark_spark.functions.arrowmat import (
        list_array_to_matrix,
        matrix_to_list_array,
    )

    joined = vectors.join(carriers_msg, id_col).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("emb"), "msg24"
    )

    def kernel(batches: "Iterator[pa.RecordBatch]") -> "Iterator[pa.RecordBatch]":
        for rb in batches:
            if not rb.num_rows:
                continue
            V = list_array_to_matrix(rb.column(1))
            stego = codec.encode_batch(V, rb.column(2).to_numpy().astype(np.int64, copy=False))
            yield pa.RecordBatch.from_arrays(
                [rb.column(0), matrix_to_list_array(stego)], names=["id", "emb"]
            )

    return joined.mapInArrow(kernel, schema="id long, emb array<float>")


def embed_watermark(
    df: DataFrame,
    message: str,
    key: str,
    rate: float = 0.1,
    id_col: str = "id",
    vec_col: str = "emb",
    knn_method: str = "auto",
    k: int = K.DEFAULT_K,
    codec=None,
    results_dir: str | None = None,
    nonce: bytes | None = None,
    degrees: DataFrame | None = None,
) -> EmbedResult:
    """Embed a 16-char ``message`` into ``rate`` of the table's vectors.

    ``degrees`` may be supplied to reuse a precomputed degree table (e.g.
    when experimenting with several keys over one corpus).  ``nonce`` is for
    deterministic tests only.  For production embeds pin ``knn_method``
    explicitly (and reuse it at extract): ``'auto'`` dispatches on the
    current row count, and blind extraction must rebuild the graph the same
    way it was built here (see operators/knn.knn_edges).
    """
    if len(message) != 16:
        raise ValueError("message must be exactly 16 characters")
    if not key:
        raise ValueError("encryption key must be non-empty")
    if not (0 < rate <= 1):
        raise ValueError("embed rate must be in (0, 1]")

    cipher32, nonce_hex = C.encrypt_message_to_32chars(message, key, nonce=nonce)
    payloads = B.partition_message(cipher32)

    if codec is None:
        # check-model-first flow (ref pg_func.py:683): a calibrated
        # checkpoint from training.train_codec, when present for this
        # dimension, overrides the adaptive default delta.
        from vectordb_watermark_spark.training import DEFAULT_RESULTS_DIR, load_codec

        codec = load_codec(
            vector_dim(df, vec_col), key,
            DEFAULT_RESULTS_DIR if results_dir is None else results_dir,
        )

    resolved_method = knn_method
    if degrees is None:
        # the graph is built on watermark-invariant features so extraction
        # re-derives the identical graph (plans/codec.py graph_features).
        # gfeat is cached because the kNN build reads it twice (build side +
        # probe side); degrees is cached because carrier selection issues
        # several small driver actions (count, degree histogram) over it.
        gdf = with_graph_features(df, codec, id_col, vec_col).cache()
        # resolve 'auto' HERE and pin the concrete method in the returned
        # metadata: blind extraction must rebuild the graph the same way,
        # and a count-dispatched 'auto' diverges when rows were added,
        # deleted (subset attack), or the crossover thresholds moved
        resolved_method, total = K.resolve_knn_method(gdf, knn_method)
        kn_kwargs = {"total": total} if resolved_method == "lsh" and total else {}
        edges = K.knn_edges(gdf, id_col, "gfeat", k=k, method=resolved_method, **kn_kwargs)
        # distance-gated degrees (knn.gated_in_degrees): long edges from
        # off-manifold (attacked/destroyed) vectors are pruned and such
        # vectors are excluded from the carrier pool — the same rule at
        # embed and extract, so clean blind re-derivation stays exact.
        # localCheckpoint (not cache): every downstream action (selection
        # count/windows, encode join, merge, and the extract side's decode +
        # tally when chained) re-analyzes the full lineage under a cache —
        # graph features -> Arrow kNN probe -> tau windows -> degree groupBy
        # — and that Catalyst work is a measured 0.4-0.9 s driver gap per
        # action at bench scale (tools/wm_jobs_profile.py).  The checkpoint
        # truncates the plan to a LogicalRDD; the degrees table is (id,
        # degree) rows — tiny relative to the vectors at any scale.
        # Fault-tolerance tradeoff (ADVICE r14): unlike a cache, lost
        # localCheckpoint blocks are NOT rebuilt from lineage — the running
        # job aborts and the CALLER must rerun embed_watermark.  Acceptable
        # for a short-lived batch embed; a cluster with decommissioning
        # executors can pass a precomputed ``degrees`` (or use
        # connected_components-style reliable checkpointing upstream).
        degrees = K.gated_in_degrees(df, edges, id_col, k=k).localCheckpoint(eager=False)
    # one count job: select_carriers needs N anyway, and the carrier count is
    # a deterministic function of it — no second action over the carrier set
    n = degrees.count()
    carriers = select_carriers(degrees, key=key, rate=rate, id_col=id_col, total=n).cache()
    n_carriers = min(max(int(n * rate), B.BLOCK_COUNT), n)

    carriers_msg = carriers.select("id", _msg24_col(F.col("blk"), payloads))
    stego = encode_carriers(
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("emb")), carriers_msg, codec
    )
    updated = merge_update(
        df.withColumnRenamed(id_col, "id").withColumnRenamed(vec_col, "emb"),
        stego,
        key_col="id",
        update_cols=["emb"],
    ).withColumnRenamed("id", id_col).withColumnRenamed("emb", vec_col)

    return EmbedResult(
        updated=updated,
        carriers=carriers,
        cipher32=cipher32,
        nonce_hex=nonce_hex,
        n_carriers=n_carriers,
        embed_rate=rate,
        metadata={
            # 'auto' stays 'auto' only on the precomputed-degrees path,
            # where no graph was built here and the true method is the
            # caller's to record
            "knn_method": resolved_method,
            "k": int(k),
            "rate": float(rate),
            "dim": int(codec.dim),
            "codec_kind": codec.kind,
            "codec_fingerprint": codec.fingerprint(),
            "nonce_hex": nonce_hex,
        },
    )
