"""Codec evaluation harness — the reference's test.py, Spark-distributed.

Reference ``algorithms/deep_learning/test.py`` evaluates a trained codec on
a sample: embed random messages, measure (a) cosine fidelity stats between
cover and stego (test.py:50-89), (b) bit-error rate and accuracy at a
bit-error threshold (test.py:92-140), (c) CRC verification rate.  Here the
whole evaluation is ONE distributed pass: an Arrow-batched kernel encodes a
deterministic keyed-hash message per row, decodes it back, and emits per-row
(cos, bit_errors, crc_ok); a single map-side-combined aggregate produces the
report.  No driver-side loop over batches — the reference's tqdm loop
becomes ``mapInArrow`` + ``agg``.

Messages are keyed-hash-derived per row id (sha256, same discipline as every
other "random" draw in the engine), so the evaluation is deterministic under
any partitioning — which is what lets the driver gate pin its outcome
(OrthogonalCodec decodes clean data exactly: zero BER, CRC rate 1.0).
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectordb_watermark_spark.functions.bits import BLOCK_COUNT, CRC4_TABLE
from vectordb_watermark_spark.plans.codec import MSG_BITS


def _keyed_messages(ids: np.ndarray, seed: str) -> np.ndarray:
    """(B,) packed 24-bit messages with valid idx+CRC structure, derived
    from sha256(seed|id) — deterministic on any executor."""
    out = np.empty(len(ids), dtype=np.int64)
    crc = np.array(CRC4_TABLE, dtype=np.int64)
    for i, v in enumerate(ids):
        h = int(hashlib.sha256(f"{seed}|{int(v)}".encode()).hexdigest()[:15], 16)
        blk = h % BLOCK_COUNT
        payload = (h >> 8) & 0xFFFF
        out[i] = (blk << 20) | (int(crc[blk]) << 16) | payload
    return out


def evaluate_codec(
    df: DataFrame,
    codec,
    seed: str = "codec-eval",
    id_col: str = "id",
    vec_col: str = "emb",
) -> DataFrame:
    """1-row report ``(n, mean_cos, min_cos, ber, crc_valid_rate)`` for
    ``codec`` over the table — the distributed twin of reference test.py's
    evaluate_cosine_similarity / evaluate_accuracy / CRC pass."""
    from vectordb_watermark_spark.functions.arrowmat import list_array_to_matrix
    from vectordb_watermark_spark.operators.partitioning import spread_to_parallelism

    shifts = np.arange(MSG_BITS - 1, -1, -1)
    crc_tab = np.array(CRC4_TABLE, dtype=np.int64)

    def kernel(batches):
        import pyarrow as pa

        for rb in batches:
            if not rb.num_rows:
                continue
            ids = rb.column(0).to_numpy().astype(np.int64, copy=False)
            V = list_array_to_matrix(rb.column(1), dtype=np.float64)
            msgs = _keyed_messages(ids, seed)
            W = codec.encode_batch(V, msgs).astype(np.float64)
            dec = codec.decode_batch(W)
            cos = (V * W).sum(axis=1) / (
                np.linalg.norm(V, axis=1) * np.linalg.norm(W, axis=1) + 1e-12
            )
            diff = (msgs[:, None] >> shifts) & 1
            got = (dec[:, None] >> shifts) & 1
            bit_errors = (diff != got).sum(axis=1)
            blk = dec >> 20
            crc = (dec >> 16) & 0xF
            crc_ok = (blk < BLOCK_COUNT) & (crc == crc_tab[np.clip(blk, 0, 15)])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(cos, type=pa.float64()),
                    pa.array(bit_errors, type=pa.int64()),
                    pa.array(crc_ok, type=pa.bool_()),
                ],
                names=["cos", "bit_errors", "crc_ok"],
            )

    rows = spread_to_parallelism(
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    ).mapInArrow(kernel, schema="cos double, bit_errors long, crc_ok boolean")
    return rows.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("cos"), 6).alias("mean_cos"),
        F.round(F.min("cos"), 6).alias("min_cos"),
        F.round(F.sum("bit_errors").cast("double") / (F.count(F.lit(1)) * MSG_BITS), 6).alias("ber"),
        F.round(F.avg(F.col("crc_ok").cast("double")), 6).alias("crc_valid_rate"),
    )
