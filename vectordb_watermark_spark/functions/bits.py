"""Bit codecs and CRC-4 — the watermark payload kernels.

Behavior-compatible with the reference's scalar kernels (cited for parity,
not copied):

- CRC-4 with polynomial 0x3 over 4 message-index bits
  (reference: database/pgvector/pg_func.py:39-49, configs/config.py CRC_POLYNOMIAL).
- UTF-8 text <-> big-endian bit arrays
  (reference: database/pgvector/pg_func.py:52-64, np.unpackbits semantics).
- 32-char message partition into 16 blocks x 16 bits
  (reference: database/pgvector/pg_func.py:325-332).

Payload layout per carrier row (reference: pg_func.py:349-358,
configs/config.py MSG_LEN/BLOCK_PAYLOAD/BLOCK_COUNT):
24 bits = 4-bit block index + 4-bit CRC of the index + 16-bit block payload.

In the Spark pipelines we carry block index / CRC / payload as *integers*
(0..15 / 0..15 / 0..65535) rather than bit arrays: integer columns stay inside
whole-stage codegen and hash/compare cheaply at 100 TB scale; the bit-array
form only materializes inside the Arrow-batched codec kernel (numpy).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

BLOCK_COUNT = 16
BLOCK_PAYLOAD = 16
MSG_LEN = 24  # 4 idx + 4 crc + 16 payload


# ---------------------------------------------------------------------------
# CRC-4 (poly 0x3), driver-side reference implementation + lookup table
# ---------------------------------------------------------------------------

def crc4_bits(bits4: list[int]) -> list[int]:
    """CRC-4 (poly 0x3) over 4 bits, MSB-first; returns 4 CRC bits MSB-first."""
    reg = 0
    for bit in bits4:
        reg ^= bit << 3
        for _ in range(4):
            if reg & 0x8:
                reg = ((reg << 1) & 0xF) ^ 0x3
            else:
                reg = (reg << 1) & 0xF
    return [(reg >> i) & 1 for i in reversed(range(4))]


def int_to_bits(value: int, width: int) -> list[int]:
    """Integer -> MSB-first bit list of the given width."""
    return [(value >> (width - 1 - i)) & 1 for i in range(width)]


def bits_to_int(bits) -> int:
    """MSB-first bit sequence -> integer."""
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    return out


#: crc4 of every 4-bit input, as integers: CRC4_TABLE[blk] == crc4(bits(blk))
CRC4_TABLE: list[int] = [bits_to_int(crc4_bits(int_to_bits(b, 4))) for b in range(16)]


def crc4_int_col(blk: Column) -> Column:
    """CRC-4 of a 4-bit block index column, as an int column (pure Catalyst
    lookup — no UDF; stays in whole-stage codegen)."""
    table = F.array(*[F.lit(v) for v in CRC4_TABLE])
    return F.element_at(table, blk.cast("int") + F.lit(1))


def crc4_table_sql(blk_expr: str) -> str:
    """ANSI/DuckDB SQL expression computing CRC-4 of ``blk_expr`` via the same
    lookup table (list literals are 1-indexed in DuckDB, matching element_at)."""
    lits = ",".join(str(v) for v in CRC4_TABLE)
    return f"([{lits}])[({blk_expr}) + 1]"


# ---------------------------------------------------------------------------
# text <-> bits
# ---------------------------------------------------------------------------

def text_to_bits(s: str) -> np.ndarray:
    """UTF-8 string -> uint8 bit array (big-endian within each byte)."""
    b = s.encode("utf-8")
    return np.unpackbits(np.frombuffer(b, dtype=np.uint8))


def bits_to_text(bits: np.ndarray) -> str:
    """Bit array -> UTF-8 string (lossy decode on invalid sequences)."""
    by = np.packbits(np.asarray(bits, dtype=np.uint8))
    return by.tobytes().decode("utf-8", errors="ignore")


def partition_message(cipher32: str) -> list[int]:
    """Split a 32-char ciphertext string into BLOCK_COUNT 16-bit payload ints.

    Mirrors the reference's partition into 16 x 16-bit chunks
    (pg_func.py:325-332) but returns packed integers (see module docstring).
    """
    if len(cipher32) != BLOCK_COUNT * 2:
        raise ValueError(f"message must be {BLOCK_COUNT * 2} chars, got {len(cipher32)}")
    bits = text_to_bits(cipher32)
    return [
        bits_to_int(bits[i * BLOCK_PAYLOAD : (i + 1) * BLOCK_PAYLOAD])
        for i in range(BLOCK_COUNT)
    ]


def assemble_message(payloads: dict[int, int]) -> str | None:
    """Inverse of :func:`partition_message`: 16 {block -> 16-bit payload} ints
    back to the 32-char string. Returns None if any block is missing."""
    if set(payloads) != set(range(BLOCK_COUNT)):
        return None
    bits = np.concatenate(
        [np.array(int_to_bits(payloads[i], BLOCK_PAYLOAD), dtype=np.uint8) for i in range(BLOCK_COUNT)]
    )
    return bits_to_text(bits)
