"""M0 scalar kernels: bit codecs, CRC-4, message partition, AES-GCM."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from vectordb_watermark_spark.functions import bits as B
from vectordb_watermark_spark.functions import crypto as C


# ---------------------------------------------------------------------------
# CRC-4
# ---------------------------------------------------------------------------

def crc4_oracle(bits4):
    """Independent bit-serial CRC-4 poly 0x3 (matches reference pg_func.py:39-49)."""
    reg = 0
    for bit in bits4:
        reg ^= bit << 3
        for _ in range(4):
            reg = ((reg << 1) & 0xF) ^ 0x3 if reg & 0x8 else (reg << 1) & 0xF
    return [(reg >> i) & 1 for i in reversed(range(4))]


def test_crc4_table_all_16_inputs():
    for blk in range(16):
        bits = B.int_to_bits(blk, 4)
        assert B.crc4_bits(bits) == crc4_oracle(bits)
        assert B.CRC4_TABLE[blk] == B.bits_to_int(crc4_oracle(bits))


def test_crc4_detects_single_bit_index_errors():
    # flipping any single bit of the index changes the CRC (distance property)
    for blk in range(16):
        for flip in range(4):
            other = blk ^ (1 << flip)
            assert B.CRC4_TABLE[blk] != B.CRC4_TABLE[other] or blk == other


def test_crc4_int_col_matches_python(spark):
    from pyspark.sql import functions as F

    df = spark.range(16).select(
        F.col("id").cast("int").alias("blk"),
    )
    rows = df.select("blk", B.crc4_int_col(F.col("blk")).alias("crc")).collect()
    for r in rows:
        assert r.crc == B.CRC4_TABLE[r.blk]


def test_crc4_table_sql_matches(duck):
    for blk in range(16):
        got = duck.execute(f"SELECT {B.crc4_table_sql(str(blk))}").fetchone()[0]
        assert got == B.CRC4_TABLE[blk]


# ---------------------------------------------------------------------------
# text <-> bits
# ---------------------------------------------------------------------------

@given(st.text(alphabet=st.characters(codec="ascii", categories=("L", "N", "P")), min_size=1, max_size=64))
@settings(max_examples=50)
def test_text_bits_roundtrip(s):
    assert B.bits_to_text(B.text_to_bits(s)) == s


def test_text_to_bits_msb_first():
    # 'A' = 0x41 = 01000001
    assert list(B.text_to_bits("A")) == [0, 1, 0, 0, 0, 0, 0, 1]


def test_partition_assemble_roundtrip():
    msg32 = "ABCDEFGHIJKLMNOPQRSTUVWXYZ012345"
    payloads = B.partition_message(msg32)
    assert len(payloads) == 16
    assert all(0 <= p < 65536 for p in payloads)
    # 'AB' -> 0x4142
    assert payloads[0] == 0x4142
    assert B.assemble_message(dict(enumerate(payloads))) == msg32
    assert B.assemble_message({0: 1}) is None


def test_partition_rejects_wrong_length():
    with pytest.raises(ValueError):
        B.partition_message("short")


def test_int_bits_roundtrip():
    for v in [0, 1, 0xFFFF, 0x4142, 12345]:
        assert B.bits_to_int(B.int_to_bits(v, 16)) == v


# ---------------------------------------------------------------------------
# AES-GCM
# ---------------------------------------------------------------------------

def test_aes_roundtrip():
    cipher32, nonce_hex = C.encrypt_message_to_32chars("ABCDEFGHIJKLMNOP", "test-key-1")
    assert len(cipher32) == 32
    assert len(nonce_hex) == 24  # 12 bytes
    assert C.decrypt_32chars_to_message(cipher32, "test-key-1", nonce_hex) == "ABCDEFGHIJKLMNOP"


def test_aes_wrong_key_fails_auth():
    cipher32, nonce_hex = C.encrypt_message_to_32chars("ABCDEFGHIJKLMNOP", "test-key-1")
    with pytest.raises(ValueError):
        C.decrypt_32chars_to_message(cipher32, "wrong-key", nonce_hex)


def test_aes_corrupted_ciphertext_fails_auth():
    cipher32, nonce_hex = C.encrypt_message_to_32chars("ABCDEFGHIJKLMNOP", "test-key-1")
    corrupted = ("A" if cipher32[0] != "A" else "B") + cipher32[1:]
    with pytest.raises(ValueError):
        C.decrypt_32chars_to_message(corrupted, "test-key-1", nonce_hex)


def test_aes_known_answer_deterministic_nonce():
    # fixed nonce => fully deterministic ciphertext; re-derive twice
    nonce = bytes(range(12))
    c1, _ = C.encrypt_message_to_32chars("0123456789abcdef", "k", nonce=nonce)
    c2, _ = C.encrypt_message_to_32chars("0123456789abcdef", "k", nonce=nonce)
    assert c1 == c2
    assert C.decrypt_32chars_to_message(c1, "k", nonce.hex()) == "0123456789abcdef"


def test_key_derivation_stable():
    k = C.derive_key_from_password("正确的密码")
    assert len(k) == 32
    assert k == C.derive_key_from_password("正确的密码")


@given(st.text(alphabet=st.characters(codec="ascii", min_codepoint=33, max_codepoint=126), min_size=16, max_size=16))
@settings(max_examples=10, deadline=None)
def test_aes_roundtrip_property(msg):
    cipher32, nonce_hex = C.encrypt_message_to_32chars(msg, "prop-key")
    assert C.decrypt_32chars_to_message(cipher32, "prop-key", nonce_hex) == msg


# ---------------------------------------------------------------------------
# property tests: TorchCodec numpy kernels (pure, no Spark session needed)
# ---------------------------------------------------------------------------

@given(st.lists(st.floats(-20, 20), min_size=1, max_size=64))
@settings(max_examples=200, deadline=None)
def test_erf_properties(xs):
    """odd symmetry, boundedness, monotonicity of the A&S erf."""
    import numpy as np

    from vectordb_watermark_spark.plans.codec import _erf

    x = np.array(xs, dtype=np.float64)
    v = _erf(x)
    assert (np.abs(v) <= 1.0 + 1e-12).all()
    assert np.allclose(_erf(-x), -v, atol=3e-7)
    s = np.sort(x)
    vs = _erf(s)
    assert (np.diff(vs) >= -3e-7).all()


@given(st.integers(24, 512))
@settings(max_examples=40, deadline=None)
def test_adaptive_params_within_published_clamps(dim):
    from vectordb_watermark_spark.plans.codec import adaptive_model_params

    p = adaptive_model_params(dim)
    assert 4 <= p["depth"] <= 16
    assert 2 <= p["hidden_mul"] <= 10
    assert 0.005 <= p["delta_scale"] <= 0.08
    assert 0.01 <= p["dropout"] <= 0.4


@given(st.integers(0, (1 << 24) - 1))
@settings(max_examples=200, deadline=None)
def test_msg_bits_roundtrip(msg):
    import numpy as np

    from vectordb_watermark_spark.plans.codec import _bits_to_msg, _msg_to_bits

    m = np.array([msg], dtype=np.int64)
    assert _bits_to_msg(_msg_to_bits(m))[0] == msg
