"""Contracts for the torch-free learned-codec trainer (plans/nn_train.py):
hand-derived gradients vs finite differences, eval-parity with TorchCodec's
forward, checkpoint interop, and an end-to-end learning run.
"""

from __future__ import annotations

import numpy as np
import pytest

from vectordb_watermark_spark.plans.codec import (
    TorchCodec,
    decoder_state_shapes,
    encoder_state_shapes,
)
from vectordb_watermark_spark.plans.nn_train import (
    Adam,
    _init_from_shapes,
    adaptive_noise_params,
    adaptive_training_params,
    apply_noise,
    bce_with_logits,
    dec_backward,
    dec_forward,
    enc_backward,
    enc_forward,
    init_checkpoint,
    mse,
    sample_messages,
    train_reference_codec,
    warmup_cosine,
)


def test_gradients_match_finite_differences():
    """Every parameter tensor's analytic gradient agrees with central
    differences on the full loss (BCE + lam*MSE through both nets)."""
    rng = np.random.default_rng(0)
    dim, L, depth, mul = 6, 4, 2, 2
    enc = _init_from_shapes(encoder_state_shapes(dim, L, depth, mul), rng)
    dec = _init_from_shapes(decoder_state_shapes(dim, L, depth, mul), rng)
    B, lam, ds = 3, 1.3, 0.05
    cover = rng.standard_normal((B, dim))
    cover /= np.linalg.norm(cover, axis=1, keepdims=True)
    msg = rng.integers(0, 2, (B, L)).astype(np.float64)

    def loss_and_tapes():
        stego, et = enc_forward(enc, cover, msg, depth, ds)
        logits, dt = dec_forward(dec, stego, depth)
        b, dlog = bce_with_logits(logits, msg)
        m, dsm = mse(stego, cover)
        return b + lam * m, et, dt, dlog, dsm

    loss, et, dt, dlog, dsm = loss_and_tapes()
    dgrads, d_in = dec_backward(dec, dt, dlog, depth)
    egrads = enc_backward(enc, et, msg, d_in + lam * dsm, depth, ds)

    h, worst = 1e-6, 0.0
    for state, grads in ((enc, egrads), (dec, dgrads)):
        for k in state:
            flat, gflat = state[k].reshape(-1), grads[k].reshape(-1)
            for idx in rng.choice(flat.size, size=min(3, flat.size), replace=False):
                orig = flat[idx]
                flat[idx] = orig + h
                lp = loss_and_tapes()[0]
                flat[idx] = orig - h
                lm = loss_and_tapes()[0]
                flat[idx] = orig
                num = (lp - lm) / (2 * h)
                rel = abs(num - gflat[idx]) / max(1e-7, abs(num), abs(gflat[idx]))
                worst = max(worst, rel)
    assert worst < 1e-3, f"worst relative gradient error {worst}"


def test_train_forward_matches_torchcodec_eval():
    """The trainer's forward (dropout off) and TorchCodec's eval inference
    are the same function of the same state dict."""
    dim = 24  # adaptive: depth 4, hidden_mul 2
    ckpt = init_checkpoint(dim, seed=5)
    codec = TorchCodec(dim, state=ckpt)
    depth, ds = codec.params["depth"], codec.params["delta_scale"]
    rng = np.random.default_rng(9)
    v = rng.standard_normal((8, dim))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    bits = rng.integers(0, 2, (8, 24)).astype(np.float64)

    stego, _ = enc_forward(ckpt["enc"], v, bits, depth, ds)
    assert np.allclose(stego - v, codec._encode_delta(v, bits), atol=1e-12)
    logits, _ = dec_forward(ckpt["dec"], stego, depth)
    assert np.allclose(logits, codec._decode_logits(stego), atol=1e-12)


def test_noise_layers_semantics():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((16, 8))
    q, gm = apply_noise("quant", 8, x.clip(-1, 1), rng)
    assert gm is None and np.abs(q - x.clip(-1, 1)).max() <= 1.0 / 255 + 1e-12
    m, mask = apply_noise("mask", 0.9, x, rng)
    assert ((m == 0) | (m == x)).all() and set(np.unique(mask)) <= {0.0, 1.0}
    g, gm2 = apply_noise("gauss", 0.01, x, rng)
    assert gm2 is None and 0 < np.abs(g - x).mean() < 0.05


def test_messages_carry_valid_crc():
    from vectordb_watermark_spark.functions.bits import CRC4_TABLE

    m = sample_messages(64, np.random.default_rng(2))
    assert m.shape == (64, 24)
    shifts = np.arange(23, -1, -1)
    packed = (m.astype(np.int64) * (1 << shifts)).sum(axis=1)
    blk, crc = packed >> 20, (packed >> 16) & 0xF
    assert all(crc[i] == CRC4_TABLE[blk[i]] for i in range(64))


def test_schedule_and_adam_shapes():
    assert warmup_cosine(0, 100) == 0.0
    assert abs(warmup_cosine(5, 100) - 1.0) < 1e-9          # end of 5% warmup
    assert abs(warmup_cosine(100, 100) - 0.1) < 1e-9        # cosine floor
    state = {"w": np.ones((3, 3))}
    opt = Adam(state, lr=0.1, weight_decay=0.0)
    opt.step({"w": np.ones((3, 3))})
    assert state["w"].shape == (3, 3) and (state["w"] < 1.0).all()


def test_warm_start_resumes_from_checkpoint():
    """init_state (round 13): epochs=0 is an identity pass-through of the
    provided weights (the plumbing contract), a warm start begins near the
    donor's quality instead of chance, and a mismatched layout is rejected
    before any training."""
    import pytest

    rng = np.random.default_rng(8)
    X = rng.standard_normal((1500, 64))
    a = train_reference_codec(X, epochs=6, batch_size=256, seed=3, msg_len=8)

    b0 = train_reference_codec(
        X, epochs=0, batch_size=256, seed=4, msg_len=8, init_state=a["ckpt"]
    )
    for part in ("enc", "dec"):
        for k, v in a["ckpt"][part].items():
            assert np.array_equal(b0["ckpt"][part][k], v), (part, k)

    b = train_reference_codec(
        X, epochs=2, batch_size=256, seed=4, msg_len=8, init_state=a["ckpt"]
    )
    # resumes near the donor's quality, not from chance (0.5); generous
    # margin for the fresh noise/delta schedule restart
    assert b["history"][0]["val_ber"] < a["best_val_ber"] + 0.05

    with pytest.raises(ValueError):
        train_reference_codec(
            X, epochs=1, msg_len=8,
            init_state={"enc": {}, "dec": {}},
        )

    # delta_growth=False pins training AND validation to the base delta —
    # the deploy-calibrated polish mode (the reference's in-training ramp
    # is a train/infer mismatch: state_dict carries no delta_scale)
    from vectordb_watermark_spark.plans.codec import adaptive_model_params

    fixed = train_reference_codec(
        X, epochs=3, batch_size=256, seed=5, msg_len=8,
        init_state=a["ckpt"], delta_growth=False,
    )
    base = adaptive_model_params(64, 8)["delta_scale"]
    assert all(h["delta_scale"] == base for h in fixed["history"])
    ramped = train_reference_codec(
        X, epochs=3, batch_size=256, seed=5, msg_len=8, init_state=a["ckpt"]
    )
    assert all(h["delta_scale"] > base for h in ramped["history"])


def test_training_learns_and_checkpoint_roundtrips(tmp_path):
    """End-to-end: val BER drops from chance, the best checkpoint passes
    structural validation, saves to npz, and reloads through TorchCodec."""
    rng = np.random.default_rng(3)
    X = rng.standard_normal((4000, 64)) * 2.0
    out_path = str(tmp_path / "best_64d.npz")
    out = train_reference_codec(
        X, epochs=10, batch_size=256, seed=7, msg_len=8, model_out=out_path
    )
    first, best = out["history"][0]["val_ber"], out["best_val_ber"]
    assert best < 0.47 and best < first - 0.02, (first, best)
    codec = TorchCodec(64, checkpoint_path=out_path, msg_len=8)
    v = (X[:16] / np.linalg.norm(X[:16], axis=1, keepdims=True)).astype(np.float32)
    stego, _ = enc_forward(
        out["ckpt"]["enc"], v.astype(np.float64),
        sample_messages(16, np.random.default_rng(0), 8),
        codec.params["depth"], codec.params["delta_scale"],
    )
    logits, _ = dec_forward(out["ckpt"]["dec"], stego, codec.params["depth"])
    assert np.allclose(logits, codec._decode_logits(stego), atol=1e-12)


def test_adaptive_training_and_noise_tables():
    tp = adaptive_training_params(384)
    assert abs(tp["enc_lr"] - 3e-4 * (512 / 384) * 1.2) < 1e-12
    assert 0.15 <= tp["clean_ratio"] <= 0.6
    npar = adaptive_noise_params(384)
    assert len(npar["gauss_levels"]) == 3 and npar["val_quant"] >= 6


def test_progress_callback_fires_per_epoch():
    rng = np.random.default_rng(4)
    X = rng.standard_normal((300, 64))
    seen = []
    train_reference_codec(
        X, epochs=3, batch_size=128, seed=1,
        progress_callback=lambda ep, total, m: seen.append((ep, total, m["val_ber"])),
    )
    assert [(e, t) for e, t, _ in seen] == [(1, 3), (2, 3), (3, 3)]


def test_torch_codec_nondefault_msg_len_roundtrip(tmp_path):
    """A codec trained at msg_len != 24 must encode/decode through the
    PUBLIC batch interface (bit packing honors msg_len, not the default)."""
    rng = np.random.default_rng(5)
    out_path = str(tmp_path / "best8.npz")
    train_reference_codec(rng.standard_normal((400, 64)), epochs=2,
                          batch_size=128, seed=9, msg_len=8, model_out=out_path)
    from vectordb_watermark_spark.plans.codec import TorchCodec

    codec = TorchCodec(64, checkpoint_path=out_path, msg_len=8)
    V = rng.standard_normal((6, 64)).astype(np.float32)
    msgs = rng.integers(0, 1 << 8, size=6)
    W = codec.encode_batch(V, msgs)
    assert W.shape == (6, 64)
    out = codec.decode_batch(W)
    assert ((0 <= out) & (out < (1 << 8))).all()
