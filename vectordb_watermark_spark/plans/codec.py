"""Watermark codecs — the per-vector 24-bit message encode/decode kernels.

The reference uses a pretrained FiLM-conditioned residual-MLP encoder/decoder
pair per vector dimension (algorithms/deep_learning/encoder.py:44-76,
decoder.py:22-52, watermark.py:172-266) running torch one row at a time.
Torch is not available in this environment, so the engine ships:

- :class:`OrthogonalCodec` — a fully deterministic linear codec (the
  "linear-probe stub codec" of SURVEY.md §7.3): 24 orthonormal directions
  are derived from the key via seeded QR; encode projects the normalized
  cover vector out of that subspace and writes ``±delta`` coefficients back
  in; decode reads coefficient signs.  Clean extraction is *exact* (zero
  BER), degradation under attack is graceful, and the codec is blind —
  decode needs only (key, dim).  It exercises every distributed stage of the
  pipeline identically to a learned codec.  Fidelity is dimension-bound:
  overwriting the 24-dim subspace costs cosine ~ sqrt(1 - 24/D) (~0.79 at
  D=64, ~0.97 at the reference's D=384); a learned codec buys a better
  fidelity/robustness point, which is exactly why the reference trains one.
- :class:`TorchCodec` — the reference-parity learned codec: reproduces the
  dimension-adaptive architecture table, structurally validates reference
  ``{'enc','dec'}`` checkpoints, and runs eval-mode inference in pure numpy
  (Linear/LayerNorm/exact-erf GELU/FiLM).  Torch is needed only to unpickle
  a real ``best.pt`` (import-gated at that call); ``.npz``-exported state
  runs fully torch-free.

Both implement the same batch interface and run inside Arrow-batched
``mapInArrow`` — vectorized, executor-cached, never per-row (the
reference's worst inefficiency was per-row CPU<->GPU transfer,
pg_func.py:369-375; its own training loop proves the models batch fine).

Norm handling mirrors the reference (pg_func.py:363-377): record the L2
norm, encode on the normalized vector, restore the original norm.
"""

from __future__ import annotations

import hashlib

import numpy as np

MSG_BITS = 24


def _msg_to_bits(msgs: np.ndarray, width: int = MSG_BITS) -> np.ndarray:
    """(B,) packed ``width``-bit ints -> (B, width) float {0,1}, MSB first."""
    shifts = np.arange(width - 1, -1, -1)
    return ((msgs[:, None] >> shifts[None, :]) & 1).astype(np.float64)


def _bits_to_msg(bits: np.ndarray) -> np.ndarray:
    """(B, width) {0,1} -> (B,) packed ints, MSB first."""
    width = bits.shape[1]
    shifts = np.arange(width - 1, -1, -1)
    return (bits.astype(np.int64) << shifts[None, :]).sum(axis=1)


#: 128 rows x 24 x D temp ~ 9 MB at D=384 — cache-friendlier than 512 (38 MB)
#: under full-core worker concurrency; chunking does NOT affect values (the
#: per-row pairwise reduction is row-independent, verified bitwise)
_DET_CHUNK = 128


def _det_dot(V: np.ndarray, U: np.ndarray) -> np.ndarray:
    """(B, D) x (D, K) -> (B, K), **batch-shape-independent**.

    BLAS GEMM picks blocking/accumulation order by matrix shape, so the same
    row can round differently depending on who shares its Arrow batch — which
    makes decode signs of near-zero projections flip between runs (batch
    boundaries vary with AQE).  Summing each row over the LAST axis of a
    C-contiguous temp uses numpy's per-row pairwise reduction — identical for
    a row regardless of batch composition.  Chunked to bound the (c, K, D)
    temp (~c*K*D*8 bytes).
    """
    B, D = V.shape
    K = U.shape[1]
    out = np.empty((B, K), dtype=np.float64)
    Ut = np.ascontiguousarray(U.T)  # (K, D)
    for s in range(0, B, _DET_CHUNK):
        c = V[s : s + _DET_CHUNK]
        out[s : s + _DET_CHUNK] = (c[:, None, :] * Ut[None, :, :]).sum(axis=-1)
    return out


class OrthogonalCodec:
    """Deterministic orthogonal-subspace watermark codec.

    encode: v_n = v/||v||; w = v_n - U(U^T v_n) + U c, c_j = (2 b_j - 1) * delta;
    output w * ||v||.  decode: bits = (v^T U > 0).

    ``U`` (dim x 24, orthonormal) is derived from sha256(key|codec|dim) — any
    executor re-derives it identically; nothing is shipped in closures except
    (key, dim, delta).
    """

    def __init__(self, dim: int, key: str, delta: float | None = None):
        if dim < MSG_BITS:
            raise ValueError(f"dim must be >= {MSG_BITS}, got {dim}")
        self.dim = dim
        self.key = key
        if delta is None:
            # Adaptive perturbation strength (the engine's analogue of the
            # reference's dim-adaptive delta_scale, watermark.py:12-40).
            # For a linear codec, truncating/noising a fraction f of dims
            # perturbs each bit coefficient by ~sqrt(f/dim), so a constant
            # delta*sqrt(dim) keeps the bit SNR scale-invariant; the clamp
            # keeps fidelity cos >= ~0.95 at the reference's D=384.
            # 1.0/sqrt(D) (cos ~0.97 at 384-d, written mass 24*delta^2 ~6%)
            # buys the truncation/noise headroom the reference gets from its
            # learned codec; the 0.08 cap leaves low-D behavior unchanged.
            delta = max(0.02, min(0.08, 1.0 / dim**0.5))
        self.delta = float(delta)
        self._basis = None  # lazy: derived on first use per process

    @property
    def basis(self) -> np.ndarray:
        if self._basis is None:
            seed = int(
                hashlib.sha256(f"{self.key}|codec|{self.dim}".encode()).hexdigest()[:8], 16
            )
            rng = np.random.default_rng(seed)
            g = rng.standard_normal((self.dim, MSG_BITS))
            q, r = np.linalg.qr(g)
            # sign-stabilize so QR is unique regardless of LAPACK variant
            q *= np.sign(np.diag(r))[None, :]
            self._basis = q
        return self._basis

    def encode_batch(self, vectors: np.ndarray, msgs: np.ndarray) -> np.ndarray:
        """(B, dim) float vectors + (B,) packed 24-bit ints -> stego (B, dim)
        float32 with original norms restored."""
        V = np.asarray(vectors, dtype=np.float64)
        U = self.basis
        norms = np.linalg.norm(V, axis=1, keepdims=True)
        v_n = V / (norms + 1e-8)
        coeff = (2.0 * _msg_to_bits(np.asarray(msgs)) - 1.0) * self.delta
        proj = _det_dot(v_n, U)
        w = v_n - _det_dot(proj - coeff, U.T)
        # re-unit then restore the cover's norm (decode is scale-invariant:
        # it reads coefficient signs), mirroring pg_func.py:363-377
        w /= np.linalg.norm(w, axis=1, keepdims=True) + 1e-12
        return (w * norms).astype(np.float32)

    def decode_batch(self, vectors: np.ndarray) -> np.ndarray:
        """(B, dim) float vectors -> (B,) packed 24-bit ints."""
        V = np.asarray(vectors, dtype=np.float64)
        bits = _det_dot(V, self.basis) > 0.0
        return _bits_to_msg(bits)

    def fingerprint(self) -> str:
        """Content fingerprint of everything decode depends on: codec kind,
        dim, delta, and the key-derived basis seed (NOT the raw key — the
        fingerprint travels in embed-time metadata).  Two codecs with equal
        fingerprints decode identically; a mismatch at extract time means
        the decode would read garbage coefficients — the silent
        0-valid-decodes failure the embed metadata exists to make loud."""
        seed = hashlib.sha256(f"{self.key}|codec|{self.dim}".encode()).hexdigest()[:16]
        return hashlib.sha256(
            f"orthogonal|{self.dim}|{self.delta!r}|{seed}".encode()
        ).hexdigest()[:16]

    @property
    def kind(self) -> str:
        return "orthogonal"

    @property
    def _graph_prefix(self) -> int:
        """Leading-coordinate count the graph features live on: truncation
        attacks that keep at least this many dimensions leave the features
        — and therefore the whole proximity graph and carrier set — exactly
        invariant.  D/2 by default; floored so the complement of the 24-dim
        message subspace keeps >= 32 effective dimensions."""
        return min(self.dim, max(self.dim // 2, MSG_BITS + 32))

    def graph_features(self, vectors: np.ndarray) -> np.ndarray:
        """Watermark- AND truncation-invariant kNN-graph features.

        Let ``P`` be the first :attr:`_graph_prefix` coordinates and ``U_P``
        the prefix rows of the message basis.  The feature is the
        L2-normalized projection of ``P(v)`` onto the orthogonal complement
        of ``span(U_P)`` within the prefix subspace:

        - the encoder only writes ``delta * U c`` (plus a global rescale),
          whose prefix lies in span(U_P) -> annihilated: embed and extract
          derive the *identical* graph on clean data — a deliberate
          improvement over the reference, whose HNSW graph is perturbed by
          its own watermark and only recovers a carrier *overlap*
          (SURVEY.md §3.2, §7.5);
        - the feature reads only prefix coordinates, so a truncate-and-pad
          attack keeping >= prefix dims (the reference's published T4 keeps
          284/384 ~ 74%, reference attack/README.md:172-179) does not move a
          single edge — carrier re-derivation under T4 is exact.

        The complement projector ``I - U_P (U_P^T U_P)^{-1} U_P^T`` is
        unique (no QR sign ambiguity); ``(U_P^T U_P)^{-1}`` is derived once
        per process and every matrix product runs through the
        batch-shape-independent ``_det_dot``.
        """
        V = np.asarray(vectors, dtype=np.float64)
        p = self._graph_prefix
        Up = np.ascontiguousarray(self.basis[:p, :])  # (p, 24)
        Sinv = np.linalg.inv(Up.T @ Up)               # (24, 24), derived once-equivalent
        Vp = np.ascontiguousarray(V[:, :p])
        comp = Vp - _det_dot(_det_dot(Vp, Up), (Sinv @ Up.T))
        norms = np.linalg.norm(comp, axis=1, keepdims=True)
        return (comp / (norms + 1e-12)).astype(np.float32)


def with_graph_features(df, codec, id_col: str = "id", vec_col: str = "emb", out_col: str = "gfeat"):
    """Add the codec's watermark-invariant graph-feature column (see
    :meth:`OrthogonalCodec.graph_features`).  Codecs without the hook (e.g.
    a learned codec whose perturbations are negligible) fall back to the raw
    vector column."""
    from pyspark.sql import functions as F

    if not hasattr(codec, "graph_features"):
        return df.withColumn(out_col, F.col(vec_col))

    from vectordb_watermark_spark.operators.partitioning import spread_to_parallelism

    # the projection kernel is deterministic-but-BLAS-free (codec._det_dot)
    # — CPU-bound per row, so a few-file input must not serialize it
    df = spread_to_parallelism(df.select(id_col, vec_col))

    def kernel(batches):
        import pyarrow as pa

        from vectordb_watermark_spark.functions.arrowmat import (
            list_array_to_matrix,
            matrix_to_list_array,
        )

        for rb in batches:
            if not rb.num_rows:
                continue
            V = list_array_to_matrix(rb.column(1))
            g = codec.graph_features(V)
            yield pa.RecordBatch.from_arrays(
                [rb.column(0), rb.column(1), matrix_to_list_array(g)],
                names=[id_col, vec_col, out_col],
            )

    return df.select(id_col, vec_col).mapInArrow(
        kernel, schema=f"{id_col} long, {vec_col} array<float>, {out_col} array<float>"
    )


def adaptive_model_params(vec_dim: int, msg_len: int = MSG_BITS) -> dict:
    """Reproduce the reference's dimension-adaptive architecture parameters
    (ref algorithms/deep_learning/watermark.py:12-40) — the checkpoint on
    disk carries no hyperparameters, so loading one REQUIRES re-deriving
    exactly these values or every state-dict shape mismatches."""
    depth = max(4, min(16, int(4 + 12 * (vec_dim / 1024))))
    hidden_mul = max(2, min(10, int(2 + 8 * (vec_dim / 2048))))
    delta_scale = max(0.005, min(0.08, 0.01 + 0.07 * (vec_dim / 2048)))
    dropout = max(0.01, min(0.4, 0.05 + 0.35 * (vec_dim / 2048)))
    return {
        "depth": depth,
        "hidden_mul": hidden_mul,
        "delta_scale": delta_scale,
        "dropout": dropout,
        "capacity_ratio": (vec_dim * msg_len) / (vec_dim * vec_dim),
    }


def encoder_state_shapes(vec_dim: int, msg_len: int = MSG_BITS,
                         depth: int | None = None,
                         hidden_mul: int | None = None) -> dict[str, tuple]:
    """Expected ``enc`` state-dict layout for the reference encoder: ``depth``
    FiLM residual blocks (fc1/fc2/ln on the cover branch, a 2-layer msg MLP
    producing gamma||beta) + out_ln/out_fc (ref encoder.py:13-67).  Keys use
    torch's ``nn.Module`` naming; shapes follow ``nn.Linear`` convention
    ``weight=(out, in)``."""
    p = adaptive_model_params(vec_dim, msg_len)
    depth = p["depth"] if depth is None else depth
    hidden = vec_dim * (p["hidden_mul"] if hidden_mul is None else hidden_mul)
    shapes: dict[str, tuple] = {}
    for i in range(depth):
        b = f"blocks.{i}"
        shapes[f"{b}.fc1.weight"] = (hidden, vec_dim)
        shapes[f"{b}.fc1.bias"] = (hidden,)
        shapes[f"{b}.fc2.weight"] = (vec_dim, hidden)
        shapes[f"{b}.fc2.bias"] = (vec_dim,)
        shapes[f"{b}.ln.weight"] = (vec_dim,)
        shapes[f"{b}.ln.bias"] = (vec_dim,)
        shapes[f"{b}.msg_fc.0.weight"] = (hidden, msg_len)
        shapes[f"{b}.msg_fc.0.bias"] = (hidden,)
        shapes[f"{b}.msg_fc.2.weight"] = (vec_dim * 2, hidden)
        shapes[f"{b}.msg_fc.2.bias"] = (vec_dim * 2,)
    shapes["out_ln.weight"] = (vec_dim,)
    shapes["out_ln.bias"] = (vec_dim,)
    shapes["out_fc.weight"] = (vec_dim, vec_dim)
    shapes["out_fc.bias"] = (vec_dim,)
    return shapes


def decoder_state_shapes(vec_dim: int, msg_len: int = MSG_BITS,
                         depth: int | None = None,
                         hidden_mul: int | None = None) -> dict[str, tuple]:
    """Expected ``dec`` state-dict layout for the reference decoder:
    ``depth`` residual MLP blocks (fc1/fc2/ln; dropout holds no params) +
    out_ln and the (msg_len x vec_dim) logit head (ref decoder.py:6-44)."""
    p = adaptive_model_params(vec_dim, msg_len)
    depth = p["depth"] if depth is None else depth
    hidden = vec_dim * (p["hidden_mul"] if hidden_mul is None else hidden_mul)
    shapes: dict[str, tuple] = {}
    for i in range(depth):
        b = f"blocks.{i}"
        shapes[f"{b}.fc1.weight"] = (hidden, vec_dim)
        shapes[f"{b}.fc1.bias"] = (hidden,)
        shapes[f"{b}.fc2.weight"] = (vec_dim, hidden)
        shapes[f"{b}.fc2.bias"] = (vec_dim,)
        shapes[f"{b}.ln.weight"] = (vec_dim,)
        shapes[f"{b}.ln.bias"] = (vec_dim,)
    shapes["out_ln.weight"] = (vec_dim,)
    shapes["out_ln.bias"] = (vec_dim,)
    shapes["out_fc.weight"] = (msg_len, vec_dim)
    shapes["out_fc.bias"] = (msg_len,)
    return shapes


def export_torch_checkpoint_to_npz(
    pt_path: str, npz_path: str, vec_dim: int, msg_len: int = MSG_BITS
) -> dict:
    """Convert a reference ``best.pt`` (watermark.py:110-133 layout: top-level
    ``enc``/``dec`` state dicts) to the flat ``.npz`` twin TorchCodec runs
    torch-free.  Requires torch only for the unpickle; validates the layout
    (keys + adaptive shapes) before writing.  Returns the validated params.
    """
    try:
        import torch
    except ImportError as exc:
        raise ImportError(
            "export_torch_checkpoint_to_npz requires torch to unpickle the "
            ".pt file; run it once on a torch machine, then ship the .npz."
        ) from exc
    raw = torch.load(pt_path, map_location="cpu", weights_only=True)
    if "enc" not in raw or "dec" not in raw:
        raise ValueError("checkpoint missing 'enc' or 'dec' state dict")
    ckpt = {
        part: {k: v.cpu().numpy() for k, v in raw[part].items()}
        for part in ("enc", "dec")
    }
    params = validate_checkpoint(ckpt, vec_dim, msg_len)
    np.savez(
        npz_path,
        **{f"{part}/{k}": v for part in ("enc", "dec") for k, v in ckpt[part].items()},
    )
    return params


def validate_checkpoint(ckpt, vec_dim: int, msg_len: int = MSG_BITS) -> dict:
    """Structurally validate a reference-format checkpoint mapping
    ``{'enc': state_dict, 'dec': state_dict}`` (ref watermark.py:110-133:
    both keys required; the trainer saves exactly this shape).  Works on any
    array-like values exposing ``.shape`` (torch tensors, numpy arrays), so
    the mapping is testable without torch.  Returns the adaptive params.
    Raises ValueError naming every missing / unexpected / mis-shaped key.
    """
    for part in ("enc", "dec"):
        if part not in ckpt:
            raise ValueError(f"checkpoint missing '{part}' state dict "
                             "(expected {'enc': ..., 'dec': ...})")
    problems: list[str] = []
    for part, expect in (("enc", encoder_state_shapes(vec_dim, msg_len)),
                         ("dec", decoder_state_shapes(vec_dim, msg_len))):
        state = ckpt[part]
        for k in sorted(set(expect) - set(state)):
            problems.append(f"{part}.{k}: missing")
        for k in sorted(set(state) - set(expect)):
            problems.append(f"{part}.{k}: unexpected")
        for k in sorted(set(expect) & set(state)):
            got = tuple(state[k].shape)
            if got != expect[k]:
                problems.append(f"{part}.{k}: shape {got} != expected {expect[k]}")
    if problems:
        raise ValueError(
            f"checkpoint does not match the dim={vec_dim} architecture "
            f"({len(problems)} issue(s)):\n  " + "\n  ".join(problems)
        )
    return adaptive_model_params(vec_dim, msg_len)


def _erf(x: np.ndarray) -> np.ndarray:
    """Vectorized erf, Abramowitz & Stegun 7.1.26 (|err| <= 1.5e-7) — numpy
    ships no erf and scipy is not in this environment."""
    sign = np.sign(x)
    x = np.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
           + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * np.exp(-x * x))


def _gelu(x: np.ndarray) -> np.ndarray:
    """torch.nn.functional.gelu default (exact erf form)."""
    return 0.5 * x * (1.0 + _erf(x / np.sqrt(2.0)))


def _layernorm(x: np.ndarray, w: np.ndarray, b: np.ndarray, eps: float = 1e-5) -> np.ndarray:
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def _linear(x: np.ndarray, state: dict, name: str) -> np.ndarray:
    return x @ np.asarray(state[f"{name}.weight"], dtype=np.float64).T + np.asarray(
        state[f"{name}.bias"], dtype=np.float64
    )


class TorchCodec:
    """Reference-parity learned codec (per-dimension checkpoints, ref
    configs: ``results/vector_{dim}d/best.pt``).

    The FiLM residual encoder (ref encoder.py:13-76) and residual-MLP
    decoder (ref decoder.py:6-52) are plain Linear/LayerNorm/GELU stacks, so
    EVAL-mode inference needs no autograd: this class runs the forward pass
    in numpy (dropout is identity at eval; GELU uses the exact-erf form
    torch defaults to, via an erf whose absolute error is < 1.5e-7).  Torch
    is required only to UNPICKLE a real ``best.pt`` — state provided as
    arrays (or an ``.npz`` twin with ``enc/<key>`` / ``dec/<key>`` entries)
    loads and runs entirely torch-free.

    Interface matches :class:`OrthogonalCodec` (encode_batch/decode_batch on
    packed 24-bit messages) so pipelines swap codecs without change.  Norm
    handling: encode on the L2-normalized vector, then restore the cover
    norm.  Deliberate deviation from the reference (pg_func.py:363-377),
    which multiplies the raw stego (norm ~1±delta_scale) by the cover norm —
    here the stego is re-unit-normalized first so the output norm equals the
    cover norm EXACTLY (the P5 norm save/restore contract).  Decode is
    invariant to this (decode_batch re-normalizes its input), so extraction
    parity with a torch run is unaffected; only output norms differ, by the
    ~(1±delta_scale) factor the reference leaks.
    """

    def __init__(self, dim: int, checkpoint_path: str | None = None,
                 state: dict | None = None, msg_len: int = MSG_BITS,
                 device: str = "cpu"):
        if checkpoint_path is None and state is None:
            raise ValueError("TorchCodec needs checkpoint_path or state")
        self.dim = dim
        self.msg_len = msg_len
        self.device = device
        self.checkpoint_path = checkpoint_path
        self.params = adaptive_model_params(dim, msg_len)
        self._state = None
        if state is not None:
            self.params = validate_checkpoint(state, dim, msg_len)
            self._state = {
                part: {k: np.asarray(v, dtype=np.float64) for k, v in state[part].items()}
                for part in ("enc", "dec")
            }

    # -- checkpoint loading -------------------------------------------------
    def _ensure_state(self) -> dict:
        if self._state is not None:
            return self._state
        path = str(self.checkpoint_path)
        meta_delta = None
        if path.endswith(".npz"):
            # torch-free checkpoint twin: flat npz with enc/<key>, dec/<key>
            z = np.load(path)
            ckpt = {"enc": {}, "dec": {}}
            for k in z.files:
                part, _, name = k.partition("/")
                if part in ckpt and name:
                    ckpt[part][name] = z[k]
                elif k == "meta/delta_scale":
                    # engine extension the torch state_dict format cannot
                    # express: the delta the best checkpoint was SELECTED at.
                    # The reference trains with an in-run delta ramp
                    # (trainer.py:300-302, up to 1.5x base) but re-derives
                    # the adaptive BASE delta at inference (watermark.py:
                    # 12-40) — a train/infer mismatch measured at 2.6x BER
                    # degradation on the 256-d fixture (0.048 -> 0.127).
                    # A carried calibration deploys the artifact at exactly
                    # the conditions it was validated under; meta-less
                    # checkpoints keep the reference behavior bit for bit.
                    meta_delta = float(z[k])
        else:
            try:
                import torch
            except ImportError as exc:
                raise ImportError(
                    "Unpickling a torch checkpoint requires torch, which is "
                    "not available in this environment.  Export the state "
                    "dicts to .npz (enc/<key>, dec/<key> entries) to run "
                    "this codec torch-free, or use OrthogonalCodec."
                ) from exc
            raw = torch.load(path, map_location=self.device, weights_only=True)
            if "enc" not in raw or "dec" not in raw:
                raise ValueError("checkpoint missing 'enc' or 'dec' state dict")
            ckpt = {
                part: {k: v.cpu().numpy() for k, v in raw[part].items()}
                for part in ("enc", "dec")
            }
        self.params = validate_checkpoint(ckpt, self.dim, self.msg_len)
        if meta_delta is not None:
            # bounded by the trainer's own ramp cap — reject corrupt meta
            base = adaptive_model_params(self.dim, self.msg_len)["delta_scale"]
            if not (0.0 < meta_delta <= 1.5 * base + 1e-12):
                raise ValueError(
                    f"meta/delta_scale {meta_delta} outside (0, 1.5*base] "
                    f"for dim {self.dim} (base {base})"
                )
            self.params = {**self.params, "delta_scale": meta_delta}
        self._state = {
            part: {k: np.asarray(v, dtype=np.float64) for k, v in ckpt[part].items()}
            for part in ("enc", "dec")
        }
        return self._state

    # -- eval-mode forward passes -------------------------------------------
    def _encode_delta(self, v_n: np.ndarray, bits: np.ndarray) -> np.ndarray:
        """FiLM encoder forward (ref encoder.py:26-76): per block the message
        MLP emits gamma||beta modulating the cover branch; the head writes a
        tanh-bounded delta scaled by the adaptive delta_scale."""
        enc = self._ensure_state()["enc"]
        depth = self.params["depth"]
        h = v_n
        for i in range(depth):
            b = f"blocks.{i}"
            gamma_beta = _linear(_gelu(_linear(bits, enc, f"{b}.msg_fc.0")), enc, f"{b}.msg_fc.2")
            gamma, beta = np.split(gamma_beta, 2, axis=-1)
            t = _layernorm(h, enc[f"{b}.ln.weight"], enc[f"{b}.ln.bias"])
            t = _linear(_gelu(_linear(t, enc, f"{b}.fc1")), enc, f"{b}.fc2")
            h = h + (1.0 + gamma) * t + beta
        out = _linear(_layernorm(h, enc["out_ln.weight"], enc["out_ln.bias"]), enc, "out_fc")
        return np.tanh(out) * self.params["delta_scale"]

    def _decode_logits(self, v: np.ndarray) -> np.ndarray:
        """Residual-MLP decoder forward (ref decoder.py:14-52); dropout is
        identity in eval mode."""
        dec = self._ensure_state()["dec"]
        depth = self.params["depth"]
        h = v
        for i in range(depth):
            b = f"blocks.{i}"
            t = _layernorm(h, dec[f"{b}.ln.weight"], dec[f"{b}.ln.bias"])
            h = h + _linear(_gelu(_linear(t, dec, f"{b}.fc1")), dec, f"{b}.fc2")
        return _linear(_layernorm(h, dec["out_ln.weight"], dec["out_ln.bias"]), dec, "out_fc")

    # -- OrthogonalCodec-compatible batch interface -------------------------
    def encode_batch(self, vectors: np.ndarray, msgs: np.ndarray) -> np.ndarray:
        V = np.asarray(vectors, dtype=np.float64)
        norms = np.linalg.norm(V, axis=1, keepdims=True)
        v_n = V / (norms + 1e-8)
        bits = _msg_to_bits(np.asarray(msgs), self.msg_len)
        w = v_n + self._encode_delta(v_n, bits)
        w /= np.linalg.norm(w, axis=1, keepdims=True) + 1e-12
        return (w * norms).astype(np.float32)

    def decode_batch(self, vectors: np.ndarray) -> np.ndarray:
        V = np.asarray(vectors, dtype=np.float64)
        V = V / (np.linalg.norm(V, axis=1, keepdims=True) + 1e-8)
        bits = self._decode_logits(V) > 0.0  # sigmoid(x) > 0.5  <=>  x > 0
        return _bits_to_msg(bits)

    def fingerprint(self) -> str:
        """Content fingerprint over the loaded weights (shape + bytes of
        every enc/dec array) plus dim and msg_len — see
        :meth:`OrthogonalCodec.fingerprint` for the contract.  Forces the
        checkpoint load if it hasn't happened yet."""
        state = self._ensure_state()
        h = hashlib.sha256(f"torch|{self.dim}|{self.msg_len}".encode())
        for part in ("enc", "dec"):
            for name in sorted(state[part]):
                arr = np.ascontiguousarray(state[part][name])
                h.update(f"|{part}/{name}|{arr.shape}|".encode())
                h.update(arr.tobytes())
        return h.hexdigest()[:16]

    @property
    def kind(self) -> str:
        return "torch"
