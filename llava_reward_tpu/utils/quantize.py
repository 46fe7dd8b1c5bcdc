"""Weight-only quantization for the frozen backbone — the TPU-native
equivalent of the reference's bitsandbytes NF4 path
(rw_model_general_preference.py:166-175, --load_in_4bit).

Three schemes, selected per call:
- int8 / int4 symmetric per-output-channel absmax (fast, simple grid);
- **nf4**: the bitsandbytes NormalFloat4 grid — 16 fixed normal-quantile
  levels with per-64-element-block absmax scaling along the 'in' axis,
  matching bnb's nf4 blockwise layout so 4-bit-loaded models score the
  same as the reference's --load_in_4bit.

Weights stay quantized in HBM (2x/4x capacity+bandwidth win on the layer
reads); the scan body dequantizes each layer's weights to the compute dtype
right before the matmul, and XLA fuses the gather/convert/scale into the
matmul operand load.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# key names encode the bit width so the tree stays all-array (scan-safe)
_Q8 = "qvalues_i8"
_Q4 = "qvalues_i4"  # two int4 packed per byte along the 'in' axis
_QNF4 = "qvalues_nf4"  # two nf4 codes packed per byte along the 'in' axis
_Q8A = "qvalues_w8a8"  # int8 weights RUN as int8 (dynamic per-row act quant)

# bitsandbytes NF4 grid (functional.py quantile table): 16 levels, the
# quantiles of N(0,1) normalised to [-1, 1]
NF4_GRID = np.asarray(
    [
        -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
        -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
        0.07958029955625534, 0.16093020141124725, 0.2461123913526535,
        0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
        0.7229568362236023, 1.0,
    ],
    np.float32,
)
_NF4_BOUNDARIES = (NF4_GRID[:-1] + NF4_GRID[1:]) / 2  # nearest-level decision
NF4_BLOCK = 64  # bnb default blocksize


def quantize_array_nf4(w, block: int = NF4_BLOCK) -> Dict[str, np.ndarray]:
    """(..., in, out) float -> {'qvalues_nf4', 'scale'} with bnb NF4
    semantics: per-``block`` absmax along the 'in' axis, codes = nearest of
    the 16 NF4 levels, two codes packed per byte.

    Runs in NUMPY on the host: quantization is a one-off at load time and a
    full-size layer stack is ~15 GB in f32 — tracing it onto a 16 GB chip
    OOMs before training starts. Only dequant (the per-step hot path) is
    device code."""
    wf = np.asarray(w, np.float32)
    n_in = wf.shape[-2]
    assert n_in % block == 0, (n_in, block)
    lead = wf.shape[:-2]
    nb = n_in // block
    wb = wf.reshape(*lead, nb, block, wf.shape[-1])
    absmax = np.max(np.abs(wb), axis=-2, keepdims=True)  # (..., nb, 1, out)
    scale = np.where(absmax > 0, absmax, 1.0)
    norm = wb / scale  # in [-1, 1]
    codes = np.searchsorted(_NF4_BOUNDARIES, norm.reshape(-1)).reshape(
        norm.shape
    ).astype(np.int8)  # 0..15
    codes = codes.reshape(*lead, n_in, wf.shape[-1])
    lo = codes[..., 0::2, :] & 0x0F
    hi = (codes[..., 1::2, :] & 0x0F) << 4
    return {
        _QNF4: (lo | hi).astype(np.int8),
        "scale": scale.reshape(*lead, nb, wf.shape[-1]).astype(np.float32),
    }


def dequantize_array_nf4(qd: Dict[str, jnp.ndarray], dtype=jnp.bfloat16) -> jnp.ndarray:
    q = qd[_QNF4]
    lo = q & 0x0F
    hi = (q >> 4) & 0x0F
    codes = jnp.stack([lo, hi], axis=-2).reshape(
        *q.shape[:-2], q.shape[-2] * 2, q.shape[-1]
    )
    vals = jnp.take(jnp.asarray(NF4_GRID), codes.astype(jnp.int32))
    lead = vals.shape[:-2]
    n_in, n_out = vals.shape[-2], vals.shape[-1]
    nb = qd["scale"].shape[-2]
    vals = vals.reshape(*lead, nb, n_in // nb, n_out) * qd["scale"][..., :, None, :]
    return vals.reshape(*lead, n_in, n_out).astype(dtype)


def quantize_array(w, bits: int = 8) -> Dict[str, np.ndarray]:
    """(..., in, out) float -> {'qvalues_i*', 'scale'} per-(leading, out).
    Host numpy (one-off at load; see quantize_array_nf4)."""
    assert bits in (8, 4)
    wf = np.asarray(w, np.float32)
    absmax = np.max(np.abs(wf), axis=-2, keepdims=True)  # (..., 1, out)
    qmax = 127.0 if bits == 8 else 7.0
    scale = np.where(absmax > 0, absmax / qmax, 1.0)
    q = np.clip(np.round(wf / scale), -qmax, qmax).astype(np.int8)
    if bits == 4:
        assert q.shape[-2] % 2 == 0
        lo = q[..., 0::2, :] & 0x0F
        hi = (q[..., 1::2, :] & 0x0F) << 4
        return {_Q4: (lo | hi).astype(np.int8), "scale": scale.astype(np.float32)}
    return {_Q8: q, "scale": scale.astype(np.float32)}


def dequantize_array(qd: Dict[str, jnp.ndarray], dtype=jnp.bfloat16) -> jnp.ndarray:
    if _QNF4 in qd:
        return dequantize_array_nf4(qd, dtype)
    if _Q4 in qd:
        q = qd[_Q4]
        lo = (q << 4).astype(jnp.int8) >> 4  # sign-extend low nibble
        hi = q >> 4
        q = jnp.stack([lo, hi], axis=-2).reshape(
            *q.shape[:-2], q.shape[-2] * 2, q.shape[-1]
        )
    else:
        q = qd[_Q8]
    return (q.astype(jnp.float32) * qd["scale"]).astype(dtype)


def is_quantized(leaf: Any) -> bool:
    return isinstance(leaf, dict) and (_Q8 in leaf or _Q4 in leaf or _QNF4 in leaf)


# ------------------------------------------------------------------ W8A8
#
# int8 INFERENCE mode (--load_in_8bit): unlike the weight-only schemes above
# (which dequantize before a bf16 matmul), W8A8 keeps the weights int8 in the
# matmul itself and dynamically quantizes the activations per row, so the
# MXU runs at the v5e's 394 TOPS int8 rate — 2x the 197 TF/s bf16 peak
# (measured: 388 T/s on 20480x8192x8192, quantisation overhead included).
# This is the TPU answer to the reference's 4-bit quantized inference path
# (rw_model_general_preference.py:166-185); on TPU 8-bit is the sweet spot
# because it is the widest dtype with a double-rate MXU mode.


def quantize_array_w8a8(w) -> Dict[str, np.ndarray]:
    """(..., in, out) float -> {'qvalues_w8a8', 'scale'}: symmetric int8
    with per-(leading, out-channel) scales; weights STAY int8 at run time."""
    wf = np.asarray(w, np.float32)
    absmax = np.max(np.abs(wf), axis=-2, keepdims=True)  # (..., 1, out)
    scale = np.where(absmax > 0, absmax / 127.0, 1.0)
    q = np.clip(np.round(wf / scale), -127, 127).astype(np.int8)
    return {_Q8A: q, "scale": scale.astype(np.float32)}


def is_w8a8(leaf: Any) -> bool:
    return isinstance(leaf, dict) and _Q8A in leaf


def _int8_matmul_2d(x2: jnp.ndarray, w: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """(N, in) x int8 (in, out) core: per-row dynamic activation quantization
    (absmax -> round to int8), an s8 x s8 -> s32 dot_general, then the f32
    epilogue folds both scales. XLA fuses the quantize pass and the epilogue
    around its own int8 matmul emitter.

    This XLA formulation is the DEFAULT ON TPU: the fused Pallas kernel
    (ops/int8_matmul.py, LRT_PALLAS_INT8=1 opts in) measured SLOWER at every
    production shape despite saving two HBM passes — XLA's int8 matmul
    emitter beats the naive VMEM-resident design (chained-timing ms/matmul,
    M=87040 CLIP / 20480 decoder rows: see the int8 ledger in PERF.md)."""
    import os

    from ..ops import int8_matmul

    if os.environ.get("LRT_PALLAS_INT8") == "1" and int8_matmul.supported(x2, w):
        return int8_matmul.w8a8_matmul(x2, w, scale)

    xf = x2.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    amax = jnp.where(amax > 0, amax, 1.0)
    xq = jnp.round(xf * (127.0 / amax)).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    yf = y.astype(jnp.float32) * (amax / 127.0) * scale.reshape(1, -1)
    return yf.astype(x2.dtype)


@jax.custom_vjp
def _int8_linear_core(x2, w, scale):
    return _int8_matmul_2d(x2, w, scale)


def _int8_core_fwd(x2, w, scale):
    # x2 itself is not a residual: the backward only needs W (frozen) — the
    # QLoRA property (reference trains LoRA over a 4-bit frozen base,
    # rw_model_general_preference.py:166-175; no dW is ever formed).
    return _int8_matmul_2d(x2, w, scale), (w, scale)


def _int8_core_bwd(res, dy):
    """dx = dy @ W_eff^T with W_eff = w * scale[out].

    Straight-through wrt the activation quantization (round'(x) = 0 a.e. —
    without this rule, LoRA grads upstream of any int8 layer would be
    silently zero). The int8->bf16 operand convert fuses into the matmul
    load, so the backward runs at full bf16 MXU rate without ever
    materializing a dequantized weight copy in HBM."""
    w, scale = res
    dys = dy.astype(jnp.float32) * scale.reshape(1, -1)
    dx = jax.lax.dot_general(
        dys.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    # int dtypes take float0 cotangents (zero-byte arrays, costless)
    zero_w = np.zeros(w.shape, dtype=jax.dtypes.float0)
    return dx.astype(dy.dtype), zero_w, jnp.zeros_like(scale)


_int8_linear_core.defvjp(_int8_core_fwd, _int8_core_bwd)


def int8_linear(x: jnp.ndarray, qd: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """x (..., in) @ int8 weight (in, out) on the int8 MXU path; see
    _int8_matmul_2d. Differentiable in x (custom_vjp), so a W8A8-quantized
    frozen backbone can sit under LoRA training (--load_in_8bit)."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    y = _int8_linear_core(x2, qd[_Q8A], qd["scale"])
    return y.reshape(*lead, -1)


def int8_linear_pre(
    codes: jnp.ndarray, rowscale: jnp.ndarray, qd: Dict[str, jnp.ndarray],
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """W8A8 matmul over PRE-quantized activations: ``codes`` (..., in) int8 +
    per-row ``rowscale`` (..., 1) f32 as produced by the quantizing norm
    epilogues (ops/quant_epilogue.py ln_quant/rms_quant). Saves the
    standalone dynamic-quantize HBM pass that _int8_matmul_2d pays when XLA
    fails to fuse it into the producer (PERF.md int8 ledger: the CLIP
    tower-level regression). Inference-only (no vjp: the epilogue path is
    used on frozen quantized towers)."""
    lead = codes.shape[:-1]
    c2 = codes.reshape(-1, codes.shape[-1])
    y = jax.lax.dot_general(
        c2, qd[_Q8A], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    yf = (
        y.astype(jnp.float32)
        * (rowscale.reshape(-1, 1) / 127.0)
        * qd["scale"].reshape(1, -1)
    )
    return yf.astype(dtype).reshape(*lead, -1)


def qmatmul(x: jnp.ndarray, w) -> jnp.ndarray:
    """Linear dispatcher for layer weights that may be W8A8 dicts: the int8
    run-time path when quantized for inference, a plain matmul otherwise
    (weight-only schemes were already dequantized by dequant_layer)."""
    if is_w8a8(w):
        return int8_linear(x, w)
    return x @ w


def quantize_stacked_layers(
    layers: dict, bits: int = 8, min_size: int = 1 << 20, scheme: str = "absmax",
    only=None,
) -> dict:
    """Quantize every large float leaf of a stacked-layer tree (kernels),
    leaving layernorms/biases/small leaves untouched. Handles both bare-array
    layers (phi3) and {kernel, bias} dicts (qwen/llava).

    ``scheme``: 'absmax' (per-out-channel symmetric int, dequant-before-
    matmul), 'nf4' (bitsandbytes NormalFloat4 blockwise grid — numerics
    match the reference's --load_in_4bit), or 'w8a8' (int8 kept in the
    matmul: the 394 TOPS inference mode, --load_in_8bit).

    ``only``: optional tuple of path substrings — quantize just the leaves
    whose 'a/b/c' tree path contains one of them (mixed-precision towers:
    int8 wins per-SHAPE, not per-model — see PERF.md int8 ledger)."""

    def q(leaf):
        if (
            hasattr(leaf, "dtype")
            and jnp.issubdtype(leaf.dtype, jnp.floating)
            and leaf.ndim >= 3  # stacked (L, in, out) matrices only
            and leaf.size >= min_size
        ):
            if scheme == "nf4":
                return quantize_array_nf4(leaf)
            if scheme == "w8a8":
                return quantize_array_w8a8(leaf)
            return quantize_array(leaf, bits)
        return leaf

    def walk(v, path):
        if isinstance(v, dict):
            return {k: walk(x, f"{path}/{k}") for k, x in v.items()}
        if only is not None and not any(s in path for s in only):
            return v
        return q(v)

    return {name: walk(v, name) for name, v in layers.items()}


def _unpack_i4_codes(q: jnp.ndarray) -> jnp.ndarray:
    """Packed int4 (..., in/2, out) -> sign-extended int8 codes (..., in, out)."""
    lo = (q << 4).astype(jnp.int8) >> 4
    hi = q >> 4
    return jnp.stack([lo, hi], axis=-2).reshape(
        *q.shape[:-2], q.shape[-2] * 2, q.shape[-1]
    )


def dequant_layer(lp: dict, dtype=jnp.bfloat16) -> dict:
    """Per-layer-slice dequant inside the scan body: any {'qvalues', ...}
    sub-dict becomes a dense array of ``dtype``.

    int4 absmax leaves RUN as W8A8 by default (LRT_I4_W8A8=0 opts out): the
    int4 grid is a subset of int8 codes, so unpacking nibbles to int8 codes
    (instead of converting to bf16) keeps the packed 0.5-byte HBM residency
    while the matmul itself runs on the v5e's 394-TOPS int8 path — ~2x the
    bf16 rate on llava-13B's attention projections. Weight values are
    EXACTLY preserved (code x scale unchanged); the only numerics delta is
    the W8A8 dynamic activation quantization, the same error class the int8
    MLP path already carries."""
    import os

    i4_w8a8 = os.environ.get("LRT_I4_W8A8", "1") != "0"

    def walk(v):
        if is_quantized(v):
            if i4_w8a8 and _Q4 in v:
                return {_Q8A: _unpack_i4_codes(v[_Q4]), "scale": v["scale"]}
            return dequantize_array(v, dtype)
        if isinstance(v, dict):
            return {k: walk(x) for k, x in v.items()}
        return v

    return {k: walk(v) for k, v in lp.items()}
