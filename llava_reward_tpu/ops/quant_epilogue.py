"""Quantizing normalisation epilogues: LayerNorm / RMSNorm that emit int8
codes + per-row scales directly from VMEM.

Why this kernel exists (PERF.md int8 ledger, round 4): per-matmul, int8
W8A8 wins at the CLIP qkv/fc1 shapes (qkv 4.00 -> 2.51 ms), but TOWER-level
the win vanished (bf16 389.0 vs int8-qkv/fc1 389.5 ms) because XLA stops
fusing the dynamic activation-quantize pass (absmax + round over the (M, H)
activation) when the producer is the LN in front of a fused-qkv consumer —
the quantize becomes a standalone HBM read+write per matmul. Fusing the
quantize INTO the norm producer makes it free again: one read of h, one
int8 write (half the bytes a bf16 LN would write), plus a (M, 1) scale.

The reference has no analogue (bitsandbytes int8 is a CUDA-side
Linear8bitLt, rw_model_general_preference.py:166-185); this is TPU-side
optimization only — numerics stay within the W8A8 class (the int8 decision
parity line in PARITY.md is the contract).

Consumers: ``int8_linear_pre`` in utils/quantize.py takes (codes, rowscale)
plus the usual {'qvalues_w8a8', 'scale'} weight dict.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_quant_kernel(x_ref, w_ref, b_ref, o_ref, s_ref, *, eps: float):
    xf = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    # reciprocal(sqrt()) — NOT lax.rsqrt — to match norms.py bit-for-bit
    y = xc * jnp.reciprocal(jnp.sqrt(var + eps))
    y = y * w_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    amax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    amax = jnp.where(amax > 0, amax, 1.0)
    o_ref[...] = jnp.round(y * (127.0 / amax)).astype(jnp.int8)
    s_ref[...] = amax


def _rms_quant_kernel(x_ref, w_ref, o_ref, s_ref, *, eps: float):
    # Phi3RMSNorm order (norms.py:13-18): normalise in f32, cast to the
    # input dtype, THEN weight-multiply. The cast is reproduced so the
    # quantized codes match quantize(rms_norm(x)) bit-for-bit.
    xf = x_ref[...].astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    # reciprocal(sqrt()) — NOT lax.rsqrt — to match norms.py bit-for-bit;
    # the explicit bf16 cast round-trips reproduce the cast-before-weight
    # rounding (lax.reduce_precision has no Mosaic lowering)
    xn = xf * jnp.reciprocal(jnp.sqrt(var + eps))
    if x_ref.dtype == jnp.bfloat16:
        xn = xn.astype(jnp.bfloat16).astype(jnp.float32)
        y = (w_ref[...].astype(jnp.float32) * xn).astype(
            jnp.bfloat16
        ).astype(jnp.float32)
    else:
        y = w_ref[...].astype(jnp.float32) * xn
    amax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    amax = jnp.where(amax > 0, amax, 1.0)
    o_ref[...] = jnp.round(y * (127.0 / amax)).astype(jnp.int8)
    s_ref[...] = amax


def _norm_quant(x, weight, bias, *, eps: float, interpret=None):
    """Shared driver: x (..., H) -> (codes int8 (..., H), rowscale f32
    (..., 1))."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"  # CPU tests interpret
    H = x.shape[-1]
    lead = x.shape[:-1]
    M = 1
    for d in lead:
        M *= d
    x2 = x.reshape(M, H)

    # row block: keep the f32 working set ~2-3 MB of VMEM
    bm = 512 if H <= 1536 else 256
    if M % bm != 0:
        bm = next(b for b in (256, 128, 64, 32, 16, 8, 1) if M % b == 0)
    grid = (M // bm,)

    kernel = (
        functools.partial(_ln_quant_kernel, eps=eps)
        if bias is not None
        else functools.partial(_rms_quant_kernel, eps=eps)
    )
    w2 = weight.reshape(1, H)
    ops = [w2] if bias is None else [w2, bias.reshape(1, H)]
    w_specs = [pl.BlockSpec((1, H), lambda i: (0, 0)) for _ in ops]
    codes, scale = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((bm, H), lambda i: (i, 0))] + w_specs,
        out_specs=[
            pl.BlockSpec((bm, H), lambda i: (i, 0)),
            pl.BlockSpec((bm, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, H), jnp.int8),
            jax.ShapeDtypeStruct((M, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x2, *ops)
    return codes.reshape(*lead, H), scale.reshape(*lead, 1)


def ln_quant(x, weight, bias, eps: float = 1e-5, *, interpret=None):
    """LayerNorm + symmetric per-row int8 quantization in one VMEM pass.

    Equivalent to ``quantize(layer_norm(x, weight, bias, eps))`` with the
    quantize reading the f32 LN output (slightly MORE precise than the
    default path, which round-trips through bf16)."""
    return _norm_quant(x, weight, bias, eps=eps, interpret=interpret)


def rms_quant(x, weight, eps: float = 1e-5, *, interpret=None):
    """RMSNorm (Phi3 cast order) + per-row int8 quantization in one pass."""
    return _norm_quant(x, weight, None, eps=eps, interpret=interpret)


def _silu_mul_quant_kernel(gu_ref, o_ref, s_ref):
    # gate_up block (BM, 2I) -> silu(gate) * up quantized to int8 (BM, I).
    # bf16 multiply rounding reproduced so codes == quantize(silu(g)*u)
    # under the models' bf16 activations.
    gu = gu_ref[...]
    I = gu.shape[-1] // 2
    g = gu[..., :I].astype(jnp.float32)
    u = gu[..., I:].astype(jnp.float32)
    y = g * jax.nn.sigmoid(g) * u
    if gu_ref.dtype == jnp.bfloat16:
        y = y.astype(jnp.bfloat16).astype(jnp.float32)
    amax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    amax = jnp.where(amax > 0, amax, 1.0)
    o_ref[...] = jnp.round(y * (127.0 / amax)).astype(jnp.int8)
    s_ref[...] = amax


def silu_mul_quant(gate_up, *, interpret=None):
    """silu(gate) * up + per-row int8 quantization in one VMEM pass.

    ``gate_up`` (..., 2I) is the fused gate_up projection output (gate in
    the first I columns — phi3.py / qwen25_vl.py layout). Returns
    (codes int8 (..., I), rowscale f32 (..., 1)) for int8_linear_pre with
    down_proj: the down matmul's dynamic-quantize pass reads the LARGEST
    activation in the model ((M, I), I=8192 phi3 / 18944 qwen), so fusing
    it into the producer saves the most HBM traffic of the three."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    I2 = gate_up.shape[-1]
    I = I2 // 2
    lead = gate_up.shape[:-1]
    M = 1
    for d in lead:
        M *= d
    g2 = gate_up.reshape(M, I2)
    # VMEM working set ~ bm * I * 16 bytes (bf16 in + f32 g/u/y): keep it
    # well under the 16 MB budget at qwen's I=18944
    bm = 64 if I <= 10240 else 32
    if M % bm != 0:
        bm = next(b for b in (32, 16, 8, 1) if M % b == 0)
    codes, scale = pl.pallas_call(
        _silu_mul_quant_kernel,
        grid=(M // bm,),
        in_specs=[pl.BlockSpec((bm, I2), lambda i: (i, 0))],
        out_specs=[
            pl.BlockSpec((bm, I), lambda i: (i, 0)),
            pl.BlockSpec((bm, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, I), jnp.int8),
            jax.ShapeDtypeStruct((M, 1), jnp.float32),
        ],
        interpret=interpret,
    )(g2)
    return codes.reshape(*lead, I), scale.reshape(*lead, 1)


def _row_quant_kernel(x_ref, o_ref, s_ref):
    xf = x_ref[...].astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    amax = jnp.where(amax > 0, amax, 1.0)
    o_ref[...] = jnp.round(xf * (127.0 / amax)).astype(jnp.int8)
    s_ref[...] = amax


def row_quant(x, *, interpret=None):
    """Per-row symmetric int8 quantization in ONE VMEM pass (absmax + round
    together). XLA's dynamic quantize needs two passes over the activation
    (amax reduce, then scale+round) and cannot fuse either into a Pallas
    producer (custom-call boundary) — so for activations produced by our
    attention kernels (o_proj input) this saves a full HBM read."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    H = x.shape[-1]
    lead = x.shape[:-1]
    M = 1
    for d in lead:
        M *= d
    x2 = x.reshape(M, H)
    bm = 512 if H <= 1536 else 256
    if M % bm != 0:
        bm = next(b for b in (256, 128, 64, 32, 16, 8, 1) if M % b == 0)
    codes, scale = pl.pallas_call(
        _row_quant_kernel,
        grid=(M // bm,),
        in_specs=[pl.BlockSpec((bm, H), lambda i: (i, 0))],
        out_specs=[
            pl.BlockSpec((bm, H), lambda i: (i, 0)),
            pl.BlockSpec((bm, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, H), jnp.int8),
            jax.ShapeDtypeStruct((M, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x2)
    return codes.reshape(*lead, H), scale.reshape(*lead, 1)


def supported(x) -> bool:
    """The kernel wants a lane-aligned feature axis and f32/bf16 input."""
    return (
        x.ndim >= 2
        and x.shape[-1] % 128 == 0
        and x.dtype in (jnp.float32, jnp.bfloat16)
    )
