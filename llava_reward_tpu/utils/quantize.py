"""Weight-only quantization for the frozen backbone — the TPU-native
equivalent of the reference's bitsandbytes NF4 path
(rw_model_general_preference.py:166-175, --load_in_4bit).

Symmetric per-output-channel absmax quantization of the big stacked layer
weights to int8 (or int4 packed two-per-byte). Weights stay quantized in
HBM (2x/4x capacity+bandwidth win on the layer reads); the scan body
dequantizes each layer's weights to the compute dtype right before the
matmul, and XLA fuses convert+scale into the matmul operand load.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

# key names encode the bit width so the tree stays all-array (scan-safe)
_Q8 = "qvalues_i8"
_Q4 = "qvalues_i4"  # two int4 packed per byte along the 'in' axis


def quantize_array(w: jnp.ndarray, bits: int = 8) -> Dict[str, jnp.ndarray]:
    """(..., in, out) float -> {'qvalues_i*', 'scale'} per-(leading, out)."""
    assert bits in (8, 4)
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # (..., 1, out)
    qmax = 127.0 if bits == 8 else 7.0
    scale = jnp.where(absmax > 0, absmax / qmax, 1.0)
    q = jnp.clip(jnp.round(wf / scale), -qmax, qmax).astype(jnp.int8)
    if bits == 4:
        assert q.shape[-2] % 2 == 0
        lo = q[..., 0::2, :] & 0x0F
        hi = (q[..., 1::2, :] & 0x0F) << 4
        return {_Q4: (lo | hi).astype(jnp.int8), "scale": scale.astype(jnp.float32)}
    return {_Q8: q, "scale": scale.astype(jnp.float32)}


def dequantize_array(qd: Dict[str, jnp.ndarray], dtype=jnp.bfloat16) -> jnp.ndarray:
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
    return isinstance(leaf, dict) and (_Q8 in leaf or _Q4 in leaf)


def quantize_stacked_layers(layers: dict, bits: int = 8, min_size: int = 1 << 20) -> dict:
    """Quantize every large float leaf of a stacked-layer tree (kernels),
    leaving layernorms/biases/small leaves untouched. Handles both bare-array
    layers (phi3) and {kernel, bias} dicts (qwen/llava)."""

    def q(leaf):
        if (
            hasattr(leaf, "dtype")
            and jnp.issubdtype(leaf.dtype, jnp.floating)
            and leaf.ndim >= 3  # stacked (L, in, out) matrices only
            and leaf.size >= min_size
        ):
            return quantize_array(leaf, bits)
        return leaf

    out = {}
    for name, v in layers.items():
        if isinstance(v, dict):
            out[name] = {k: (q(x) if k == "kernel" else x) for k, x in v.items()}
        else:
            out[name] = q(v)
    return out


def dequant_layer(lp: dict, dtype=jnp.bfloat16) -> dict:
    """Per-layer-slice dequant inside the scan body: any {'qvalues', ...}
    sub-dict becomes a dense array of ``dtype``."""

    def walk(v):
        if is_quantized(v):
            return dequantize_array(v, dtype)
        if isinstance(v, dict):
            return {k: walk(x) for k, x in v.items()}
        return v

    return {k: walk(v) for k, v in lp.items()}
