"""Normalisation ops with fp32 internals (bf16 in/out).

RMSNorm matches Phi3RMSNorm semantics (reference modeling_phi3_v.py:375-390):
compute variance in fp32, rescale, cast back to the input dtype, THEN multiply
by the weight. The cast-before-weight order matters for bit-level parity.
"""

from __future__ import annotations

import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jnp.reciprocal(jnp.sqrt(var + eps))
    return weight * xf.astype(dtype)


def layer_norm(
    x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-5
) -> jnp.ndarray:
    """Standard LayerNorm (CLIP tower), fp32 internals."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xf = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    out = xf * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(dtype)
