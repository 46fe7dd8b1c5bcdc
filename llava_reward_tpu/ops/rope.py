"""Rotary position embeddings: base, LongRoPE ("su") and yarn scaling.

Semantics follow the reference (modeling_phi3_v.py:408-517):
- frequencies and trig are computed in fp32 and cast to the compute dtype;
- su/yarn pick short vs long factors by ``seq_len = max(position_ids)+1``
  compared to ``original_max_position_embeddings`` -- here done with a
  traced ``jnp.where`` so the choice stays inside one compiled graph;
- su scaling factor: sqrt(1 + log(scale)/log(orig_max)) when
  max_pos > orig_max else 1.0; yarn: 0.1*log(scale)+1.0;
- emb = concat(freqs, freqs) and rotate_half pairs dim i with dim i+d/2.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp

from ..core.config import DecoderConfig


def compute_rope_cos_sin(
    position_ids: jnp.ndarray,  # (B, S) int32
    head_dim: int,
    base: float = 10000.0,
    dtype=jnp.bfloat16,
    scaling: Optional[object] = None,  # RopeScalingConfig
    max_position_embeddings: int = 131072,
    original_max_position_embeddings: int = 4096,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns cos, sin of shape (B, S, head_dim), in ``dtype``."""
    half = head_dim // 2
    exponent = jnp.arange(0, half, dtype=jnp.float32) / (head_dim / 2.0)
    pos = position_ids.astype(jnp.float32)  # (B, S)

    if scaling is None:
        inv_freq = 1.0 / (base ** exponent)  # (half,)
        scaling_factor = 1.0
    else:
        short = jnp.asarray(scaling.short_factor, dtype=jnp.float32)
        long = jnp.asarray(scaling.long_factor, dtype=jnp.float32)
        seq_len = jnp.max(position_ids) + 1
        ext = jnp.where(seq_len > original_max_position_embeddings, long, short)
        inv_freq = 1.0 / (ext * (base ** exponent))
        scale = max_position_embeddings / original_max_position_embeddings
        if scale <= 1.0:
            scaling_factor = 1.0
        elif scaling.rope_type == "su":
            scaling_factor = math.sqrt(
                1.0 + math.log(scale) / math.log(original_max_position_embeddings)
            )
        elif scaling.rope_type == "yarn":
            scaling_factor = 0.1 * math.log(scale) + 1.0
        else:
            raise ValueError(f"unknown rope scaling type {scaling.rope_type}")

    freqs = pos[..., None] * inv_freq[None, None, :]  # (B, S, half)
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # (B, S, head_dim)
    cos = jnp.cos(emb) * scaling_factor
    sin = jnp.sin(emb) * scaling_factor
    return cos.astype(dtype), sin.astype(dtype)


def rope_cos_sin_for_config(
    position_ids: jnp.ndarray, cfg: DecoderConfig, dtype=jnp.bfloat16
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return compute_rope_cos_sin(
        position_ids,
        cfg.head_dim,
        base=cfg.rope_theta,
        dtype=dtype,
        scaling=cfg.rope_scaling,
        max_position_embeddings=cfg.max_position_embeddings,
        original_max_position_embeddings=cfg.original_max_position_embeddings,
    )


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rotary(
    q: jnp.ndarray,  # (B, S, H, D)
    k: jnp.ndarray,  # (B, S, Hk, D)
    cos: jnp.ndarray,  # (B, S, D)
    sin: jnp.ndarray,  # (B, S, D)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply RoPE with heads on axis 2 (B, S, H, D layout — the layout the
    flash kernel wants, avoiding a transpose)."""
    c = cos[:, :, None, :]
    s = sin[:, :, None, :]
    q_out = q * c + rotate_half(q) * s
    k_out = k * c + rotate_half(k) * s
    return q_out, k_out
