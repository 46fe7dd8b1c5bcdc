"""SkipCA: single-head cross-attention from decoder hidden states back to
vision-tower features, with residual + RMSNorm.

Reference (rw_model_general_preference.py:376-397):
  Q = W_q(h), K = W_k(v), V = W_v(v)
  out = softmax(Q K^T / sqrt(d)) V ;  h' = RMSNorm(h + out)
Phi path applies NO mask over padded vision slots — padded rows are exact
zeros, so (bias-free) K rows are zero and their scores are exactly 0, but
they still receive softmax weight. The number of zero columns therefore
matters: the reference pads to the BATCH max image-token count. We keep a
static T_img buffer and mask columns >= batch_max with -inf, reproducing the
reference result bit-for-bit while keeping shapes static.
Qwen path masks invalid slots with -1e4 (rw:390) — mode="qwen" mirrors that.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.norms import rms_norm


def init_params(key: jax.Array, hidden_size: int, dtype=jnp.float32) -> dict:
    """W_q/W_k/W_v ~ normal(0, 1/(hidden+1)) (rw_model:271-284), ca_layernorm
    weight ones."""
    k1, k2, k3 = jax.random.split(key, 3)
    std = 1.0 / (hidden_size + 1)

    def w(k):
        return (jax.random.normal(k, (hidden_size, hidden_size)) * std).astype(dtype)

    return {
        "W_q": {"kernel": w(k1)},
        "W_k": {"kernel": w(k2)},
        "W_v": {"kernel": w(k3)},
        "ca_layernorm": {"weight": jnp.ones((hidden_size,), dtype)},
    }


def apply(
    params: dict,
    hidden: jnp.ndarray,  # (B, S, H)
    vision: jnp.ndarray,  # (B, T_img, H) zero-padded on invalid slots
    num_img_tokens: jnp.ndarray,  # (B,) valid counts
    *,
    rms_eps: float = 1e-5,
    mode: str = "phi3v",  # "phi3v" | "qwen"
    batch_max: Optional[jnp.ndarray] = None,  # () or (B,) override: the
    # "zero-pad width" each sample saw in the reference (defaults to the
    # max over this batch; paired training passes per-half maxima so the
    # stacked forward reproduces the reference's two separate forwards)
) -> jnp.ndarray:
    H = vision.shape[-1]
    q = hidden @ params["W_q"]["kernel"]
    k = vision @ params["W_k"]["kernel"]
    v = vision @ params["W_v"]["kernel"]
    scores = jnp.einsum("bsh,bth->bst", q, k, preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.float32(H))
    slot = jnp.arange(vision.shape[1])[None, :]  # (1, T_img)
    if mode == "phi3v":
        # zero-score columns up to the batch max participate (reference
        # zero-pads to batch max); columns beyond it never existed there.
        if batch_max is None:
            batch_max = jnp.max(num_img_tokens)
        batch_max = jnp.broadcast_to(jnp.asarray(batch_max), (vision.shape[0],))
        invalid = slot >= batch_max[:, None]
        scores = jnp.where(invalid[:, None, :], -jnp.inf, scores)
    else:  # qwen: per-sample mask with the reference's -1e4 fill (rw:390)
        invalid = slot >= num_img_tokens[:, None]
        scores = jnp.where(invalid[:, None, :], jnp.float32(-1e4), scores)
    probs = jax.nn.softmax(scores, axis=-1).astype(hidden.dtype)
    out = jnp.einsum("bst,bth->bsh", probs, v)
    return rms_norm(hidden + out, params["ca_layernorm"]["weight"], rms_eps)
