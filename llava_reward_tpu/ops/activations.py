"""Activation functions used by the backbones."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """CLIP's quick_gelu: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU — matches torch.nn.GELU default used by the
    Phi3V img_projection MLP (modeling_phi3_v.py:172-179)."""
    return jax.nn.gelu(x, approximate=False)


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(x)


ACT2FN = {
    "quick_gelu": quick_gelu,
    "gelu": gelu,
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "silu": silu,
}
