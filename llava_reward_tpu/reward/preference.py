"""Preference probability from a (chosen, rejected) reward pair.

Reference: eval/reward_adaptor_loader.py:174-181 (preference_compute).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def preference_prob(
    chosen_rewards: jnp.ndarray,  # (B, D)
    reject_rewards: jnp.ndarray,  # (B, D)
    *,
    is_general_preference: bool,
    value_head_dim: int,
    tau: float,
) -> jnp.ndarray:
    """P(chosen > rejected). GPM dim-2 uses the skew product
    sigma((c0 r1 - c1 r0)/tau); otherwise BT sigma((rc - rr)/tau)."""
    if is_general_preference and value_head_dim == 2:
        prod = (
            chosen_rewards[:, 0] * reject_rewards[:, 1]
            - chosen_rewards[:, 1] * reject_rewards[:, 0]
        )
        return jax.nn.sigmoid(prod / tau)
    return jax.nn.sigmoid((chosen_rewards - reject_rewards) / tau)[..., 0]
