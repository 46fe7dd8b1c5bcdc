"""Optimizer + LR schedule: the TPU-native stand-ins for FusedAdam /
DeepSpeedCPUAdam and HF get_scheduler (deepspeed.py:114-122,
train_llava_reward.py:102-107).

optax AdamW is fused by XLA; an optional host-offloaded optimizer-state
variant mirrors --adam_offload (deepspeed_utils.py:28-31) by keeping the two
Adam moments in pinned host memory between steps.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import optax


def cosine_schedule_with_warmup(
    lr: float, total_steps: int, warmup_ratio: float = 0.03, min_ratio: float = 0.0
) -> optax.Schedule:
    """HF 'cosine' schedule with ceil(3%) warmup (train_llava_reward.py:102-107)."""
    warmup_steps = math.ceil(total_steps * warmup_ratio)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = lr * step / jnp.maximum(warmup_steps, 1)
        progress = (step - warmup_steps) / jnp.maximum(total_steps - warmup_steps, 1)
        progress = jnp.clip(progress, 0.0, 1.0)
        cos = lr * (min_ratio + (1 - min_ratio) * 0.5 * (1 + jnp.cos(jnp.pi * progress)))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def make_optimizer(
    lr: float,
    total_steps: int,
    *,
    betas=(0.9, 0.95),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    warmup_ratio: float = 0.03,
    max_norm: Optional[float] = None,
    accumulation_steps: int = 1,
) -> optax.GradientTransformation:
    """AdamW + cosine/warmup (+ optional grad clip), with optax.MultiSteps
    for gradient accumulation (--accumulated_gradient,
    train_llava_reward.py:99,162)."""
    sched = cosine_schedule_with_warmup(lr, total_steps, warmup_ratio)
    chain = []
    if max_norm is not None:
        chain.append(optax.clip_by_global_norm(max_norm))
    chain.append(
        optax.adamw(
            learning_rate=sched,
            b1=betas[0],
            b2=betas[1],
            eps=eps,
            weight_decay=weight_decay,
        )
    )
    tx = optax.chain(*chain)
    if accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulation_steps)
    return tx


def offload_opt_state_to_host(opt_state):
    """--adam_offload analogue: move optimizer moments to host memory.

    Use between steps when HBM is tight; ``device_put`` back before update.
    """
    cpu = jax.devices("cpu")[0]
    return jax.device_put(opt_state, cpu)
