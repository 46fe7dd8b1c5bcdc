"""Value / prompt heads and the GPM skew-symmetric block matrices.

Reference: rw_model_general_preference.py:319-333 (head construction),
:450-482 (data-dependent skew blocks from prompt_head softmax).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_value_head(key: jax.Array, hidden_size: int, value_head_dim: int, dtype=jnp.float32) -> dict:
    """nn.Linear(hidden, dim, bias=False); reference init normal(0, 1/(h+1))
    (rw_model_general_preference.py:243-255)."""
    w = jax.random.normal(key, (hidden_size, value_head_dim)) / (hidden_size + 1)
    return {"kernel": w.astype(dtype)}


def init_prompt_head(key: jax.Array, hidden_size: int, value_head_dim: int, dtype=jnp.float32) -> dict:
    w = jax.random.normal(key, (hidden_size, value_head_dim // 2)) / (hidden_size + 1)
    return {"kernel": w.astype(dtype)}


def apply_value_head(head: dict, hidden: jnp.ndarray) -> jnp.ndarray:
    return hidden @ head["kernel"]


def fixed_skew_block_matrix(dim: int, dtype=jnp.float32) -> jnp.ndarray:
    """R with 2x2 blocks [[0,-1],[1,0]] on the diagonal
    (loss.py:364-369). R[i, i+1] = -1, R[i+1, i] = 1."""
    assert dim % 2 == 0
    eye = jnp.eye(dim // 2, dtype=dtype)
    block = jnp.array([[0.0, -1.0], [1.0, 0.0]], dtype=dtype)
    return jnp.kron(eye, block)


def prompt_skew_block_matrices(
    prompt_head: dict, prompt_hidden_states: jnp.ndarray, dim: int
) -> jnp.ndarray:
    """Data-dependent skew blocks (rw_model_general_preference.py:450-482):
    block values = softmax(prompt_head(prompt_hidden)), R[:, i, i+1] = -v_i,
    R[:, i+1, i] = v_i. Returns (B, dim, dim)."""
    assert dim % 2 == 0
    v = jax.nn.softmax(
        apply_value_head(prompt_head, prompt_hidden_states).astype(jnp.float32),
        axis=-1,
    ).astype(prompt_hidden_states.dtype)  # (B, dim//2)
    B = v.shape[0]
    block = jnp.array([[0.0, -1.0], [1.0, 0.0]], dtype=v.dtype)
    # (B, d/2, d/2) diagonal of per-pair values -> kron with 2x2 skew block
    diag = jax.vmap(jnp.diag)(v)  # (B, d/2, d/2)
    return jnp.einsum("bij,kl->bikjl", diag, block).reshape(B, dim, dim)


def eos_index_from_mask(attention_mask: jnp.ndarray) -> jnp.ndarray:
    """Index of the last valid (rightmost 1) position per row — the eval-mode
    reward read-out (rw_model_general_preference.py:420-421):
    S - 1 - argmax(fliplr(mask))."""
    S = attention_mask.shape[-1]
    flipped = jnp.flip(attention_mask.astype(jnp.int32), axis=-1)
    return S - 1 - jnp.argmax(flipped, axis=-1)


def readout(
    values: jnp.ndarray,  # (B, S, D) or (B, D) if already pooled
    attention_mask: jnp.ndarray,
    *,
    training: bool,
    mean_pooled: bool,
) -> jnp.ndarray:
    """Reward read-out (rw_model_general_preference.py:407-448):
    training (left-pad) -> values[:, -1]; eval -> gather at EOS index;
    mean_hidden_state -> values already pooled, pass through."""
    if mean_pooled:
        return values
    if training:
        return values[:, -1, :]
    idx = eos_index_from_mask(attention_mask)  # (B,)
    return jnp.take_along_axis(values, idx[:, None, None], axis=1)[:, 0, :]


def masked_mean_pool(hidden: jnp.ndarray, attention_mask: jnp.ndarray) -> jnp.ndarray:
    """Masked mean over the sequence (rw_model_general_preference.py:398-406)."""
    mask = attention_mask.astype(hidden.dtype)[..., None]
    s = jnp.sum(hidden * mask, axis=1)
    n = jnp.clip(jnp.sum(mask, axis=1), 1e-8, None)
    return s / n
