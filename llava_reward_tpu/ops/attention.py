"""Attention entry point with XLA reference implementation and Pallas dispatch.

Replaces flash-attn 2 in the reference (modeling_phi3_v.py:723-1032 and the
CLIPAttentionFA2 swap-in :85-115). On TPU the padded-batch unpad/pad dance
(bert_padding) is unnecessary: static shapes + masking inside the kernel.

Layout convention at the API: (batch, seq, heads, head_dim); the kernel
transposes to head-major internally (XLA fuses those into the surrounding
projections).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _build_bias(
    q_len: int,
    kv_len: int,
    causal: bool,
    key_padding_mask: Optional[jnp.ndarray],  # (B, kv_len) 1=valid
    sliding_window: Optional[int],
    dtype=jnp.float32,
    segment_ids: Optional[jnp.ndarray] = None,  # (B, kv_len) 0=pad
) -> Optional[jnp.ndarray]:
    """Additive attention bias (B or 1, 1, q_len, kv_len)."""
    bias = None
    q_pos = jnp.arange(q_len)[:, None] + (kv_len - q_len)
    k_pos = jnp.arange(kv_len)[None, :]
    if causal:
        allowed = k_pos <= q_pos
        if sliding_window is not None and sliding_window < kv_len:
            allowed = allowed & (k_pos > q_pos - sliding_window)
        bias = jnp.where(allowed, 0.0, NEG_INF).astype(dtype)[None, None]
    if segment_ids is not None:
        # attention only within equal nonzero segments (per-frame full
        # attention in the qwen vision tower: cu_seqlens per grid_t slice)
        seg = segment_ids.astype(jnp.int32)
        ok = (seg[:, :, None] == seg[:, None, :]) & (seg[:, None, :] != 0)
        sm = jnp.where(ok, 0.0, NEG_INF).astype(dtype)[:, None]  # (B,1,q,k)
        bias = sm if bias is None else bias + sm
    if key_padding_mask is not None:
        pm = jnp.where(key_padding_mask.astype(bool), 0.0, NEG_INF).astype(dtype)
        pm = pm[:, None, None, :]  # (B,1,1,kv)
        bias = pm if bias is None else bias + pm
    return bias


def attention_reference(
    q: jnp.ndarray,  # (B, Sq, H, D)
    k: jnp.ndarray,  # (B, Skv, Hk, D)
    v: jnp.ndarray,  # (B, Skv, Hk, D)
    *,
    causal: bool = False,
    key_padding_mask: Optional[jnp.ndarray] = None,  # (B, Skv) 1=valid
    sliding_window: Optional[int] = None,
    scale: Optional[float] = None,
    segment_ids: Optional[jnp.ndarray] = None,  # (B, Skv) 0=pad
) -> jnp.ndarray:
    """Pure-XLA attention, fp32 softmax (matches HF eager semantics,
    modeling_phi3_v.py:640-660). GQA handled by head broadcasting."""
    B, Sq, H, D = q.shape
    _, Skv, Hk, _ = k.shape
    if scale is None:
        scale = 1.0 / (D ** 0.5)
    n_rep = H // Hk
    qh = q.reshape(B, Sq, Hk, n_rep, D)
    scores = jnp.einsum(
        "bqhrd,bkhd->bhrqk", qh, k, preferred_element_type=jnp.float32
    ) * scale  # (B, Hk, n_rep, Sq, Skv)
    bias = _build_bias(
        Sq, Skv, causal, key_padding_mask, sliding_window,
        segment_ids=segment_ids,
    )
    if bias is not None:
        scores = scores + bias[:, :, None]  # broadcast over (Hk, n_rep)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhrqk,bkhd->bqhrd", probs, v)
    return out.reshape(B, Sq, H, D)


def mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    key_padding_mask: Optional[jnp.ndarray] = None,
    sliding_window: Optional[int] = None,
    scale: Optional[float] = None,
    impl: str = "auto",
    mask_layout: str = "leftpad",
) -> jnp.ndarray:
    """Dispatch: Pallas flash kernel on TPU, XLA reference elsewhere.

    ``impl``: "auto" | "pallas" | "xla".
    ``mask_layout``: "leftpad" if valid keys form a suffix (the decoder
    collator's convention), "arbitrary" for any key-valid pattern (qwen
    vision windows) — see flash_attention.
    """
    if impl == "auto":
        try:
            on_tpu = jax.devices()[0].platform == "tpu"
        except Exception:
            on_tpu = False
        # tiny bidirectional rows (qwen vision windows: 64 patches) stay on
        # XLA; mid-size non-causal (CLIP tower: 577 tokens) goes to the
        # kernel since the single-block row policy landed (8.2 vs 14.4
        # ms/layer measured at CLIP shapes, PERF.md)
        if on_tpu and not causal and q.shape[1] < 256:
            on_tpu = False
        impl = "pallas" if on_tpu else "xla"
    if impl == "pallas":
        from .flash_attention import flash_attention

        return flash_attention(
            q,
            k,
            v,
            causal=causal,
            key_padding_mask=key_padding_mask,
            sliding_window=sliding_window,
            scale=scale,
            mask_layout=mask_layout,
        )
    if mask_layout == "segments":
        return attention_reference(
            q, k, v, causal=causal, sliding_window=sliding_window,
            scale=scale, segment_ids=key_padding_mask,
        )
    return attention_reference(
        q,
        k,
        v,
        causal=causal,
        key_padding_mask=key_padding_mask,
        sliding_window=sliding_window,
        scale=scale,
    )


def fused_rope_attention(
    qkv: jnp.ndarray,  # (B, S, q_size + 2*kv_size) fused projection output
    cos: jnp.ndarray,  # (B, S, head_dim)
    sin: jnp.ndarray,
    *,
    n_heads: int,
    n_kv_heads: int,
    head_dim: int,
    causal: bool = True,
    key_padding_mask: Optional[jnp.ndarray] = None,  # left-pad convention
    sliding_window: Optional[int] = None,
    scale: Optional[float] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Decoder attention straight from the fused qkv projection output ->
    (B, S, n_heads*head_dim). On TPU (when the shapes allow) this runs the
    fused Pallas path: rope+transpose prep kernel + head-major flash core,
    with zero XLA layout transposes (~5.5 ms/layer saved at reward shapes).
    Elsewhere it falls back to split + rope + mha."""
    B, S, _ = qkv.shape
    qsz = n_heads * head_dim
    kvsz = n_kv_heads * head_dim

    use_fused = False
    if impl in ("auto", "pallas"):
        from .flash_attention import fused_path_supported

        try:
            on_tpu = jax.devices()[0].platform == "tpu"
        except Exception:
            on_tpu = False
        if (impl == "pallas" or on_tpu) and fused_path_supported(
            S, n_heads, n_kv_heads, head_dim
        ):
            use_fused = True
    if use_fused:
        from .flash_attention import fused_qkv_attention

        return fused_qkv_attention(
            qkv, cos, sin,
            n_heads=n_heads, n_kv_heads=n_kv_heads, head_dim=head_dim,
            causal=causal, key_padding_mask=key_padding_mask,
            sliding_window=sliding_window, scale=scale,
        )

    from .rope import apply_rotary

    q = qkv[..., :qsz].reshape(B, S, n_heads, head_dim)
    k = qkv[..., qsz : qsz + kvsz].reshape(B, S, n_kv_heads, head_dim)
    v = qkv[..., qsz + kvsz :].reshape(B, S, n_kv_heads, head_dim)
    q, k = apply_rotary(q, k, cos, sin)
    out = mha(
        q, k, v, causal=causal, key_padding_mask=key_padding_mask,
        sliding_window=sliding_window, scale=scale, impl=impl,
    )
    return out.reshape(B, S, qsz)
