"""Golden tests for core ops against independent torch/numpy references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from llava_reward_tpu.ops.norms import rms_norm, layer_norm
from llava_reward_tpu.ops.activations import quick_gelu, gelu
from llava_reward_tpu.ops.rope import compute_rope_cos_sin, apply_rotary, rotate_half
from llava_reward_tpu.ops.attention import attention_reference
from llava_reward_tpu.core.config import RopeScalingConfig


def torch_rms_norm(x, w, eps=1e-5):
    # Phi3RMSNorm semantics: fp32 variance, cast back, then weight multiply
    dt = x.dtype
    xf = x.to(torch.float32)
    var = xf.pow(2).mean(-1, keepdim=True)
    xf = xf * torch.rsqrt(var + eps)
    return w * xf.to(dt)


def test_rms_norm_matches_torch(rng):
    x = rng.standard_normal((2, 5, 64)).astype(np.float32)
    w = rng.standard_normal(64).astype(np.float32)
    ours = rms_norm(jnp.asarray(x), jnp.asarray(w))
    ref = torch_rms_norm(torch.from_numpy(x), torch.from_numpy(w)).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-5)


def test_layer_norm_matches_torch(rng):
    x = rng.standard_normal((3, 7, 32)).astype(np.float32)
    w = rng.standard_normal(32).astype(np.float32)
    b = rng.standard_normal(32).astype(np.float32)
    ours = layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), eps=1e-5)
    ref = F.layer_norm(torch.from_numpy(x), (32,), torch.from_numpy(w), torch.from_numpy(b), 1e-5)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_activations_match_torch(rng):
    x = rng.standard_normal((100,)).astype(np.float32)
    t = torch.from_numpy(x)
    np.testing.assert_allclose(
        np.asarray(quick_gelu(jnp.asarray(x))),
        (t * torch.sigmoid(1.702 * t)).numpy(),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(gelu(jnp.asarray(x))), F.gelu(t).numpy(), rtol=1e-4, atol=1e-5
    )


def _torch_rope(position_ids, head_dim, base=10000.0, ext=None, scaling_factor=1.0):
    """Independent port of the reference rope math (modeling_phi3_v.py:408-477)."""
    inv_freq_shape = torch.arange(0, head_dim, 2, dtype=torch.int64).float() / head_dim
    if ext is None:
        inv_freq = 1.0 / (base ** inv_freq_shape)
    else:
        inv_freq = 1.0 / (torch.tensor(ext) * base ** inv_freq_shape)
    pos = torch.from_numpy(position_ids).float()
    freqs = pos[..., None] * inv_freq[None, None, :]
    emb = torch.cat((freqs, freqs), dim=-1)
    return (emb.cos() * scaling_factor).numpy(), (emb.sin() * scaling_factor).numpy()


def test_rope_base(rng):
    pos = np.arange(12, dtype=np.int32)[None].repeat(2, 0)
    cos, sin = compute_rope_cos_sin(jnp.asarray(pos), 16, dtype=jnp.float32)
    rcos, rsin = _torch_rope(pos, 16)
    np.testing.assert_allclose(np.asarray(cos), rcos, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sin), rsin, rtol=1e-4, atol=1e-5)


def test_rope_su_short_factor_and_scaling():
    import math
    head_dim = 8
    short = tuple(1.0 + 0.1 * i for i in range(head_dim // 2))
    long = tuple(2.0 + 0.1 * i for i in range(head_dim // 2))
    scaling = RopeScalingConfig("su", short, long)
    pos = np.arange(10, dtype=np.int32)[None]
    cos, sin = compute_rope_cos_sin(
        jnp.asarray(pos), head_dim, dtype=jnp.float32, scaling=scaling,
        max_position_embeddings=131072, original_max_position_embeddings=4096,
    )
    sf = math.sqrt(1 + math.log(131072 / 4096) / math.log(4096))
    rcos, rsin = _torch_rope(pos, head_dim, ext=short, scaling_factor=sf)
    np.testing.assert_allclose(np.asarray(cos), rcos, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sin), rsin, rtol=1e-4, atol=1e-5)


def test_rope_long_factor_selected_beyond_orig_max():
    head_dim = 8
    short = tuple([1.0] * 4)
    long = tuple([7.0] * 4)
    scaling = RopeScalingConfig("su", short, long)
    pos = np.array([[0, 5000]], dtype=np.int32)  # max pos+1 > 4096 -> long
    cos_l, _ = compute_rope_cos_sin(
        jnp.asarray(pos), head_dim, dtype=jnp.float32, scaling=scaling,
        max_position_embeddings=8192, original_max_position_embeddings=4096,
    )
    cos_s, _ = compute_rope_cos_sin(
        jnp.asarray(np.array([[0, 100]], dtype=np.int32)), head_dim,
        dtype=jnp.float32, scaling=scaling,
        max_position_embeddings=8192, original_max_position_embeddings=4096,
    )
    assert not np.allclose(np.asarray(cos_l)[0, 1], np.asarray(cos_s)[0, 1])


def test_apply_rotary_matches_torch(rng):
    B, S, H, D = 2, 6, 3, 8
    q = rng.standard_normal((B, S, H, D)).astype(np.float32)
    k = rng.standard_normal((B, S, H, D)).astype(np.float32)
    pos = np.arange(S, dtype=np.int32)[None].repeat(B, 0)
    cos, sin = compute_rope_cos_sin(jnp.asarray(pos), D, dtype=jnp.float32)
    qr, kr = apply_rotary(jnp.asarray(q), jnp.asarray(k), cos, sin)

    # torch reference with (B, H, S, D) layout (modeling_phi3_v.py:530-546)
    tq = torch.from_numpy(q).permute(0, 2, 1, 3)
    tcos = torch.from_numpy(np.asarray(cos)).unsqueeze(1)
    tsin = torch.from_numpy(np.asarray(sin)).unsqueeze(1)

    def rot_half(x):
        x1, x2 = x.chunk(2, dim=-1)
        return torch.cat((-x2, x1), dim=-1)

    ref_q = (tq * tcos) + (rot_half(tq) * tsin)
    np.testing.assert_allclose(
        np.asarray(qr).transpose(0, 2, 1, 3), ref_q.numpy(), rtol=1e-4, atol=1e-5
    )


def test_attention_reference_vs_torch_sdpa(rng):
    B, S, H, D = 2, 10, 4, 16
    q = rng.standard_normal((B, S, H, D)).astype(np.float32)
    k = rng.standard_normal((B, S, H, D)).astype(np.float32)
    v = rng.standard_normal((B, S, H, D)).astype(np.float32)
    mask = np.ones((B, S), dtype=np.int32)
    mask[0, :3] = 0  # left padding

    out = attention_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        causal=True, key_padding_mask=jnp.asarray(mask),
    )

    tq, tk, tv = (torch.from_numpy(x).permute(0, 2, 1, 3) for x in (q, k, v))
    bias = torch.zeros(B, 1, S, S)
    causal = torch.tril(torch.ones(S, S, dtype=torch.bool))
    bias.masked_fill_(~causal, float("-inf"))
    bias.masked_fill_(~torch.from_numpy(mask).bool()[:, None, None, :], float("-inf"))
    ref = F.scaled_dot_product_attention(tq, tk, tv, attn_mask=bias)
    ref = ref.permute(0, 2, 1, 3).numpy()
    # rows that can attend to something must match; fully-masked pad rows are
    # garbage in both implementations
    valid_rows = mask.astype(bool)
    np.testing.assert_allclose(
        np.asarray(out)[valid_rows], ref[valid_rows], rtol=1e-4, atol=1e-5
    )


def test_attention_gqa(rng):
    B, S, H, Hk, D = 1, 8, 8, 2, 16
    q = rng.standard_normal((B, S, H, D)).astype(np.float32)
    k = rng.standard_normal((B, S, Hk, D)).astype(np.float32)
    v = rng.standard_normal((B, S, Hk, D)).astype(np.float32)
    out = attention_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True)
    # explicit repeat_kv reference
    k_rep = np.repeat(k, H // Hk, axis=2)
    v_rep = np.repeat(v, H // Hk, axis=2)
    ref = attention_reference(jnp.asarray(q), jnp.asarray(k_rep), jnp.asarray(v_rep), causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_sliding_window(rng):
    B, S, H, D = 1, 12, 2, 8
    q, k, v = (rng.standard_normal((B, S, H, D)).astype(np.float32) for _ in range(3))
    out = attention_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True, sliding_window=4
    )
    # brute force
    scores = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(D)
    for i in range(S):
        for j in range(S):
            if j > i or j <= i - 4:
                scores[:, :, i, j] = -np.inf
    probs = torch.softmax(torch.from_numpy(scores), dim=-1).numpy()
    ref = np.einsum("bhqk,bkhd->bqhd", probs, v)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)
