"""Real-TPU numerics check: fused qkv attention with internal end-padding
(S=2976 -> 3072) vs attention_reference, at llava (MHA 40h/D128, direct
kernel) and qwen (GQA 28q/4kv, prep path) shapes, bf16."""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/jaxcache")

from llava_reward_tpu.ops.attention import attention_reference, fused_rope_attention


def check(name, B, S, nh, nkv, hd, seed=0):
    rng = np.random.default_rng(seed)
    qsz, kvsz = nh * hd, nkv * hd
    qkv = jnp.asarray(rng.standard_normal((B, S, qsz + 2 * kvsz)).astype(np.float32) * 0.3).astype(jnp.bfloat16)
    ang = rng.standard_normal((B, S, hd)).astype(np.float32) * 0.1
    cos = jnp.asarray(np.cos(ang)).astype(jnp.bfloat16)
    sin = jnp.asarray(np.sin(ang)).astype(jnp.bfloat16)
    mask = np.ones((B, S), np.int32)
    mask[0, : S // 7] = 0  # left-pad on one row
    mask_t = jnp.asarray(mask)

    @jax.jit
    def run_kernel(qkv, cos, sin, m):
        return fused_rope_attention(
            qkv, cos, sin, n_heads=nh, n_kv_heads=nkv, head_dim=hd,
            causal=True, key_padding_mask=m, impl="pallas",
        )

    @jax.jit
    def run_ref(qkv, cos, sin, m):
        q = qkv[..., :qsz].reshape(B, S, nh, hd)
        k = qkv[..., qsz : qsz + kvsz].reshape(B, S, nkv, hd)
        v = qkv[..., qsz + kvsz :].reshape(B, S, nkv, hd)

        def rot(x):
            h1, h2 = jnp.split(x, 2, axis=-1)
            r = jnp.concatenate([-h2, h1], axis=-1)
            return x * cos[:, :, None, :] + r * sin[:, :, None, :]

        out = attention_reference(rot(q), rot(k), v, causal=True, key_padding_mask=m)
        return out.reshape(B, S, qsz)

    o_k = np.asarray(run_kernel(qkv, cos, sin, mask_t), np.float32)
    o_r = np.asarray(run_ref(qkv, cos, sin, mask_t), np.float32)
    valid = mask.astype(bool)[:, :, None]
    d = np.abs(o_k - o_r) * valid
    rel = d.max() / (np.abs(o_r).max() + 1e-6)
    print(f"{name}: max abs diff {d.max():.5f} (rel {rel:.5f})")
    assert d.max() < 2e-2, (name, d.max())


check("llava MHA S=2976 (pads to 3072, direct kernel)", 2, 2976, 40, 40, 128)
check("qwen GQA S=1792 (no pad, prep path)", 2, 1792, 28, 4, 128)
check("odd GQA S=1000 (pads to 1024)", 2, 1000, 28, 4, 128, seed=1)
print("OK")
