"""Pallas flash kernel vs the XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llava_reward_tpu.ops.attention import attention_reference
from llava_reward_tpu.ops.flash_attention import flash_attention


def _rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_matches_reference(rng, causal):
    B, S, H, D = 2, 300, 2, 96  # odd S (block rounding) and D=96 (pad to 128)
    q, k, v = (_rand(rng, B, S, H, D) for _ in range(3))
    mask = np.ones((B, S), np.int32)
    mask[0, :37] = 0  # left padding

    out = flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        causal=causal, key_padding_mask=jnp.asarray(mask),
    )
    ref = attention_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        causal=causal, key_padding_mask=jnp.asarray(mask),
    )
    valid = mask.astype(bool)
    np.testing.assert_allclose(
        np.asarray(out)[valid], np.asarray(ref)[valid], rtol=2e-4, atol=2e-4
    )


def test_flash_sliding_window(rng):
    B, S, H, D = 1, 128, 2, 64
    q, k, v = (_rand(rng, B, S, H, D) for _ in range(3))
    out = flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True, sliding_window=17
    )
    ref = attention_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True, sliding_window=17
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_flash_gqa(rng):
    B, S, H, Hk, D = 1, 64, 4, 2, 32
    q = _rand(rng, B, S, H, D)
    k = _rand(rng, B, S, Hk, D)
    v = _rand(rng, B, S, Hk, D)
    out = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True)
    ref = attention_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_flash_backward_matches_reference(rng):
    B, S, H, D = 1, 96, 2, 32
    q, k, v = (_rand(rng, B, S, H, D) for _ in range(3))
    mask = np.ones((B, S), np.int32)
    mask[0, :10] = 0

    # only valid positions feed the loss (pad rows are garbage in every
    # implementation and masked out of the readout in the real model)
    w = jnp.asarray(mask.astype(np.float32))[:, :, None, None]

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, causal=True, key_padding_mask=jnp.asarray(mask))
        return jnp.sum((out * w) ** 2)

    def loss_ref(q, k, v):
        out = attention_reference(
            q, k, v, causal=True, key_padding_mask=jnp.asarray(mask)
        )
        return jnp.sum((out * w) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    )
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    )
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("pattern", ["interleaved", "rightpad"])
def test_flash_arbitrary_mask(rng, pattern):
    """ADVICE r1 (high): non-suffix key masks (qwen vision windows interleave
    invalid slots; the batch patch budget right-pads) must be honored by the
    kernel via mask_layout='arbitrary'."""
    B, S, H, D = 2, 200, 2, 64
    q, k, v = (_rand(rng, B, S, H, D) for _ in range(3))
    mask = np.ones((B, S), np.int32)
    if pattern == "interleaved":
        mask[0, 7::13] = 0  # holes scattered through the row
        mask[1, 3::5] = 0
    else:
        mask[0, 150:] = 0  # valid PREFIX (the opposite of the collator)
        mask[1, 60:] = 0

    out = flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        causal=False, key_padding_mask=jnp.asarray(mask),
        mask_layout="arbitrary",
    )
    ref = attention_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        causal=False, key_padding_mask=jnp.asarray(mask),
    )
    valid = mask.astype(bool)
    np.testing.assert_allclose(
        np.asarray(out)[valid], np.asarray(ref)[valid], rtol=2e-4, atol=2e-4
    )


def test_flash_arbitrary_mask_backward(rng):
    B, S, H, D = 1, 96, 2, 32
    q, k, v = (_rand(rng, B, S, H, D) for _ in range(3))
    mask = np.ones((B, S), np.int32)
    mask[0, 5::7] = 0
    w = jnp.asarray(mask.astype(np.float32))[:, :, None, None]

    def loss_flash(q, k, v):
        out = flash_attention(
            q, k, v, causal=False, key_padding_mask=jnp.asarray(mask),
            mask_layout="arbitrary",
        )
        return jnp.sum((out * w) ** 2)

    def loss_ref(q, k, v):
        out = attention_reference(
            q, k, v, causal=False, key_padding_mask=jnp.asarray(mask)
        )
        return jnp.sum((out * w) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    )
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    )
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3)


def test_fused_qkv_attention_matches_fallback(rng):
    """fused prep-kernel + head-major flash path (interpret mode on CPU) vs
    the split+rope+xla fallback of fused_rope_attention."""
    from llava_reward_tpu.ops.attention import fused_rope_attention
    from llava_reward_tpu.ops.flash_attention import fused_path_supported
    from llava_reward_tpu.ops.rope import compute_rope_cos_sin

    B, S, H, D = 2, 512, 4, 64
    assert fused_path_supported(S, H, H, D)
    qkv = jnp.asarray(_rand(rng, B, S, 3 * H * D))
    pos = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
    cos, sin = compute_rope_cos_sin(pos, D, dtype=jnp.float32)
    mask = np.ones((B, S), np.int32)
    mask[0, :31] = 0

    kw = dict(
        n_heads=H, n_kv_heads=H, head_dim=D, causal=True,
        key_padding_mask=jnp.asarray(mask),
    )
    fused = fused_rope_attention(qkv, cos, sin, impl="pallas", **kw)
    ref = fused_rope_attention(qkv, cos, sin, impl="xla", **kw)
    valid = mask.astype(bool)
    np.testing.assert_allclose(
        np.asarray(fused)[valid], np.asarray(ref)[valid], rtol=2e-4, atol=2e-4
    )


def test_fused_qkv_attention_gqa_and_grad(rng):
    from llava_reward_tpu.ops.attention import fused_rope_attention
    from llava_reward_tpu.ops.flash_attention import fused_path_supported
    from llava_reward_tpu.ops.rope import compute_rope_cos_sin

    B, S, H, Hk, D = 1, 256, 4, 2, 64
    assert fused_path_supported(S, H, Hk, D)
    qkv = jnp.asarray(_rand(rng, B, S, (H + 2 * Hk) * D))
    pos = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
    cos, sin = compute_rope_cos_sin(pos, D, dtype=jnp.float32)
    mask = np.ones((B, S), np.int32)
    mask[0, :9] = 0
    w = jnp.asarray(mask.astype(np.float32))[:, :, None]

    def loss(impl):
        def f(qkv):
            out = fused_rope_attention(
                qkv, cos, sin, n_heads=H, n_kv_heads=Hk, head_dim=D,
                causal=True, key_padding_mask=jnp.asarray(mask), impl=impl,
            )
            return jnp.sum((out * w) ** 2)
        return f

    fused_val, fused_grad = jax.value_and_grad(loss("pallas"))(qkv)
    ref_val, ref_grad = jax.value_and_grad(loss("xla"))(qkv)
    np.testing.assert_allclose(float(fused_val), float(ref_val), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(fused_grad), np.asarray(ref_grad), rtol=1e-3, atol=1e-3
    )


def test_flash_bf16(rng):
    B, S, H, D = 1, 256, 2, 96
    q, k, v = (
        jnp.asarray(_rand(rng, B, S, H, D), dtype=jnp.bfloat16) for _ in range(3)
    )
    out = flash_attention(q, k, v, causal=True)
    ref = attention_reference(q, k, v, causal=True)
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32),
        np.asarray(ref, dtype=np.float32),
        rtol=2e-2, atol=2e-2,
    )


@pytest.mark.parametrize(
    "B,S,H,Hk,D,causal,maskmode",
    [
        (2, 192, 4, 4, 64, True, "leftpad"),
        (2, 192, 4, 2, 64, True, "leftpad"),  # GQA
        (2, 160, 4, 4, 32, False, "arbitrary"),
        (1, 128, 2, 2, 96, True, "none"),
        (2, 192, 4, 4, 64, True, "window"),
    ],
)
def test_fused_backward_kernel_matches_reference(rng, B, S, H, Hk, D, causal, maskmode):
    """The fused Pallas backward (_fa_bwd_kernel) vs the XLA reference VJP.

    Upstream grads are zeroed at pad positions (as every real loss produces:
    valid queries never attend to pad keys, so no gradient path exists) —
    the two implementations then agree everywhere. Fully-masked rows differ
    only in don't-care garbage (where-mask vs additive-bias semantics)."""
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, Hk, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, Hk, D)), jnp.float32)
    window = 64 if maskmode == "window" else None
    kw = {}
    mask = None
    if maskmode in ("leftpad", "window"):
        m = np.ones((B, S), np.int32)
        m[0, :31] = 0
        mask = jnp.asarray(m)
        kw = dict(key_padding_mask=mask, mask_layout="leftpad", sliding_window=window)
    elif maskmode == "arbitrary":
        m = (rng.random((B, S)) > 0.2).astype(np.int32)
        m[:, -1] = 1
        mask = jnp.asarray(m)
        kw = dict(key_padding_mask=mask, mask_layout="arbitrary")
    mv = mask[:, :, None, None].astype(q.dtype) if mask is not None else 1.0
    w = jnp.cos(jnp.arange(D))

    def f(q, k, v):
        return (flash_attention(q, k, v, causal=causal, **kw) * w * mv).sum()

    def fr(q, k, v):
        return (
            attention_reference(
                q, k, v, causal=causal, key_padding_mask=mask, sliding_window=window
            ) * w * mv
        ).sum()

    ga = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    gb = jax.grad(fr, argnums=(0, 1, 2))(q, k, v)
    kmask = mask[:, :, None, None].astype(q.dtype) if mask is not None else 1.0
    for a, b, is_q in zip(ga, gb, (True, False, False)):
        sel = mv if is_q else kmask
        assert float(jnp.max(jnp.abs((a - b) * sel))) < 2e-4


def test_segment_mask_kernel_matches_reference(rng):
    """mask_layout='segments': per-segment full attention (qwen vision
    video slices) — kernel vs the segment-aware XLA reference, fwd + grad."""
    B, S, H, D = 2, 192, 4, 32
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    seg = np.zeros((B, S), np.int32)
    seg[:, :80] = 1
    seg[:, 80:150] = 2  # segment boundary mid-row + right padding zeros
    seg[1, 40:50] = 0  # interleaved pad slots
    seg = jnp.asarray(seg)
    ok = (np.asarray(seg) > 0).astype(np.float32)[:, :, None, None]

    out = flash_attention(q, k, v, causal=False, key_padding_mask=seg,
                          mask_layout="segments")
    ref = attention_reference(q, k, v, causal=False, segment_ids=seg)
    assert float(jnp.max(jnp.abs((out - ref) * ok))) < 2e-5

    w = jnp.cos(jnp.arange(D))

    def f(q, k, v):
        return (flash_attention(q, k, v, causal=False, key_padding_mask=seg,
                                mask_layout="segments") * w * ok).sum()

    def fr(q, k, v):
        return (attention_reference(q, k, v, causal=False, segment_ids=seg)
                * w * ok).sum()

    ga = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    gb = jax.grad(fr, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(ga, gb):
        assert float(jnp.max(jnp.abs((a - b) * ok))) < 2e-4


def test_kernel_partitions_under_mesh():
    """With a registered mesh the kernel runs under shard_map on the batch
    axes: ZERO all-gathers in the compiled module and a batch-sharded
    output. Without it, XLA cannot partition the custom call and
    all-gathers every operand (15 collectives measured on this shape)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from llava_reward_tpu.core.mesh import set_active_mesh

    devs = np.array(jax.devices()[:8]).reshape(2, 4, 1)
    mesh = Mesh(devs, ("dp", "fsdp", "tp"))
    B, S, H, D = 8, 128, 2, 32
    r = np.random.default_rng(0)
    q = jnp.asarray(r.standard_normal((B, S, H, D)), jnp.float32)
    k = jnp.asarray(r.standard_normal((B, S, H, D)), jnp.float32)
    v = jnp.asarray(r.standard_normal((B, S, H, D)), jnp.float32)
    sh = NamedSharding(mesh, P(("dp", "fsdp")))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))

    @jax.jit
    def f(q_, k_, v_):
        return flash_attention(q_, k_, v_, causal=True)

    set_active_mesh(mesh)
    try:
        with mesh:
            out = f(qs, ks, vs)
            txt = f.lower(qs, ks, vs).compile().as_text()
    finally:
        set_active_mesh(None)
    assert txt.count("all-gather") == 0
    assert out.sharding.spec[0] == ("dp", "fsdp")
    ref = attention_reference(q, k, v, causal=True)
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-5
