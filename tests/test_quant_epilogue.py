"""Quantizing-norm epilogues (ops/quant_epilogue.py): kernel parity vs
layer_norm/rms_norm + dynamic quantize, and the model wiring (CLIP + phi3
decoder W8A8 paths take codes straight from the norm).

Reference relevance: the reference's int8 path is bitsandbytes
Linear8bitLt (rw_model_general_preference.py:166-185); the epilogue is a
TPU-side fusion that must stay inside the same W8A8 numerics class."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llava_reward_tpu.ops.norms import layer_norm, rms_norm
from llava_reward_tpu.ops.quant_epilogue import ln_quant, rms_quant
from llava_reward_tpu.utils.quantize import (
    int8_linear,
    int8_linear_pre,
    quantize_array_w8a8,
    quantize_stacked_layers,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_ln_quant_matches_norm_then_quantize(rng):
    x = jnp.asarray(rng.standard_normal((3, 40, 256)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal(256).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(256).astype(np.float32))
    codes, scale = ln_quant(x, w, b, 1e-5)
    ref = np.asarray(layer_norm(x, w, b, 1e-5))
    amax = np.abs(ref).max(-1, keepdims=True)
    np.testing.assert_array_equal(
        np.asarray(codes), np.round(ref * (127.0 / amax))
    )
    np.testing.assert_allclose(np.asarray(scale), amax, rtol=1e-6)


def test_rms_quant_matches_phi3_cast_order(rng):
    # bf16 input: the kernel must reproduce rms_norm's cast-before-weight
    # order (norms.py) so codes == quantize(rms_norm(x)) exactly
    x = jnp.asarray(rng.standard_normal((2, 24, 128)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    w = jnp.asarray(rng.standard_normal(128).astype(np.float32)).astype(jnp.bfloat16)
    codes, scale = rms_quant(x, w, 1e-5)
    ref = np.asarray(rms_norm(x, w, 1e-5), np.float32)
    amax = np.abs(ref).max(-1, keepdims=True)
    amax = np.where(amax > 0, amax, 1.0)
    np.testing.assert_array_equal(
        np.asarray(codes), np.round(ref * (127.0 / amax))
    )


def test_int8_linear_pre_equals_dynamic_path(rng):
    x = jnp.asarray(rng.standard_normal((3, 40, 256)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal(256).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(256).astype(np.float32))
    W = rng.standard_normal((256, 128)).astype(np.float32) * 0.1
    qd = {k: jnp.asarray(v[0]) for k, v in quantize_array_w8a8(W[None]).items()}

    codes, scale = ln_quant(x, w, b, 1e-5)
    y_pre = np.asarray(int8_linear_pre(codes, scale, qd, jnp.float32))
    y_dyn = np.asarray(int8_linear(layer_norm(x, w, b, 1e-5), qd))
    rel = np.abs(y_pre - y_dyn) / (np.abs(y_dyn) + 1e-2)
    assert np.median(rel) < 1e-4 and rel.max() < 1e-2


def test_odd_row_count_blocks(rng):
    # M not divisible by the preferred block: falls to a smaller divisor
    x = jnp.asarray(rng.standard_normal((1, 72, 384)).astype(np.float32))
    w = jnp.ones((384,), jnp.float32)
    codes, scale = rms_quant(x, w, 1e-5)
    assert codes.shape == (1, 72, 384) and scale.shape == (1, 72, 1)
    ref = np.asarray(rms_norm(x, w, 1e-5))
    amax = np.abs(ref).max(-1, keepdims=True)
    np.testing.assert_array_equal(np.asarray(codes), np.round(ref * (127.0 / amax)))


def test_silu_mul_quant_matches(rng):
    from llava_reward_tpu.ops.quant_epilogue import silu_mul_quant

    for dtype in (jnp.float32, jnp.bfloat16):
        gu = jnp.asarray(
            rng.standard_normal((2, 24, 512)).astype(np.float32)
        ).astype(dtype)
        codes, scale = silu_mul_quant(gu)
        g = np.asarray(gu[..., :256], np.float32)
        u = np.asarray(gu[..., 256:], np.float32)
        y = g / (1.0 + np.exp(-g)) * u
        if dtype == jnp.bfloat16:
            y = np.asarray(jnp.asarray(y).astype(jnp.bfloat16), np.float32)
        amax = np.abs(y).max(-1, keepdims=True)
        amax = np.where(amax > 0, amax, 1.0)
        want = np.round(y * (127.0 / amax))
        d = np.abs(np.asarray(codes) - want)
        # sigmoid rounding differs in the last ulp between backends: +-1 code
        assert d.max() <= 1, d.max()
        assert (d > 0).mean() < 0.02
        np.testing.assert_allclose(np.asarray(scale)[..., 0], amax[..., 0],
                                   rtol=1e-5)


def test_row_quant_matches_dynamic(rng):
    from llava_reward_tpu.ops.quant_epilogue import row_quant

    x = jnp.asarray(rng.standard_normal((3, 40, 256)).astype(np.float32))
    codes, scale = row_quant(x)
    xf = np.asarray(x)
    amax = np.abs(xf).max(-1, keepdims=True)
    np.testing.assert_array_equal(
        np.asarray(codes), np.round(xf * (127.0 / amax))
    )
    np.testing.assert_allclose(np.asarray(scale), amax, rtol=1e-6)


def test_phi3_decoder_w8a8_epilogue_wiring(rng, monkeypatch):
    """decoder_layer with W8A8 leaves must produce (near-)identical rewards
    whether the activation is quantized by the epilogue or dynamically."""
    from llava_reward_tpu.core.config import phi3v_tiny_config
    from llava_reward_tpu.models import clip_vit, phi3

    cfg = phi3v_tiny_config().decoder
    params = phi3.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    layers = quantize_stacked_layers(
        jax.device_get(params["layers"]), scheme="w8a8", min_size=0,
        only=("qkv_proj", "gate_up_proj", "down_proj", "o_proj"),
    )
    qparams = {**params, "layers": jax.tree_util.tree_map(jnp.asarray, layers)}
    B, S = 2, 16
    embeds = jnp.asarray(
        rng.standard_normal((B, S, cfg.hidden_size)).astype(np.float32)
    )
    mask = jnp.asarray(np.ones((B, S), np.int32))
    pos = jnp.asarray(np.tile(np.arange(S, dtype=np.int32)[None], (B, 1)))

    def run():
        return np.asarray(
            phi3.forward(
                qparams, cfg, embeds, mask, pos, attn_impl="xla"
            ).last_hidden_state
        )

    monkeypatch.setattr(clip_vit, "_on_tpu", lambda: True)  # interpret mode
    monkeypatch.setenv("LRT_LN_QUANT", "1")
    out_epi = run()
    monkeypatch.setenv("LRT_LN_QUANT", "0")
    out_dyn = run()
    rel = np.abs(out_epi - out_dyn) / (np.abs(out_dyn) + 1e-2)
    assert np.median(rel) < 2e-3, np.median(rel)


def test_qwen_fused_w8a8_epilogue_wiring(rng, monkeypatch):
    """qwen/llava fused-layout decoder: rms_quant epilogue vs dynamic path."""
    from llava_reward_tpu.core.config import qwen_tiny_config
    from llava_reward_tpu.models import clip_vit, qwen25_vl
    from llava_reward_tpu.models.qwen25_vl import fuse_decoder_projections

    tc = qwen_tiny_config().text
    params = qwen25_vl.init_text_params(jax.random.PRNGKey(0), tc, jnp.float32)
    layers = quantize_stacked_layers(
        jax.device_get(params["layers"]), scheme="w8a8", min_size=0,
    )
    fused = {**params, "layers": jax.tree_util.tree_map(
        jnp.asarray, fuse_decoder_projections(layers)
    )}
    B, S = 2, 16
    embeds = jnp.asarray(
        rng.standard_normal((B, S, tc.hidden_size)).astype(np.float32)
    )
    mask = jnp.asarray(np.ones((B, S), np.int32))
    pos1 = np.tile(np.arange(S, dtype=np.int32)[None], (B, 1))
    pos = jnp.asarray(np.stack([pos1, pos1, pos1]))

    def run():
        out, _ = qwen25_vl.text_forward(
            fused, tc, embeds, mask, pos, attn_impl="xla"
        )
        return np.asarray(out)

    monkeypatch.setattr(clip_vit, "_on_tpu", lambda: True)  # interpret mode
    monkeypatch.setenv("LRT_LN_QUANT", "1")
    out_epi = run()
    monkeypatch.setenv("LRT_LN_QUANT", "0")
    out_dyn = run()
    rel = np.abs(out_epi - out_dyn) / (np.abs(out_dyn) + 1e-2)
    assert np.median(rel) < 2e-3, np.median(rel)


def test_clip_tower_w8a8_epilogue_wiring(rng, monkeypatch):
    from llava_reward_tpu.core.config import VisionConfig
    from llava_reward_tpu.models import clip_vit

    cfg = VisionConfig(
        hidden_size=128, intermediate_size=256, num_layers=2, num_heads=4,
        image_size=32, patch_size=8,
    )
    params = clip_vit.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    for name in ("q", "k", "v"):
        k = params["layers"]["attn"][name]["kernel"]
        params["layers"]["attn"][name] = dict(params["layers"]["attn"][name])
        params["layers"]["attn"][name]["kernel"] = jax.tree_util.tree_map(
            jnp.asarray, quantize_array_w8a8(jax.device_get(k))
        )
    fc1 = params["layers"]["mlp"]["fc1"]["kernel"]
    params["layers"]["mlp"]["fc1"] = dict(params["layers"]["mlp"]["fc1"])
    params["layers"]["mlp"]["fc1"]["kernel"] = jax.tree_util.tree_map(
        jnp.asarray, quantize_array_w8a8(jax.device_get(fc1))
    )
    pixels = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))

    def run():
        return np.asarray(
            clip_vit.extract_patch_features(params, cfg, pixels, attn_impl="xla")
        )

    monkeypatch.setattr(clip_vit, "_on_tpu", lambda: True)
    monkeypatch.setenv("LRT_LN_QUANT", "1")
    out_epi = run()
    monkeypatch.setenv("LRT_LN_QUANT", "0")
    out_dyn = run()
    rel = np.abs(out_epi - out_dyn) / (np.abs(out_dyn) + 1e-2)
    assert np.median(rel) < 2e-3, np.median(rel)
