"""Fused-projection inference layout (fuse_decoder_projections):
qkv_proj / gate_up_proj parity vs separate projections, W8A8 fusion, and
the packed-int4-run-as-W8A8 path (dequant_layer).

Reference behavior covered: the reward forward must be numerically
unchanged by the layout (rw_model_general_preference.py runs HF's separate
q/k/v projections; fusing them is a TPU-side optimization only)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llava_reward_tpu.core.config import llava_tiny_config, qwen_tiny_config
from llava_reward_tpu.models import qwen25_vl
from llava_reward_tpu.models.qwen25_vl import fuse_decoder_projections
from llava_reward_tpu.utils.quantize import (
    dequant_layer,
    is_w8a8,
    quantize_array,
    quantize_stacked_layers,
)


def _text_inputs(tc, B=2, S=12, seed=0):
    rng = np.random.default_rng(seed)
    embeds = jnp.asarray(rng.standard_normal((B, S, tc.hidden_size)).astype(np.float32))
    mask = jnp.asarray(np.ones((B, S), np.int32))
    pos1 = np.tile(np.arange(S, dtype=np.int32)[None], (B, 1))
    pos = jnp.asarray(np.stack([pos1, pos1, pos1]))
    return embeds, mask, pos


def test_fused_layout_exact_parity():
    tc = qwen_tiny_config().text
    params = qwen25_vl.init_text_params(jax.random.PRNGKey(0), tc, jnp.float32)
    embeds, mask, pos = _text_inputs(tc)
    out_sep, _ = qwen25_vl.text_forward(params, tc, embeds, mask, pos, attn_impl="xla")

    fused = dict(params)
    fused["layers"] = fuse_decoder_projections(params["layers"])
    assert "q_proj" not in fused["layers"] and "qkv_proj" in fused["layers"]
    assert "gate_proj" not in fused["layers"] and "gate_up_proj" in fused["layers"]
    out_fused, _ = qwen25_vl.text_forward(fused, tc, embeds, mask, pos, attn_impl="xla")
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_sep), atol=1e-5
    )


def test_fused_layout_pallas_odd_seq():
    """Odd S exercises the fused path's internal end-padding (llava's 2976
    pads to a 256 multiple; here 10 -> 256 in interpret mode)."""
    tc = qwen_tiny_config().text
    params = qwen25_vl.init_text_params(jax.random.PRNGKey(0), tc, jnp.float32)
    fused = dict(params)
    fused["layers"] = fuse_decoder_projections(params["layers"])
    embeds, mask, pos = _text_inputs(tc, S=10)
    out_x, _ = qwen25_vl.text_forward(fused, tc, embeds, mask, pos, attn_impl="xla")
    out_p, _ = qwen25_vl.text_forward(fused, tc, embeds, mask, pos, attn_impl="pallas")
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_x), atol=5e-4
    )


def test_fused_layout_w8a8_quantize_then_fuse_close():
    tc = qwen_tiny_config().text
    params = qwen25_vl.init_text_params(jax.random.PRNGKey(3), tc, jnp.float32)
    embeds, mask, pos = _text_inputs(tc, seed=3)
    out_fp, _ = qwen25_vl.text_forward(params, tc, embeds, mask, pos, attn_impl="xla")

    qlayers = quantize_stacked_layers(
        jax.device_get(params["layers"]), scheme="w8a8", min_size=0
    )
    fused_layers = fuse_decoder_projections(qlayers)
    assert is_w8a8(fused_layers["qkv_proj"]["kernel"])
    qparams = {**params, "layers": jax.tree_util.tree_map(jnp.asarray, fused_layers)}
    out_q, _ = qwen25_vl.text_forward(qparams, tc, embeds, mask, pos, attn_impl="xla")
    rel = np.abs(np.asarray(out_q) - np.asarray(out_fp)) / (
        np.abs(np.asarray(out_fp)) + 1e-3
    )
    assert np.median(rel) < 0.05


def test_int4_runs_as_w8a8_and_stays_close(monkeypatch):
    """Packed int4 leaves run on the int8 path by default (LRT_I4_W8A8):
    weight values are exactly preserved, only the dynamic activation
    quantization differs from the bf16-dequant path."""
    rng = np.random.default_rng(0)
    # per-layer 2D slice (inside the scan body the leading L dim is gone)
    w = rng.standard_normal((64, 32)).astype(np.float32) * 0.1
    qd = {k: jnp.asarray(v) for k, v in quantize_array(w, bits=4).items()}

    monkeypatch.setenv("LRT_I4_W8A8", "1")
    lp8 = dequant_layer({"proj": {"kernel": qd}})
    assert is_w8a8(lp8["proj"]["kernel"])
    # codes x scale == the int4-dequantized weights exactly
    codes = lp8["proj"]["kernel"]["qvalues_w8a8"]
    assert int(np.max(np.abs(np.asarray(codes)))) <= 7
    w_from_codes = np.asarray(codes, np.float32) * np.asarray(qd["scale"])

    monkeypatch.setenv("LRT_I4_W8A8", "0")
    lp_bf = dequant_layer({"proj": {"kernel": qd}}, jnp.float32)
    np.testing.assert_allclose(w_from_codes, np.asarray(lp_bf["proj"]["kernel"]),
                               atol=1e-6)

    # end-to-end through qmatmul: activation quantization error only
    from llava_reward_tpu.utils.quantize import qmatmul

    x = jnp.asarray(rng.standard_normal((8, 64)).astype(np.float32))
    y8 = qmatmul(x, lp8["proj"]["kernel"])
    ybf = x @ lp_bf["proj"]["kernel"]
    rel = np.abs(np.asarray(y8)[0] - np.asarray(ybf)[0]) / (
        np.abs(np.asarray(ybf)[0]) + 1e-2
    )
    assert np.median(rel) < 0.05


def test_llava_reward_forward_fused_int4():
    """LLaVA decoder with the bench's mixed scheme: W8A8 MLP + packed-int4
    attention projections (run as W8A8), fused layout, through the full
    reward forward (reference path: batch_inference_rm_llava.py scoring)."""
    from llava_reward_tpu.models import llava_next
    from llava_reward_tpu.reward import init_head_params
    from llava_reward_tpu.reward.model import RewardBatch, reward_forward
    from llava_reward_tpu.core.config import RewardConfig

    cfg = llava_tiny_config(num_layers=2, vision_layers=2)
    tc = cfg.text
    rcfg = RewardConfig(is_general_preference=True, value_head_dim=2,
                        layer_id=tc.num_layers)
    params = {
        "backbone": jax.device_get(
            llava_next.init_params(jax.random.PRNGKey(0), cfg)
        ),
        "head": jax.device_get(
            init_head_params(jax.random.PRNGKey(1), cfg, rcfg)
        ),
    }
    rng = np.random.default_rng(0)
    B, S = 2, 16
    batch = RewardBatch(
        input_ids=jnp.asarray(rng.integers(2, 100, (B, S)).astype(np.int32)),
        attention_mask=jnp.asarray(np.ones((B, S), np.int32)),
        pixel_values=None, img_gather_idx=None, splice_idx=None,
        num_img_tokens=None,
    )
    r_fp = reward_forward(params, cfg, rcfg, batch, training=False,
                          attn_impl="xla").reward

    lay = params["backbone"]["text"]["layers"]
    lay = quantize_stacked_layers(lay, scheme="w8a8", min_size=0,
                                  only=("gate_proj", "up_proj", "down_proj"))
    lay = quantize_stacked_layers(lay, bits=4, min_size=0,
                                  only=("q_proj", "k_proj", "v_proj", "o_proj"))
    qparams = dict(params)
    qparams["backbone"] = dict(params["backbone"])
    qparams["backbone"]["text"] = dict(params["backbone"]["text"])
    qparams["backbone"]["text"]["layers"] = jax.tree_util.tree_map(
        jnp.asarray, fuse_decoder_projections(lay)
    )
    r_q = reward_forward(qparams, cfg, rcfg, batch, training=False,
                         attn_impl="xla").reward
    assert np.all(np.isfinite(np.asarray(r_q)))
    np.testing.assert_allclose(np.asarray(r_q), np.asarray(r_fp), atol=0.15)
