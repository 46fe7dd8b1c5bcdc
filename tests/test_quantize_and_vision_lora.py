"""Weight-only quantization + vision-tower LoRA."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llava_reward_tpu.core.config import RewardConfig, phi3v_tiny_config
from llava_reward_tpu.models import clip_vit, phi3, phi3v
from llava_reward_tpu.utils.quantize import (
    dequantize_array,
    quantize_array,
    quantize_stacked_layers,
)


def test_quantize_roundtrip_int8(rng):
    w = rng.standard_normal((2, 64, 32)).astype(np.float32)
    qd = quantize_array(jnp.asarray(w), bits=8)
    back = np.asarray(dequantize_array(qd, jnp.float32))
    # per-channel absmax int8: error <= absmax/127/2 per element
    absmax = np.abs(w).max(axis=-2, keepdims=True)
    assert np.all(np.abs(back - w) <= absmax / 127.0 * 0.51 + 1e-7)


def test_quantize_roundtrip_int4(rng):
    w = rng.standard_normal((2, 64, 32)).astype(np.float32)
    qd = quantize_array(jnp.asarray(w), bits=4)
    assert qd["qvalues_i4"].shape == (2, 32, 32)  # packed
    back = np.asarray(dequantize_array(qd, jnp.float32))
    absmax = np.abs(w).max(axis=-2, keepdims=True)
    assert back.shape == w.shape
    assert np.all(np.abs(back - w) <= absmax / 7.0 * 0.51 + 1e-6)


def test_quantized_decoder_forward_close(rng):
    cfg = phi3v_tiny_config(num_layers=2, hidden_size=64).decoder
    params = jax.device_get(phi3.init_params(jax.random.PRNGKey(0), cfg))
    qlayers = quantize_stacked_layers(
        jax.tree_util.tree_map(jnp.asarray, params["layers"]), bits=8, min_size=0
    )
    B, S = 2, 10
    ids = rng.integers(0, cfg.vocab_size, (B, S)).astype(np.int32)
    mask = np.ones((B, S), np.int32)
    pos = np.arange(S, dtype=np.int32)[None].repeat(B, 0)
    embeds = params["embed_tokens"][ids]

    out_fp = phi3.forward(
        {**params, "layers": jax.tree_util.tree_map(jnp.asarray, params["layers"])},
        cfg, jnp.asarray(embeds), jnp.asarray(mask), jnp.asarray(pos), attn_impl="xla",
    ).last_hidden_state
    out_q = phi3.forward(
        {**params, "layers": qlayers},
        cfg, jnp.asarray(embeds), jnp.asarray(mask), jnp.asarray(pos), attn_impl="xla",
    ).last_hidden_state
    # int8 weight-only: small relative error
    rel = np.abs(np.asarray(out_q) - np.asarray(out_fp)) / (
        np.abs(np.asarray(out_fp)) + 1e-3
    )
    assert np.median(rel) < 0.05


def test_vision_lora_changes_output(rng):
    from llava_reward_tpu.lora.lora import init_vision_lora

    cfg = phi3v_tiny_config(vision_layers=2)
    params = phi3v.init_params(jax.random.PRNGKey(0), cfg)
    vlora = init_vision_lora(jax.random.PRNGKey(1), cfg.vision, rank=2, alpha=4)
    # nonzero B so the delta is visible
    vlora = jax.tree_util.tree_map(
        lambda x: x + 0.05 if x.ndim == 3 else x, vlora
    )
    pix = jnp.asarray(
        rng.standard_normal((1, cfg.vision.image_size, cfg.vision.image_size, 3)).astype(
            np.float32
        )
    )
    base = clip_vit.extract_patch_features(
        params["vision"]["clip"], cfg.vision, pix, attn_impl="xla"
    )
    with_lora = clip_vit.extract_patch_features(
        params["vision"]["clip"], cfg.vision, pix, attn_impl="xla", lora=vlora
    )
    assert not np.allclose(np.asarray(base), np.asarray(with_lora))
    # zero-B lora is exactly the identity
    vlora0 = init_vision_lora(jax.random.PRNGKey(1), cfg.vision, rank=2, alpha=4)
    same = clip_vit.extract_patch_features(
        params["vision"]["clip"], cfg.vision, pix, attn_impl="xla", lora=vlora0
    )
    np.testing.assert_allclose(np.asarray(base), np.asarray(same), rtol=1e-5, atol=1e-6)


def test_vision_lora_trains(rng):
    from llava_reward_tpu.lora.lora import init_vision_lora
    from llava_reward_tpu.preprocess.collate import collate_samples, to_reward_batch
    from llava_reward_tpu.preprocess.phi3v_processor import Phi3VProcessor
    from llava_reward_tpu.reward import init_head_params
    from llava_reward_tpu.train.optim import make_optimizer
    from llava_reward_tpu.train.train_step import (
        init_train_state,
        make_pairwise_loss_fn,
        make_train_step,
    )

    cfg = phi3v_tiny_config(num_crops=4, num_layers=2, vision_layers=2)
    rcfg = RewardConfig(is_general_preference=False)
    rcfg.layer_id = cfg.decoder.num_layers
    frozen = {"backbone": phi3v.init_params(jax.random.PRNGKey(0), cfg)}
    trainable = {
        "head": init_head_params(jax.random.PRNGKey(1), cfg, rcfg),
        "lora": None,
        "projector": None,
        "vision_lora": init_vision_lora(jax.random.PRNGKey(2), cfg.vision, 2, 4),
    }

    class Tok:
        def __call__(self, text):
            return {"input_ids": [hash(t) % 400 + 2 for t in text.split()]}

    proc = Phi3VProcessor(Tok(), num_crops=4)
    from PIL import Image

    img = Image.fromarray((rng.random((80, 100, 3)) * 255).astype(np.uint8))
    s1 = proc("<|image_1|> nice", [img])
    s2 = proc("<|image_1|> bad", [img])
    cb = to_reward_batch(collate_samples([s1], 700, 0))
    rb = to_reward_batch(collate_samples([s2], 700, 0))

    tx = make_optimizer(1e-2, 5, warmup_ratio=0.0)
    loss_fn = make_pairwise_loss_fn(cfg, rcfg, attn_impl="xla", remat=False)
    step = jax.jit(make_train_step(loss_fn, tx))
    st = init_train_state(trainable, tx)
    st, m = step(st, frozen, cb, rb)
    # vision lora B received nonzero grads (A @ dB path)
    b_after = np.asarray(st.trainable["vision_lora"]["q"]["b"])
    assert np.abs(b_after).sum() > 0


def test_nf4_roundtrip_matches_reference_grid(rng):
    """NF4 (bnb NormalFloat4): per-64-block absmax + nearest of the 16
    normal-quantile levels (rw_model_general_preference.py:166-175)."""
    from llava_reward_tpu.utils.quantize import (
        NF4_GRID,
        dequantize_array_nf4,
        quantize_array_nf4,
    )

    w = rng.standard_normal((2, 128, 32)).astype(np.float32) * 0.02
    qd = quantize_array_nf4(jnp.asarray(w))
    assert qd["qvalues_nf4"].shape == (2, 64, 32)  # packed 2/byte
    assert qd["scale"].shape == (2, 2, 32)  # 128/64 blocks
    back = np.asarray(dequantize_array_nf4(qd, jnp.float32))

    # independent numpy reimplementation of bnb semantics
    wb = w.reshape(2, 2, 64, 32)
    absmax = np.abs(wb).max(axis=-2, keepdims=True)
    norm = wb / np.where(absmax > 0, absmax, 1.0)
    codes = np.abs(norm[..., None] - NF4_GRID[None]).argmin(axis=-1)
    expect = (NF4_GRID[codes] * absmax).reshape(w.shape)
    np.testing.assert_allclose(back, expect, rtol=0, atol=1e-7)

    # grid values round-trip exactly
    exact = np.tile(NF4_GRID[None, :, None], (1, 4, 8)).reshape(1, 64, 8)
    qd2 = quantize_array_nf4(jnp.asarray(exact))
    back2 = np.asarray(dequantize_array_nf4(qd2, jnp.float32))
    np.testing.assert_allclose(back2, exact, atol=1e-7)


def test_nf4_decoder_forward_close(rng):
    from llava_reward_tpu.utils.quantize import quantize_stacked_layers

    cfg = phi3v_tiny_config(num_layers=2, hidden_size=64).decoder
    params = jax.device_get(phi3.init_params(jax.random.PRNGKey(0), cfg))
    qlayers = quantize_stacked_layers(
        jax.tree_util.tree_map(jnp.asarray, params["layers"]),
        scheme="nf4", min_size=0,
    )
    B, S = 2, 10
    ids = rng.integers(0, cfg.vocab_size, (B, S)).astype(np.int32)
    mask = np.ones((B, S), np.int32)
    pos = np.arange(S, dtype=np.int32)[None].repeat(B, 0)
    embeds = params["embed_tokens"][ids]
    h = phi3.forward(
        {**params, "layers": jax.tree_util.tree_map(jnp.asarray, params["layers"])},
        cfg, jnp.asarray(embeds), jnp.asarray(mask), jnp.asarray(pos), attn_impl="xla",
    ).last_hidden_state
    hq = phi3.forward(
        {**params, "layers": qlayers},
        cfg, jnp.asarray(embeds), jnp.asarray(mask), jnp.asarray(pos), attn_impl="xla",
    ).last_hidden_state
    rel = float(jnp.linalg.norm(hq - h) / jnp.linalg.norm(h))
    assert rel < 0.15, rel  # 4-bit: close but not exact


def test_vision_lora_on_fused_clip_path(rng):
    """The fused qkv CLIP layer adds LoRA deltas onto the projection's
    column groups — must equal the per-projection xla path."""
    from llava_reward_tpu.lora.lora import init_vision_lora
    from llava_reward_tpu.models import clip_vit as cv

    cfg = phi3v_tiny_config(vision_layers=2, vision_hidden=256).vision
    params = jax.device_get(cv.init_params(jax.random.PRNGKey(0), cfg))
    lora = init_vision_lora(jax.random.PRNGKey(5), cfg, 4, 8)
    # nonzero B so deltas actually contribute
    lora = jax.tree_util.tree_map(
        lambda x: x + 0.01 if x.ndim >= 2 else x, lora
    )
    x = jnp.asarray(rng.standard_normal((1, cfg.image_size, cfg.image_size, 3)) * 0.5,
                    jnp.float32)
    a = cv.extract_patch_features(params, cfg, x, attn_impl="xla", lora=lora)

    S = a.shape[1] + 1
    h = cv.embed_patches(params, cfg, x)
    h = cv.layer_norm(h, params["pre_layernorm"]["weight"],
                      params["pre_layernorm"]["bias"], cfg.layer_norm_eps)
    S_pad = (S + 63) // 64 * 64
    h = jnp.pad(h, [(0, 0), (0, S_pad - S), (0, 0)])
    n_act = cfg.num_active_layers
    layers = jax.tree_util.tree_map(lambda t: t[:n_act], params["layers"])
    lora_act = jax.tree_util.tree_map(lambda t: t[:n_act], lora)

    def scan_fn(carry, xs):
        lp, ll = xs
        return cv._encoder_layer(carry, lp, cfg, "fused", ll, S), None

    hf, _ = jax.lax.scan(scan_fn, h, (layers, lora_act))
    b = hf[:, 1:S, :]
    assert float(jnp.abs(a - b).max()) < 1e-4


def test_vision_lora_grad_stays_on_differentiable_path(monkeypatch):
    """r2 advisor (high): on TPU, extract_patch_features switched to the
    raw-pallas direct kernel (no custom_vjp) even with trainable vision
    LoRA, crashing --train_vision at trace time. The fused switch must be
    inference-only (lora is None)."""
    import jax
    import jax.numpy as jnp

    from llava_reward_tpu.core.config import VisionConfig
    from llava_reward_tpu.lora.lora import init_vision_lora
    from llava_reward_tpu.models import clip_vit

    # geometry that WOULD take the fused path: S % 64 != 0 and a valid
    # direct group (num_heads * head_dim group hits a 128 column multiple)
    cfg = VisionConfig(
        hidden_size=128, intermediate_size=256, num_layers=2, num_heads=4,
        image_size=70, patch_size=14,
    )
    monkeypatch.setattr(clip_vit, "_on_tpu", lambda: True)
    key = jax.random.PRNGKey(0)
    params = clip_vit.init_params(key, cfg)
    lora = init_vision_lora(jax.random.PRNGKey(1), cfg, rank=4, alpha=8.0)
    pix = jax.random.normal(jax.random.PRNGKey(2), (1, 70, 70, 3))

    def loss(lo):
        return clip_vit.extract_patch_features(
            params, cfg, pix, attn_impl="auto", lora=lo
        ).sum()

    # with trainable LoRA the differentiable mha path must be used -> grad works
    g = jax.grad(loss)(lora)
    assert jnp.isfinite(g["q"]["a"]).all()


def test_int8_linear_matches_dequant_matmul(rng):
    from llava_reward_tpu.utils.quantize import int8_linear, quantize_array_w8a8

    x = rng.standard_normal((4, 7, 96)).astype(np.float32)
    w = (rng.standard_normal((96, 128)) * 0.05).astype(np.float32)
    qd = {k: jnp.asarray(v) for k, v in quantize_array_w8a8(w).items()}
    y = np.asarray(int8_linear(jnp.asarray(x), qd))
    # reference: dequantized weight matmul with the SAME activation quant
    wd = np.asarray(qd["qvalues_w8a8"], np.float32) * np.asarray(qd["scale"])
    amax = np.abs(x.reshape(-1, 96)).max(axis=-1, keepdims=True)
    xq = np.round(x.reshape(-1, 96) / amax * 127.0)
    ref = ((xq @ wd) * amax / 127.0).reshape(4, 7, 128)
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-5)
    # and close to the unquantized matmul (W8A8 end-to-end error)
    full = x @ w
    assert np.abs(y - full).max() / (np.abs(full).max() + 1e-9) < 0.02


def test_w8a8_decoder_forward_close():
    rng = np.random.default_rng(7)
    from llava_reward_tpu.utils.quantize import quantize_stacked_layers

    cfg = phi3v_tiny_config(num_layers=2, hidden_size=64).decoder
    params = jax.device_get(phi3.init_params(jax.random.PRNGKey(0), cfg))
    qlayers = quantize_stacked_layers(
        jax.tree_util.tree_map(jnp.asarray, params["layers"]),
        min_size=0, scheme="w8a8",
    )
    assert any(
        "qvalues_w8a8" in v for v in qlayers.values() if isinstance(v, dict)
    )
    B, S = 2, 10
    ids = rng.integers(0, cfg.vocab_size, (B, S)).astype(np.int32)
    mask = np.ones((B, S), np.int32)
    pos = np.arange(S, dtype=np.int32)[None].repeat(B, 0)
    embeds = params["embed_tokens"][ids]

    out_fp = phi3.forward(
        {**params, "layers": jax.tree_util.tree_map(jnp.asarray, params["layers"])},
        cfg, jnp.asarray(embeds), jnp.asarray(mask), jnp.asarray(pos), attn_impl="xla",
    ).last_hidden_state
    out_q = phi3.forward(
        {**params, "layers": qlayers},
        cfg, jnp.asarray(embeds), jnp.asarray(mask), jnp.asarray(pos), attn_impl="xla",
    ).last_hidden_state
    rel = np.abs(np.asarray(out_q) - np.asarray(out_fp)) / (
        np.abs(np.asarray(out_fp)) + 1e-3
    )
    assert np.median(rel) < 0.05, np.median(rel)


def test_w8a8_clip_tower_close():
    rng = np.random.default_rng(11)
    from llava_reward_tpu.core.config import VisionConfig
    from llava_reward_tpu.utils.quantize import quantize_stacked_layers

    cfg = VisionConfig(
        hidden_size=64, intermediate_size=128, num_layers=2, num_heads=4,
        image_size=56, patch_size=14,
    )
    params = clip_vit.init_params(jax.random.PRNGKey(0), cfg)
    qparams = dict(params)
    qparams["layers"] = quantize_stacked_layers(
        params["layers"], min_size=0, scheme="w8a8"
    )
    pix = jax.random.normal(jax.random.PRNGKey(1), (2, 56, 56, 3))
    f_fp = np.asarray(clip_vit.extract_patch_features(params, cfg, pix, attn_impl="xla"))
    f_q = np.asarray(clip_vit.extract_patch_features(qparams, cfg, pix, attn_impl="xla"))
    rel = np.abs(f_q - f_fp) / (np.abs(f_fp) + 1e-3)
    assert rel.mean() < 0.05, rel.mean()


def test_w8a8_adaptor_roundtrip(tmp_path, rng):
    """--load_in_8bit through load_reward_adaptor: quantized load scores
    close to the f32 load on the same synthesized checkpoint (the decoder
    carries w8a8 leaves; the CLIP tower stays bf16 per the tower-level
    measurement)."""
    import json
    import os

    import torch

    from llava_reward_tpu.evalx.adaptor import load_reward_adaptor
    from llava_reward_tpu.io.artifact import save_reward_artifact
    from llava_reward_tpu.io.hf_phi3v import hf_state_dict_from_params
    from llava_reward_tpu.io.torch_io import save_torch_state_dict
    from llava_reward_tpu.reward import init_head_params
    from llava_reward_tpu.reward.model import RewardBatch
    from llava_reward_tpu.utils.quantize import is_w8a8

    cfg = phi3v_tiny_config(num_layers=2, vision_layers=2)
    params = jax.device_get(phi3v.init_params(jax.random.PRNGKey(0), cfg))
    base_dir = tmp_path / "base"
    os.makedirs(base_dir)
    save_torch_state_dict(
        hf_state_dict_from_params(params, cfg),
        str(base_dir / "pytorch_model.bin"), torch.float32,
    )
    with open(base_dir / "config.json", "w") as f:
        json.dump({
            "vocab_size": cfg.decoder.vocab_size,
            "hidden_size": cfg.decoder.hidden_size,
            "intermediate_size": cfg.decoder.intermediate_size,
            "num_hidden_layers": cfg.decoder.num_layers,
            "num_attention_heads": cfg.decoder.num_heads,
            "num_key_value_heads": cfg.decoder.num_kv_heads,
            "pad_token_id": cfg.decoder.pad_token_id,
        }, f)
    rcfg = RewardConfig(is_general_preference=True, value_head_dim=2)
    head = jax.device_get(init_head_params(jax.random.PRNGKey(1), cfg, rcfg))
    pm_dir = tmp_path / "pm"
    save_reward_artifact(str(pm_dir), rcfg, head, torch_dtype=torch.float32)

    def score(adaptor):
        adaptor = type(adaptor)(
            cfg=cfg, rcfg=adaptor.rcfg, params=adaptor.params, model_type="phi3v"
        )
        adaptor.rcfg.layer_id = cfg.decoder.num_layers
        B, S = 2, 12
        batch = RewardBatch(
            input_ids=jnp.asarray(rng.integers(2, 100, (B, S)).astype(np.int32)),
            attention_mask=jnp.asarray(np.ones((B, S), np.int32)),
            pixel_values=None, img_gather_idx=None, splice_idx=None,
            num_img_tokens=None,
        )
        return np.asarray(adaptor.make_score_fn(attn_impl="xla")(adaptor.params, batch))

    a_fp = load_reward_adaptor(str(base_dir), str(pm_dir), compute_dtype=jnp.float32)
    rng_state = rng.bit_generator.state
    r_fp = score(a_fp)
    a_q = load_reward_adaptor(
        str(base_dir), str(pm_dir), compute_dtype=jnp.float32, quantize="w8a8",
        quantize_min_size=0,
    )
    # decoder layers carry w8a8 leaves; the CLIP tower stays ALL bf16 —
    # tower-level chained timing showed the per-matmul qkv/fc1 wins do not
    # transfer in-model (PERF.md int8 ledger, tower-level truth)
    assert is_w8a8(a_q.params["backbone"]["decoder"]["layers"]["qkv_proj"])
    clip_layers = a_q.params["backbone"]["vision"]["clip"]["layers"]
    assert not is_w8a8(clip_layers["mlp"]["fc1"]["kernel"])
    assert not is_w8a8(clip_layers["attn"]["q"]["kernel"])
    assert not is_w8a8(clip_layers["mlp"]["fc2"]["kernel"])
    assert not is_w8a8(clip_layers["attn"]["out"]["kernel"])
    rng.bit_generator.state = rng_state  # same random batch
    r_q = score(a_q)
    assert np.all(np.isfinite(r_q))
    np.testing.assert_allclose(r_q, r_fp, rtol=0.1, atol=0.05)


def test_int8_linear_grad_matches_dequant_matmul(rng):
    """custom_vjp: dx must equal the straight-through dequantized-matmul
    gradient (dy @ (W*scale)^T) — round() would otherwise zero it."""
    from llava_reward_tpu.utils.quantize import int8_linear, quantize_array_w8a8

    x = jnp.asarray(rng.standard_normal((3, 5, 64)).astype(np.float32))
    w = (rng.standard_normal((64, 48)) * 0.05).astype(np.float32)
    qd = {k: jnp.asarray(v) for k, v in quantize_array_w8a8(w).items()}
    co = jnp.asarray(rng.standard_normal((3, 5, 48)).astype(np.float32))

    g = jax.grad(lambda xx: (int8_linear(xx, qd) * co).sum())(x)
    wd = np.asarray(qd["qvalues_w8a8"], np.float32) * np.asarray(qd["scale"])
    ref = np.asarray(co) @ (
        np.asarray(wd, np.float32).astype(jnp.bfloat16).astype(np.float32)
    ).T
    np.testing.assert_allclose(np.asarray(g), ref, rtol=3e-2, atol=3e-2)
    assert np.abs(np.asarray(g)).max() > 0  # not silently zero


def test_w8a8_lora_train_step_produces_grads():
    """QLoRA-over-int8: a LoRA train step on a w8a8 frozen decoder must give
    finite loss and NONZERO adapter grads in every layer (the residual-stream
    cotangent flows through int8_linear's custom_vjp)."""
    from llava_reward_tpu.core.config import RewardConfig, phi3v_tiny_config
    from llava_reward_tpu.lora.lora import init_lora
    from llava_reward_tpu.reward import init_head_params
    from llava_reward_tpu.reward.model import RewardBatch
    from llava_reward_tpu.train.train_step import make_pairwise_loss_fn

    rng = np.random.default_rng(3)
    cfg = phi3v_tiny_config(num_layers=3, num_crops=4)
    rcfg = RewardConfig(is_general_preference=True, value_head_dim=2,
                        layer_id=cfg.decoder.num_layers)
    backbone = phi3v.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    backbone = dict(backbone)
    backbone["decoder"] = dict(backbone["decoder"])
    backbone["decoder"]["layers"] = quantize_stacked_layers(
        backbone["decoder"]["layers"], min_size=0, scheme="w8a8"
    )
    frozen = {"backbone": backbone}
    trainable = {
        "head": init_head_params(jax.random.PRNGKey(1), cfg, rcfg, dtype=jnp.float32),
        "lora": init_lora(jax.random.PRNGKey(2), cfg.decoder, 4, 8),
        "projector": None,
    }

    B, S = 2, 24
    def mk(seed):
        r = np.random.default_rng(seed)
        return RewardBatch(
            input_ids=jnp.asarray(r.integers(2, cfg.decoder.vocab_size - 1, (B, S)).astype(np.int32)),
            attention_mask=jnp.asarray(np.ones((B, S), np.int32)),
            pixel_values=None, img_gather_idx=None,
            splice_idx=None, num_img_tokens=None,
        )

    loss_fn = make_pairwise_loss_fn(cfg, rcfg, attn_impl="xla", remat=True)
    (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        trainable, frozen, mk(0), mk(1)
    )
    assert np.isfinite(float(loss))
    # B is zero-initialised (dA = 0 at init), so the flow check is on B
    gb = np.asarray(grads["lora"]["qkv_proj"]["b"])  # (L, ...)
    per_layer = np.abs(gb).reshape(gb.shape[0], -1).max(axis=1)
    assert (per_layer > 0).all(), per_layer
