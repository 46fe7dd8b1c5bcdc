"""Qwen2.5-VL reward path: processor -> collate -> reward_forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llava_reward_tpu.core.config import RewardConfig, qwen_tiny_config
from llava_reward_tpu.models import qwen25_vl
from llava_reward_tpu.preprocess.collate import collate_qwen_samples, to_reward_batch
from llava_reward_tpu.preprocess.qwen_vision import Qwen25VLProcessor
from llava_reward_tpu.reward import init_head_params, paired_forward, reward_forward


class FakeQwenTokenizer:
    def __init__(self, image_token_id):
        self.image_token_id = image_token_id

    def __call__(self, text):
        ids = []
        for t in text.split():
            if t == "<img>":
                ids.append(self.image_token_id)
            else:
                ids.append(hash(t) % 400 + 2)
        return {"input_ids": ids}


def _setup(rcfg):
    cfg = qwen_tiny_config(num_layers=2, vision_depth=2)
    rcfg.layer_id = cfg.text.num_layers
    params = {
        "backbone": qwen25_vl.init_params(jax.random.PRNGKey(0), cfg),
        "head": init_head_params(jax.random.PRNGKey(1), cfg, rcfg),
    }
    tok = FakeQwenTokenizer(cfg.text.image_token_id)
    proc = Qwen25VLProcessor(
        tok, min_pixels=cfg.min_pixels, max_pixels=cfg.max_pixels,
        image_token_id=cfg.text.image_token_id,
    )
    return cfg, params, proc


def _img(seed, h=90, w=120):
    from PIL import Image

    rng = np.random.default_rng(seed)
    return Image.fromarray((rng.random((h, w, 3)) * 255).astype(np.uint8))


def _batch(cfg, proc, texts_imgs, seq_len=80):
    samples = [proc(t, [i]) for t, i in texts_imgs]
    return to_reward_batch(
        collate_qwen_samples(
            samples, seq_len, cfg.text.pad_token_id,
            patch_budget=512, unit_budget=128,
        )
    )


def test_qwen_reward_forward():
    rcfg = RewardConfig(is_general_preference=True, value_head_dim=2)
    cfg, params, proc = _setup(rcfg)
    rb = _batch(cfg, proc, [("<img> a scenic photo", _img(0)),
                            ("<img> a blurry mess", _img(1, 64, 200))])
    out = reward_forward(params, cfg, rcfg, rb, training=False, attn_impl="xla")
    assert out.reward.shape == (2, 2)
    assert np.all(np.isfinite(np.asarray(out.reward)))


def test_qwen_skipca_and_pairing():
    rcfg = RewardConfig(
        is_general_preference=True, value_head_dim=2, add_cross_attention=True
    )
    cfg, params, proc = _setup(rcfg)
    cb = _batch(cfg, proc, [("<img> good", _img(2))])
    rb = _batch(cfg, proc, [("<img> bad", _img(3))])
    c, r, _, _ = paired_forward(params, cfg, rcfg, cb, rb, training=False, attn_impl="xla")
    c1 = reward_forward(params, cfg, rcfg, cb, training=False, attn_impl="xla").reward
    np.testing.assert_allclose(np.asarray(c), np.asarray(c1), rtol=1e-4, atol=1e-5)


def test_qwen_train_eval_readout_agree():
    rcfg = RewardConfig(is_general_preference=False)
    cfg, params, proc = _setup(rcfg)
    rb = _batch(cfg, proc, [("<img> hello world", _img(4))])
    t = reward_forward(params, cfg, rcfg, rb, training=True, attn_impl="xla").reward
    e = reward_forward(params, cfg, rcfg, rb, training=False, attn_impl="xla").reward
    np.testing.assert_allclose(np.asarray(t), np.asarray(e), rtol=1e-5, atol=1e-6)


def test_qwen_train_step():
    from llava_reward_tpu.train.optim import make_optimizer
    from llava_reward_tpu.train.train_step import (
        init_train_state,
        make_pairwise_loss_fn,
        make_train_step,
    )

    rcfg = RewardConfig(is_general_preference=True, value_head_dim=2)
    cfg, params, proc = _setup(rcfg)
    frozen = {"backbone": params["backbone"]}
    trainable = {"head": params["head"], "lora": None, "projector": None}
    tx = make_optimizer(1e-3, 10)
    loss_fn = make_pairwise_loss_fn(cfg, rcfg, attn_impl="xla", remat=False)
    step = jax.jit(make_train_step(loss_fn, tx))
    state = init_train_state(trainable, tx)
    cb = _batch(cfg, proc, [("<img> nice", _img(5))])
    rb = _batch(cfg, proc, [("<img> ugly", _img(6))])
    state, m = step(state, frozen, cb, rb)
    assert np.isfinite(float(m["preference_loss"]))


def test_qwen_u8_device_preproc_matches_f32(rng):
    """uint8 patch banks + on-device normalisation (vision_forward) vs the
    host-normalised f32 path — identical vision tokens."""
    from llava_reward_tpu.core.config import qwen_tiny_config
    from llava_reward_tpu.io.hf_qwen import params_from_hf_state_dict
    from llava_reward_tpu.models import qwen25_vl
    from llava_reward_tpu.preprocess.qwen_vision import Qwen25VLProcessor
    from test_qwen_parity import _hf_model

    cfg = qwen_tiny_config(vision_depth=2, vision_hidden=32)
    hf = _hf_model(cfg)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = params_from_hf_state_dict(sd, cfg)

    class Tok:
        def __call__(self, text):
            return {"input_ids": [
                cfg.text.image_token_id if t == "<|image_pad|>" else hash(t) % 90 + 3
                for t in text.split()
            ]}

    from PIL import Image

    img = Image.fromarray((rng.random((60, 88, 3)) * 255).astype(np.uint8))
    kw = dict(min_pixels=4 * 28 * 28, max_pixels=256 * 28 * 28,
              window_size=cfg.vision.window_size,
              image_token_id=cfg.text.image_token_id)
    s_f32 = Qwen25VLProcessor(Tok(), device_preproc=False, **kw)(
        "a <|image_pad|> b", [img])
    s_u8 = Qwen25VLProcessor(Tok(), device_preproc=True, **kw)(
        "a <|image_pad|> b", [img])
    assert s_u8.patches.dtype == np.uint8 and s_f32.patches.dtype == np.float32

    def run(s):
        return np.asarray(qwen25_vl.vision_forward(
            params["visual"], cfg.vision,
            jnp.asarray(s.patches[None]), jnp.asarray(s.patch_valid[None]),
            jnp.asarray(s.rot_pos[None]), jnp.asarray(s.unit_gather[None]),
            jnp.asarray(np.asarray([s.num_img_tokens], np.int32)),
            attn_impl="xla",
        ))

    np.testing.assert_allclose(run(s_u8), run(s_f32), atol=2e-5, rtol=1e-5)


def test_qwen_mixed_u8_f32_batch_unifies(rng):
    """A u8 image sample collated with an f32 sample (the video scenario:
    device-preproc images ship uint8 patches, video frames stay f32) must be
    normalised on host to one f32 batch — not silently cast (r2 advisor)."""
    rcfg = RewardConfig(is_general_preference=True, value_head_dim=2)
    cfg, params, proc_f32 = _setup(rcfg)
    tok = FakeQwenTokenizer(cfg.text.image_token_id)
    proc_u8 = Qwen25VLProcessor(
        tok, min_pixels=cfg.min_pixels, max_pixels=cfg.max_pixels,
        image_token_id=cfg.text.image_token_id, device_preproc=True,
    )
    s_u8 = proc_u8("<img> sharp photo", [_img(10)])
    s_f32 = proc_f32("<img> soft photo", [_img(11, 64, 200)])
    assert s_u8.patches.dtype == np.uint8 and s_f32.patches.dtype == np.float32

    mixed = collate_qwen_samples(
        [s_u8, s_f32], 80, cfg.text.pad_token_id,
        patch_budget=512, unit_budget=128,
    )
    assert mixed["pixel_values"].dtype == np.float32

    s_ref = proc_f32("<img> sharp photo", [_img(10)])
    pure = collate_qwen_samples(
        [s_ref, s_f32], 80, cfg.text.pad_token_id,
        patch_budget=512, unit_budget=128,
    )
    np.testing.assert_allclose(
        mixed["pixel_values"], pure["pixel_values"], atol=2e-5, rtol=1e-5
    )

    r_mixed = reward_forward(
        params, cfg, rcfg, to_reward_batch(mixed), training=False, attn_impl="xla"
    ).reward
    r_pure = reward_forward(
        params, cfg, rcfg, to_reward_batch(pure), training=False, attn_impl="xla"
    ).reward
    np.testing.assert_allclose(
        np.asarray(r_mixed), np.asarray(r_pure), rtol=1e-4, atol=1e-5
    )
