"""End-to-end reward forward on the tiny Phi3V: processor -> collate -> jit."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llava_reward_tpu.core.config import RewardConfig, phi3v_tiny_config
from llava_reward_tpu.models import phi3v
from llava_reward_tpu.preprocess.collate import collate_samples, to_reward_batch
from llava_reward_tpu.preprocess.phi3v_processor import Phi3VProcessor
from llava_reward_tpu.reward import (
    RewardBatch,
    init_head_params,
    paired_forward,
    reward_forward,
)
from llava_reward_tpu.reward.heads import eos_index_from_mask


class FakeTokenizer:
    eos_token = "</s>"
    pad_token_id = 0

    def __call__(self, text):
        return {"input_ids": [hash(t) % 400 + 2 for t in text.split()]}


def _tiny_setup(rcfg: RewardConfig, seq_len=260, num_crops=4):
    cfg = phi3v_tiny_config(num_crops=num_crops)
    key = jax.random.PRNGKey(0)
    params = {
        "backbone": phi3v.init_params(key, cfg),
        "head": init_head_params(jax.random.PRNGKey(1), cfg, rcfg),
    }
    # keep layer_id at the tiny model's depth
    rcfg.layer_id = cfg.decoder.num_layers
    proc = Phi3VProcessor(FakeTokenizer(), num_crops=num_crops)
    return cfg, params, proc, seq_len


def _img(seed, h=100, w=150):
    from PIL import Image

    rng = np.random.default_rng(seed)
    return Image.fromarray((rng.random((h, w, 3)) * 255).astype(np.uint8))


def _batch(proc, texts_imgs, seq_len):
    samples = [proc(t, [i]) for t, i in texts_imgs]
    return to_reward_batch(collate_samples(samples, seq_len, pad_token_id=0))


def test_bt_reward_forward_shapes():
    rcfg = RewardConfig(is_general_preference=False)
    cfg, params, proc, S = _tiny_setup(rcfg)
    rb = _batch(proc, [("<|image_1|> a cat", _img(0)), ("<|image_1|> a dog sitting", _img(1))], S)
    out = reward_forward(params, cfg, rcfg, rb, training=False, attn_impl="xla")
    assert out.reward.shape == (2, 1)
    assert np.all(np.isfinite(np.asarray(out.reward)))


def test_training_vs_eval_readout_agree_when_no_trailing_pad():
    """Left padding puts the EOS at position -1, so values[:, -1] (train) and
    the EOS gather (eval) must agree (rw_model:407-448)."""
    rcfg = RewardConfig(is_general_preference=True, value_head_dim=2)
    cfg, params, proc, S = _tiny_setup(rcfg)
    rb = _batch(proc, [("<|image_1|> hello", _img(2))], S)
    r_train = reward_forward(params, cfg, rcfg, rb, training=True, attn_impl="xla")
    r_eval = reward_forward(params, cfg, rcfg, rb, training=False, attn_impl="xla")
    np.testing.assert_allclose(
        np.asarray(r_train.reward), np.asarray(r_eval.reward), rtol=1e-5, atol=1e-6
    )


def test_eos_index():
    mask = jnp.asarray(np.array([[0, 0, 1, 1], [1, 1, 1, 0]], np.int32))
    idx = np.asarray(eos_index_from_mask(mask))
    # rightmost valid position: row0 -> 3; row1 -> argmax-of-flip semantics:
    # reference returns S-1-argmax(fliplr(mask)) which for trailing zeros
    # lands on the last 1
    assert idx[0] == 3
    assert idx[1] == 2


def test_skipca_changes_reward_and_is_finite():
    rcfg = RewardConfig(is_general_preference=True, value_head_dim=2, add_cross_attention=True)
    cfg, params, proc, S = _tiny_setup(rcfg)
    rb = _batch(proc, [("<|image_1|> scenic mountain", _img(3))], S)
    out_ca = reward_forward(params, cfg, rcfg, rb, training=False, attn_impl="xla")
    rcfg2 = RewardConfig(is_general_preference=True, value_head_dim=2)
    rcfg2.layer_id = rcfg.layer_id
    out_no = reward_forward(params, cfg, rcfg2, rb, training=False, attn_impl="xla")
    assert np.all(np.isfinite(np.asarray(out_ca.reward)))
    assert not np.allclose(np.asarray(out_ca.reward), np.asarray(out_no.reward))


def test_mean_hidden_state_pooling():
    rcfg = RewardConfig(is_general_preference=False, mean_hidden_state=True)
    cfg, params, proc, S = _tiny_setup(rcfg)
    rb = _batch(proc, [("<|image_1|> pooled", _img(4))], S)
    out = reward_forward(params, cfg, rcfg, rb, training=False, attn_impl="xla")
    assert out.reward.shape == (1, 1)


def test_paired_forward_matches_two_singles():
    rcfg = RewardConfig(is_general_preference=True, value_head_dim=2)
    cfg, params, proc, S = _tiny_setup(rcfg)
    cb = _batch(proc, [("<|image_1|> good image", _img(5))], S)
    rb_ = _batch(proc, [("<|image_1|> bad image", _img(6))], S)
    c_r, r_r, _, _ = paired_forward(params, cfg, rcfg, cb, rb_, training=False, attn_impl="xla")
    c_single = reward_forward(params, cfg, rcfg, cb, training=False, attn_impl="xla").reward
    r_single = reward_forward(params, cfg, rcfg, rb_, training=False, attn_impl="xla").reward
    np.testing.assert_allclose(np.asarray(c_r), np.asarray(c_single), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(r_r), np.asarray(r_single), rtol=1e-4, atol=1e-5)


def test_intermediate_layer_id_readout():
    rcfg = RewardConfig(is_general_preference=False)
    cfg, params, proc, S = _tiny_setup(rcfg)
    rcfg.layer_id = 1  # pre-final layer
    rb = _batch(proc, [("<|image_1|> layered", _img(7))], S)
    out_mid = reward_forward(params, cfg, rcfg, rb, training=False, attn_impl="xla")
    rcfg.layer_id = cfg.decoder.num_layers
    out_last = reward_forward(params, cfg, rcfg, rb, training=False, attn_impl="xla")
    assert not np.allclose(np.asarray(out_mid.reward), np.asarray(out_last.reward))


def test_jit_reward_forward():
    rcfg = RewardConfig(is_general_preference=True, value_head_dim=2)
    cfg, params, proc, S = _tiny_setup(rcfg)
    rb = _batch(proc, [("<|image_1|> jit me", _img(8))], S)

    @jax.jit
    def f(p, batch):
        return reward_forward(p, cfg, rcfg, batch, training=False, attn_impl="xla").reward

    r1 = f(params, rb)
    r2 = f(params, rb)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2))


def test_text_only_forward():
    """Vision branch optional — the reference crashes on text-only input
    (SURVEY.md §7 'quirks to not replicate')."""
    rcfg = RewardConfig(is_general_preference=False)
    cfg, params, proc, S = _tiny_setup(rcfg)
    s = proc("just text no image here")
    rb = to_reward_batch(collate_samples([s], 32, pad_token_id=0))
    out = reward_forward(params, cfg, rcfg, rb, training=False, attn_impl="xla")
    assert out.reward.shape == (1, 1)
