"""ptx pretrain-loss mixing (--add_pretrain_loss, rm_trainer…py:178-208)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llava_reward_tpu.core.config import RewardConfig, phi3v_tiny_config
from llava_reward_tpu.models import phi3v
from llava_reward_tpu.reward import RewardBatch, init_head_params
from llava_reward_tpu.train.optim import make_optimizer
from llava_reward_tpu.train.train_step import (
    init_train_state,
    make_pairwise_loss_fn,
    make_train_step,
)


def test_ptx_loss_mixing():
    cfg = phi3v_tiny_config(num_layers=2, vision_layers=1)
    rcfg = RewardConfig(is_general_preference=False)
    rcfg.layer_id = cfg.decoder.num_layers
    backbone = phi3v.init_params(jax.random.PRNGKey(0), cfg)
    # lm_head required for ptx
    backbone["lm_head"] = (
        jax.random.normal(
            jax.random.PRNGKey(3), (cfg.decoder.hidden_size, cfg.decoder.vocab_size)
        )
        * 0.02
    )
    frozen = {"backbone": backbone}
    trainable = {
        "head": init_head_params(jax.random.PRNGKey(1), cfg, rcfg),
        "lora": None,
        "projector": None,
    }

    rng = np.random.default_rng(0)
    B, S = 2, 12

    def batch():
        return RewardBatch(
            input_ids=jnp.asarray(rng.integers(2, 100, (B, S)).astype(np.int32)),
            attention_mask=jnp.asarray(np.ones((B, S), np.int32)),
            pixel_values=None, img_gather_idx=None, splice_idx=None,
            num_img_tokens=None,
        )

    chosen, rejected = batch(), batch()

    loss_plain = make_pairwise_loss_fn(cfg, rcfg, attn_impl="xla", remat=False)
    loss_ptx = make_pairwise_loss_fn(
        cfg, rcfg, attn_impl="xla", remat=False,
        add_pretrain_loss=True, ptx_loss_coef=0.3, reward_scaler_beta=2.0,
    )

    l0, m0 = loss_plain(trainable, frozen, chosen, rejected)
    l1, m1 = loss_ptx(trainable, frozen, chosen, rejected)
    assert "ptx_loss" in m1
    # mixing formula: (1 - coef) * pref + coef * ptx
    expected = 0.7 * float(m1["preference_loss"]) + 0.3 * float(m1["ptx_loss"])
    np.testing.assert_allclose(float(l1), expected, rtol=1e-5)
    assert np.isfinite(float(m1["ptx_loss"]))

    # trains
    tx = make_optimizer(1e-3, 5)
    step = jax.jit(make_train_step(loss_ptx, tx))
    st = init_train_state(trainable, tx)
    st, m = step(st, frozen, chosen, rejected)
    assert np.isfinite(float(m["preference_loss"]))
