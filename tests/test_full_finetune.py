"""Full fine-tuning mode (lora_rank=0) + ft-phi style full-checkpoint eval."""

import json
import os

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


def _text_batch(cfg, rng, B, S):
    return RewardBatch(
        input_ids=jnp.asarray(rng.integers(2, 100, (B, S)).astype(np.int32)),
        attention_mask=jnp.asarray(np.ones((B, S), np.int32)),
        pixel_values=None, img_gather_idx=None, splice_idx=None,
        num_img_tokens=None,
    )


def test_full_finetune_updates_backbone(rng):
    cfg = phi3v_tiny_config(num_layers=2, vision_layers=1)
    rcfg = RewardConfig()
    rcfg.layer_id = cfg.decoder.num_layers
    backbone = phi3v.init_params(jax.random.PRNGKey(0), cfg)
    frozen = {"backbone": {}}
    trainable = {
        "backbone": backbone,
        "head": init_head_params(jax.random.PRNGKey(1), cfg, rcfg),
        "lora": None, "projector": None, "vision_lora": None,
    }
    tx = make_optimizer(1e-3, 10, warmup_ratio=0.0)
    loss_fn = make_pairwise_loss_fn(cfg, rcfg, attn_impl="xla", remat=False)
    step = jax.jit(make_train_step(loss_fn, tx))
    st = init_train_state(trainable, tx)
    before = np.asarray(backbone["decoder"]["layers"]["qkv_proj"])
    st, m = step(st, frozen, _text_batch(cfg, rng, 2, 10), _text_batch(cfg, rng, 2, 10))
    after = np.asarray(st.trainable["backbone"]["decoder"]["layers"]["qkv_proj"])
    assert np.isfinite(float(m["preference_loss"]))
    assert not np.allclose(before, after)  # backbone actually trained


def test_ft_checkpoint_loads_without_lora(tmp_path):
    """The _ft_phi eval path (batch_inference_rm_ft_phi.py:28-55): a FULL
    fine-tuned checkpoint where the base weights and head live together —
    load with pretrain == pm_path, no lora/ dir."""
    import torch

    from llava_reward_tpu.evalx.adaptor import load_reward_adaptor
    from llava_reward_tpu.io.artifact import save_reward_config
    from llava_reward_tpu.io.hf_phi3v import hf_state_dict_from_params
    from llava_reward_tpu.io.torch_io import save_torch_state_dict

    cfg = phi3v_tiny_config(num_layers=2, vision_layers=2)
    rcfg = RewardConfig(is_general_preference=True, value_head_dim=2)
    params = jax.device_get(phi3v.init_params(jax.random.PRNGKey(0), cfg))
    head = jax.device_get(init_head_params(jax.random.PRNGKey(1), cfg, rcfg))

    sd = hf_state_dict_from_params(params, cfg)
    sd["value_head.weight"] = np.ascontiguousarray(
        np.asarray(head["value_head"]["kernel"]).T
    )
    pm = tmp_path / "ft_ckpt"
    os.makedirs(pm)
    save_torch_state_dict(sd, str(pm / "pytorch_model.bin"), torch.float32)
    with open(pm / "config.json", "w") as f:
        json.dump(
            {
                "vocab_size": cfg.decoder.vocab_size,
                "hidden_size": cfg.decoder.hidden_size,
                "intermediate_size": cfg.decoder.intermediate_size,
                "num_hidden_layers": cfg.decoder.num_layers,
                "num_attention_heads": cfg.decoder.num_heads,
                "num_key_value_heads": cfg.decoder.num_kv_heads,
                "pad_token_id": cfg.decoder.pad_token_id,
            },
            f,
        )
    save_reward_config(str(pm), rcfg)

    adaptor = load_reward_adaptor(str(pm), str(pm), ft_projector=False)
    np.testing.assert_allclose(
        adaptor.params["head"]["value_head"]["kernel"],
        np.asarray(head["value_head"]["kernel"]),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        adaptor.params["backbone"]["decoder"]["embed_tokens"],
        params["decoder"]["embed_tokens"],
        rtol=1e-6,
    )
