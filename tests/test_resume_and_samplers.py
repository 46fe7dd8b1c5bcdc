"""Orbax train-state resume round trip + sampler semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llava_reward_tpu.core.config import RewardConfig, phi3v_tiny_config
from llava_reward_tpu.data.sampler import DistributedSampler, GroupSampler
from llava_reward_tpu.models import phi3v
from llava_reward_tpu.reward import RewardBatch, init_head_params
from llava_reward_tpu.train.optim import make_optimizer
from llava_reward_tpu.train.train_step import (
    init_train_state,
    make_pairwise_loss_fn,
    make_train_step,
    select_loss_name,
)


def test_add_img_eos_forces_gpm():
    rcfg = RewardConfig(is_general_preference=True, value_head_dim=4)
    assert select_loss_name(rcfg, False, add_img_eos=False) == "high_dim_gpm"
    assert select_loss_name(rcfg, False, add_img_eos=True) == "gpm"


def test_orbax_resume_roundtrip(tmp_path, rng):
    from llava_reward_tpu.train.trainer import RewardTrainer

    cfg = phi3v_tiny_config(num_layers=2, vision_layers=1)
    rcfg = RewardConfig()
    rcfg.layer_id = cfg.decoder.num_layers
    frozen = {"backbone": phi3v.init_params(jax.random.PRNGKey(0), cfg)}
    trainable = {
        "head": init_head_params(jax.random.PRNGKey(1), cfg, rcfg),
        "lora": None, "projector": None, "vision_lora": None,
    }
    tx = make_optimizer(1e-3, 10)
    loss_fn = make_pairwise_loss_fn(cfg, rcfg, attn_impl="xla", remat=False)
    trainer = RewardTrainer(
        cfg=cfg, rcfg=rcfg, frozen=frozen, trainable=trainable, tx=tx,
        loss_fn=loss_fn, train_loader=[], save_path=str(tmp_path),
    )
    B, S = 2, 10
    batch = RewardBatch(
        input_ids=jnp.asarray(rng.integers(2, 100, (B, S)).astype(np.int32)),
        attention_mask=jnp.asarray(np.ones((B, S), np.int32)),
        pixel_values=None, img_gather_idx=None, splice_idx=None,
        num_img_tokens=None,
    )
    step = jax.jit(make_train_step(loss_fn, tx))
    trainer.state, _ = step(trainer.state, frozen, batch, batch)
    trainer.state, _ = step(trainer.state, frozen, batch, batch)
    kern_before = np.asarray(trainer.state.trainable["head"]["value_head"]["kernel"])
    step_before = int(trainer.state.step)

    trainer.save_train_ckpt(str(tmp_path / "resume"))
    # wipe and restore
    trainer.state = init_train_state(trainable, tx)
    assert int(trainer.state.step) == 0
    trainer.load_train_ckpt(str(tmp_path / "resume"))
    assert int(trainer.state.step) == step_before
    np.testing.assert_allclose(
        np.asarray(trainer.state.trainable["head"]["value_head"]["kernel"]),
        kern_before,
    )


def test_group_sampler_keeps_groups_contiguous():
    gs = GroupSampler(dataset_len=24, group_size=4, shuffle=True, seed=1)
    idx = list(gs)
    assert sorted(idx) == list(range(24))
    # each aligned block of 4 must be one contiguous original group
    for i in range(0, 24, 4):
        block = idx[i : i + 4]
        assert block == list(range(block[0], block[0] + 4))


def test_group_sampler_subsample_and_shard():
    gs = GroupSampler(
        dataset_len=24, group_size=4, shuffle=True, seed=0,
        num_replicas=2, rank=0, sample_group_num=3,
    )
    idx = list(gs)
    # 3 groups * 4 items / 2 replicas
    assert len(idx) == len(gs) == 6


def test_distributed_sampler_partition():
    a = list(DistributedSampler(10, num_replicas=2, rank=0, shuffle=False))
    b = list(DistributedSampler(10, num_replicas=2, rank=1, shuffle=False))
    assert sorted(a + b) == list(range(10))
    assert len(a) == len(b) == 5
    # epoch changes the permutation
    s = DistributedSampler(10, shuffle=True, seed=3)
    s.set_epoch(0)
    e0 = list(s)
    s.set_epoch(1)
    assert e0 != list(s)
