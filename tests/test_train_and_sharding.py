"""Training step + 8-virtual-device FSDP mesh tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llava_reward_tpu.core.config import RewardConfig, phi3v_tiny_config
from llava_reward_tpu.lora.lora import (
    init_lora,
    merge_lora,
    peft_state_to_stacked,
    stacked_to_peft_state,
)
from llava_reward_tpu.models import phi3v
from llava_reward_tpu.parallel.sharding import create_mesh, shard_batch, shard_params
from llava_reward_tpu.reward import init_head_params
from llava_reward_tpu.train.optim import cosine_schedule_with_warmup, make_optimizer
from llava_reward_tpu.train.train_step import (
    init_train_state,
    make_cls_loss_fn,
    make_pairwise_loss_fn,
    make_train_step,
    select_loss_name,
)


def _setup(rcfg, lora_rank=4):
    cfg = phi3v_tiny_config(num_crops=4, num_layers=2, vision_layers=1)
    rcfg.layer_id = cfg.decoder.num_layers
    frozen = {"backbone": phi3v.init_params(jax.random.PRNGKey(0), cfg)}
    trainable = {
        "head": init_head_params(jax.random.PRNGKey(1), cfg, rcfg),
        "lora": init_lora(jax.random.PRNGKey(2), cfg.decoder, lora_rank, 2 * lora_rank)
        if lora_rank
        else None,
        "projector": None,
    }
    return cfg, frozen, trainable


def _text_batch(cfg, rng, B, S):
    from llava_reward_tpu.reward.model import RewardBatch

    ids = rng.integers(2, cfg.decoder.vocab_size - 2, (B, S)).astype(np.int32)
    return RewardBatch(
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.asarray(np.ones((B, S), np.int32)),
        pixel_values=None,
        img_gather_idx=None,
        splice_idx=None,
        num_img_tokens=None,
    )


def test_select_loss_name():
    assert select_loss_name(RewardConfig(is_general_preference=True, value_head_dim=2), False) == "gpm"
    assert select_loss_name(RewardConfig(is_general_preference=True, value_head_dim=1), False) == "cls"
    assert select_loss_name(RewardConfig(is_general_preference=True, value_head_dim=4), False) == "high_dim_gpm"
    assert (
        select_loss_name(
            RewardConfig(is_general_preference=True, value_head_dim=4, add_prompt_head=True), False
        )
        == "moe"
    )
    assert select_loss_name(RewardConfig(), True) == "binary_cls"
    assert select_loss_name(RewardConfig(), False) == "bt"


def test_schedule():
    s = cosine_schedule_with_warmup(1e-3, 100, 0.03)
    assert float(s(0)) == 0.0
    assert float(s(3)) == pytest.approx(1e-3, rel=1e-5)
    assert float(s(100)) == pytest.approx(0.0, abs=1e-9)
    assert float(s(50)) < 1e-3


def test_train_step_decreases_loss_bt():
    rcfg = RewardConfig(is_general_preference=False)
    cfg, frozen, trainable = _setup(rcfg)
    tx = make_optimizer(5e-3, total_steps=20, warmup_ratio=0.0)
    loss_fn = make_pairwise_loss_fn(cfg, rcfg, attn_impl="xla", remat=False)
    step = jax.jit(make_train_step(loss_fn, tx))
    state = init_train_state(trainable, tx)
    rng = np.random.default_rng(0)
    chosen = _text_batch(cfg, rng, 4, 16)
    rejected = _text_batch(cfg, rng, 4, 16)
    losses = []
    for _ in range(8):
        state, m = step(state, frozen, chosen, rejected)
        losses.append(float(m["preference_loss"]))
    assert losses[-1] < losses[0], losses


def test_train_step_moe():
    rcfg = RewardConfig(
        is_general_preference=True, value_head_dim=4, add_prompt_head=True
    )
    cfg, frozen, trainable = _setup(rcfg)
    tx = make_optimizer(1e-3, total_steps=10)
    loss_fn = make_pairwise_loss_fn(cfg, rcfg, attn_impl="xla", remat=False)
    step = jax.jit(make_train_step(loss_fn, tx))
    state = init_train_state(trainable, tx)
    rng = np.random.default_rng(1)
    state, m = step(state, frozen, _text_batch(cfg, rng, 2, 12), _text_batch(cfg, rng, 2, 12))
    assert np.isfinite(float(m["preference_loss"]))


def test_cls_fit_step():
    rcfg = RewardConfig(is_general_preference=False)
    cfg, frozen, trainable = _setup(rcfg)
    tx = make_optimizer(1e-3, total_steps=10)
    loss_fn = make_cls_loss_fn(cfg, rcfg, attn_impl="xla", remat=False)
    step = jax.jit(make_train_step(loss_fn, tx))
    state = init_train_state(trainable, tx)
    rng = np.random.default_rng(2)
    labels = jnp.asarray(rng.integers(0, 2, 4).astype(np.float32))
    state, m = step(state, frozen, _text_batch(cfg, rng, 4, 12), labels)
    assert np.isfinite(float(m["preference_loss"]))


def test_grad_accumulation_equivalence():
    """MultiSteps(k=2) over two microbatches == one step on the mean grad."""
    rcfg = RewardConfig()
    cfg, frozen, trainable = _setup(rcfg, lora_rank=0)
    loss_fn = make_pairwise_loss_fn(cfg, rcfg, attn_impl="xla", remat=False)
    rng = np.random.default_rng(3)
    b1c, b1r = _text_batch(cfg, rng, 2, 10), _text_batch(cfg, rng, 2, 10)
    b2c, b2r = _text_batch(cfg, rng, 2, 10), _text_batch(cfg, rng, 2, 10)

    tx_acc = make_optimizer(1e-2, 10, warmup_ratio=0.0, accumulation_steps=2)
    step_acc = jax.jit(make_train_step(loss_fn, tx_acc))
    st = init_train_state(trainable, tx_acc)
    st, _ = step_acc(st, frozen, b1c, b1r)
    st, _ = step_acc(st, frozen, b2c, b2r)
    acc_head = np.asarray(st.trainable["head"]["value_head"]["kernel"])

    g1 = jax.grad(lambda t: loss_fn(t, frozen, b1c, b1r)[0])(trainable)
    g2 = jax.grad(lambda t: loss_fn(t, frozen, b2c, b2r)[0])(trainable)
    gm = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, g1, g2)
    tx = make_optimizer(1e-2, 10, warmup_ratio=0.0)
    opt = tx.init(trainable)
    upd, _ = tx.update(gm, opt, trainable)
    import optax

    ref = optax.apply_updates(trainable, upd)
    np.testing.assert_allclose(
        acc_head, np.asarray(ref["head"]["value_head"]["kernel"]), rtol=1e-4, atol=1e-6
    )


def test_lora_merge_matches_inline():
    cfg = phi3v_tiny_config(num_layers=2, vision_layers=1).decoder
    from llava_reward_tpu.models import phi3

    params = phi3.init_params(jax.random.PRNGKey(0), cfg)
    lora = init_lora(jax.random.PRNGKey(1), cfg, rank=4, alpha=8)
    # randomise B so the delta is nonzero
    lora = jax.tree_util.tree_map(
        lambda x: x + 0.01 * np.random.default_rng(0).standard_normal(x.shape).astype(np.float32)
        if x.ndim == 3 else x,
        lora,
    )
    rng = np.random.default_rng(4)
    B, S = 2, 8
    ids = rng.integers(0, cfg.vocab_size, (B, S)).astype(np.int32)
    mask = np.ones((B, S), np.int32)
    pos = np.arange(S, dtype=np.int32)[None].repeat(B, 0)
    embeds = np.asarray(params["embed_tokens"])[ids]

    out_inline = phi3.forward(
        params, cfg, jnp.asarray(embeds), jnp.asarray(mask), jnp.asarray(pos),
        attn_impl="xla", lora=lora,
    ).last_hidden_state
    merged = dict(params)
    merged["layers"] = merge_lora(params["layers"], lora)
    out_merged = phi3.forward(
        merged, cfg, jnp.asarray(embeds), jnp.asarray(mask), jnp.asarray(pos),
        attn_impl="xla",
    ).last_hidden_state
    np.testing.assert_allclose(
        np.asarray(out_inline), np.asarray(out_merged), rtol=1e-4, atol=1e-5
    )


def test_peft_roundtrip():
    cfg = phi3v_tiny_config(num_layers=2).decoder
    lora = init_lora(jax.random.PRNGKey(0), cfg, rank=4, alpha=8)
    sd = stacked_to_peft_state(lora, cfg)
    assert any("lora_A" in k for k in sd)
    back = peft_state_to_stacked(sd, cfg, alpha=8, rank=4)
    for name in lora:
        np.testing.assert_allclose(np.asarray(lora[name]["a"]), back[name]["a"], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(lora[name]["b"]), back[name]["b"], rtol=1e-6)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_fsdp_mesh_train_step_matches_single_device():
    rcfg = RewardConfig(is_general_preference=True, value_head_dim=2)
    cfg, frozen, trainable = _setup(rcfg)
    tx = make_optimizer(1e-3, total_steps=10, warmup_ratio=0.0)
    loss_fn = make_pairwise_loss_fn(cfg, rcfg, attn_impl="xla", remat=False)
    step = make_train_step(loss_fn, tx)
    rng = np.random.default_rng(5)
    chosen = _text_batch(cfg, rng, 8, 16)
    rejected = _text_batch(cfg, rng, 8, 16)

    # single device
    st0 = init_train_state(trainable, tx)
    st0, m0 = jax.jit(step)(st0, frozen, chosen, rejected)

    # 8-device (dp=2, fsdp=4)
    mesh = create_mesh(dp=2, fsdp=4, tp=1)
    with mesh:
        frozen_s = shard_params(frozen, mesh)
        trainable_s = shard_params(trainable, mesh)
        st = init_train_state(trainable_s, tx)
        chosen_s = shard_batch(chosen, mesh)
        rejected_s = shard_batch(rejected, mesh)
        st, m = jax.jit(step)(st, frozen_s, chosen_s, rejected_s)

    np.testing.assert_allclose(
        float(m["preference_loss"]), float(m0["preference_loss"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(st.trainable["head"]["value_head"]["kernel"]),
        np.asarray(st0.trainable["head"]["value_head"]["kernel"]),
        rtol=1e-4, atol=1e-6,
    )


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip_entry():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_pointwise_eval_during_training(rng):
    """cls (pointwise) runs eval-during-training: trainer.evaluate has a
    pointwise branch reporting acc/F1/recall via evalx.metrics (VERDICT r2
    item 6; reference intent rm_trainer_general_preference.py:240-345)."""
    from llava_reward_tpu.preprocess.collate import Batch
    from llava_reward_tpu.train.trainer import RewardTrainer
    from llava_reward_tpu.train.train_step import make_cls_loss_fn
    from llava_reward_tpu.train.optim import make_optimizer
    from llava_reward_tpu.models import phi3v
    from llava_reward_tpu.reward import init_head_params

    cfg = phi3v_tiny_config(num_layers=2, vision_layers=1)
    rcfg = RewardConfig(is_general_preference=False)
    rcfg.layer_id = cfg.decoder.num_layers
    frozen = {"backbone": phi3v.init_params(jax.random.PRNGKey(0), cfg)}
    trainable = {
        "head": init_head_params(jax.random.PRNGKey(1), cfg, rcfg),
        "lora": None, "projector": None, "vision_lora": None,
    }
    B, S = 4, 12
    b = Batch(
        input_ids=rng.integers(2, 100, (B, S)).astype(np.int32),
        attention_mask=np.ones((B, S), np.int32),
        splice_idx=np.full((B, S), -1, np.int32),
        pixel_values=None, img_gather_idx=None,
        num_img_tokens=np.zeros((B,), np.int32),
    )
    labels = np.asarray([1, 0, 1, 0], np.float32)
    trainer = RewardTrainer(
        cfg=cfg, rcfg=rcfg, frozen=frozen, trainable=trainable,
        tx=make_optimizer(1e-3, 10),
        loss_fn=make_cls_loss_fn(cfg, rcfg, attn_impl="xla", remat=False),
        train_loader=[], eval_loader=[(b, labels)], cls_based=True,
    )
    m = trainer.evaluate(global_step=1)
    assert set(m) == {"eval_acc", "eval_f1", "eval_recall", "eval_num_samples"}
    assert m["eval_num_samples"] == B
    assert 0.0 <= m["eval_acc"] <= 1.0 and np.isfinite(m["eval_f1"])


def test_wandb_logging_path(rng, tmp_path):
    """fit() and evaluate() drive the wandb logger (stubbed): train/* rows
    per logging step, eval/* rows per eval, finish() at the end — the
    reference's strategy.log path (rm_trainer_general_preference.py:218-238)."""
    from llava_reward_tpu.preprocess.collate import Batch
    from llava_reward_tpu.train.trainer import RewardTrainer
    from llava_reward_tpu.train.train_step import make_cls_loss_fn

    class StubWandb:
        def __init__(self):
            self.rows, self.finished = [], False

        def log(self, d):
            self.rows.append(dict(d))

        def finish(self):
            self.finished = True

    cfg = phi3v_tiny_config(num_layers=2, vision_layers=1)
    rcfg = RewardConfig(is_general_preference=False)
    rcfg.layer_id = cfg.decoder.num_layers
    frozen = {"backbone": phi3v.init_params(jax.random.PRNGKey(0), cfg)}
    trainable = {
        "head": init_head_params(jax.random.PRNGKey(1), cfg, rcfg),
        "lora": None, "projector": None, "vision_lora": None,
    }
    B, S = 4, 12
    b = Batch(
        input_ids=rng.integers(2, 100, (B, S)).astype(np.int32),
        attention_mask=np.ones((B, S), np.int32),
        splice_idx=np.full((B, S), -1, np.int32),
        pixel_values=None, img_gather_idx=None,
        num_img_tokens=np.zeros((B,), np.int32),
    )
    labels = np.asarray([1, 0, 1, 0], np.float32)
    stub = StubWandb()
    trainer = RewardTrainer(
        cfg=cfg, rcfg=rcfg, frozen=frozen, trainable=trainable,
        tx=make_optimizer(1e-3, 10),
        loss_fn=make_cls_loss_fn(cfg, rcfg, attn_impl="xla", remat=False),
        train_loader=[(b, labels)], eval_loader=[(b, labels)], cls_based=True,
        logging_steps=1, eval_steps=1, max_epochs=1,
        save_path=str(tmp_path), wandb_logger=stub,
    )
    trainer.fit()
    train_rows = [r for r in stub.rows if "train/preference_loss" in r]
    eval_rows = [r for r in stub.rows if "eval/eval_acc" in r]
    assert len(train_rows) == 1 and len(eval_rows) == 1
    assert np.isfinite(train_rows[0]["train/preference_loss"])
    assert train_rows[0]["train/global_step"] == 1
    assert stub.finished


def test_param_shardings_drop_nondivisible_dims():
    """Dims the mesh doesn't divide (e.g. the 588-row CLIP patch_proj under
    fsdp=8) fall back to replicated instead of erroring; divisible dims
    keep their rule."""
    from jax.sharding import PartitionSpec as P
    from llava_reward_tpu.parallel.sharding import param_shardings

    mesh = create_mesh(dp=1, fsdp=8, tp=1)
    tree = {
        "vision": {"clip": {"patch_proj": np.zeros((588, 64), np.float32)}},
        "decoder": {"embed_tokens": np.zeros((512, 64), np.float32)},
    }
    sh = param_shardings(tree, mesh)
    assert sh["vision"]["clip"]["patch_proj"].spec == P(None, None)
    assert sh["decoder"]["embed_tokens"].spec == P("fsdp", "tp")
