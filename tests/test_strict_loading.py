"""Strict checkpoint loading: unconsumed/missing state-dict keys must be
loud (the reference relies on torch's strict load_state_dict,
eval/reward_adaptor_loader.py:46-63; in a zero-egress environment the first
real-weights load must be a diagnosis, not a silent numerics bug), and
vision-LoRA adapters must round-trip through the PEFT artifact."""

import json
import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from llava_reward_tpu.core.config import RewardConfig, phi3v_tiny_config
from llava_reward_tpu.io.artifact import save_reward_artifact
from llava_reward_tpu.io.hf_phi3v import (
    hf_state_dict_from_params,
    params_from_hf_state_dict,
)
from llava_reward_tpu.io.torch_io import save_torch_state_dict
from llava_reward_tpu.lora.lora import (
    init_lora,
    init_vision_lora,
    merge_vision_lora,
    peft_adapter_config,
    stacked_to_peft_state,
    vision_peft_state_to_stacked,
    vision_stacked_to_peft_state,
)
from llava_reward_tpu.models import phi3v
from llava_reward_tpu.reward import init_head_params


@pytest.fixture(scope="module")
def tiny():
    cfg = phi3v_tiny_config(num_layers=2, vision_layers=2)
    params = jax.device_get(phi3v.init_params(jax.random.PRNGKey(0), cfg))
    return cfg, params


def test_extra_key_raises(tiny):
    cfg, params = tiny
    sd = hf_state_dict_from_params(params, cfg)
    sd["model.layers.0.self_attn.mystery.weight"] = np.zeros((4, 4), np.float32)
    with pytest.raises(ValueError, match="mystery"):
        params_from_hf_state_dict(sd, cfg)
    # strict=False downgrades to a warning and still loads
    tree = params_from_hf_state_dict(sd, cfg, strict=False)
    assert "decoder" in tree and "vision" in tree


def test_known_buffer_keys_ignored(tiny):
    cfg, params = tiny
    sd = hf_state_dict_from_params(params, cfg)
    sd["model.layers.0.self_attn.rotary_emb.inv_freq"] = np.ones((4,), np.float32)
    sd[
        "model.vision_embed_tokens.img_processor.vision_model.embeddings.position_ids"
    ] = np.arange(5)[None]
    params_from_hf_state_dict(sd, cfg)  # no error


def test_missing_key_has_context(tiny):
    cfg, params = tiny
    sd = hf_state_dict_from_params(params, cfg)
    del sd["model.layers.1.mlp.down_proj.weight"]
    with pytest.raises(KeyError, match="missing required key.*down_proj"):
        params_from_hf_state_dict(sd, cfg)


def test_qwen_extra_key_raises():
    from llava_reward_tpu.core.config import qwen_tiny_config
    from llava_reward_tpu.io.hf_qwen import params_from_hf_state_dict as qwen_load
    from llava_reward_tpu.models import qwen25_vl
    from test_qwen_adaptor import _qwen_hf_sd

    cfg = qwen_tiny_config(num_layers=2, vision_depth=2)
    params = jax.device_get(qwen25_vl.init_params(jax.random.PRNGKey(0), cfg))
    sd = _qwen_hf_sd(params, cfg)
    sd["visual.blocks.0.attn.qkv.weird"] = np.zeros((2,), np.float32)
    with pytest.raises(ValueError, match="weird"):
        qwen_load(sd, cfg)
    qwen_load(sd, cfg, strict=False)


def _write_base(tmp_path, cfg, params):
    base = tmp_path / "base"
    os.makedirs(base, exist_ok=True)
    save_torch_state_dict(
        hf_state_dict_from_params(params, cfg),
        str(base / "pytorch_model.bin"),
        torch.float32,
    )
    with open(base / "config.json", "w") as f:
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
    return base


def test_artifact_unknown_key_raises(tmp_path, tiny):
    from llava_reward_tpu.evalx.adaptor import load_reward_adaptor

    cfg, params = tiny
    base = _write_base(tmp_path, cfg, params)
    rcfg = RewardConfig(is_general_preference=True, value_head_dim=2)
    head = jax.device_get(init_head_params(jax.random.PRNGKey(1), cfg, rcfg))
    pm = tmp_path / "pm"
    save_reward_artifact(str(pm), rcfg, head, torch_dtype=torch.float32)
    # inject a key the loader families don't cover
    sd = torch.load(str(pm / "pytorch_model.bin"), weights_only=True)
    sd["decoder_head.weight"] = torch.zeros(2, 2)
    torch.save(sd, str(pm / "pytorch_model.bin"))
    with pytest.raises(ValueError, match="decoder_head"):
        load_reward_adaptor(str(base), str(pm))
    load_reward_adaptor(str(base), str(pm), strict=False)  # warns only


def test_vision_lora_peft_roundtrip(tiny):
    cfg, params = tiny
    vlora = jax.device_get(
        init_vision_lora(jax.random.PRNGKey(3), cfg.vision, rank=3, alpha=6)
    )
    # non-zero B so the deltas matter
    vlora = jax.tree_util.tree_map(
        lambda x: x + 0.05 if x.ndim == 3 else x, vlora
    )
    sd = vision_stacked_to_peft_state(vlora, cfg.vision)
    assert any("img_processor.vision_model.encoder.layers.0" in k for k in sd)
    back = vision_peft_state_to_stacked(sd, cfg.vision, alpha=6, rank=3)
    assert set(back) == set(vlora)
    for name in vlora:
        np.testing.assert_allclose(back[name]["a"], np.asarray(vlora[name]["a"]), rtol=1e-6)
        np.testing.assert_allclose(back[name]["b"], np.asarray(vlora[name]["b"]), rtol=1e-6)

    clip = params["vision"]["clip"]
    merged = merge_vision_lora(clip, back)
    want = np.asarray(clip["layers"]["attn"]["q"]["kernel"]) + 2.0 * np.einsum(
        "lir,lro->lio", back["q"]["a"], back["q"]["b"]
    )
    np.testing.assert_allclose(
        merged["layers"]["attn"]["q"]["kernel"], want, rtol=1e-5, atol=1e-6
    )
    # base tree untouched
    assert not np.allclose(
        np.asarray(clip["layers"]["attn"]["q"]["kernel"]),
        merged["layers"]["attn"]["q"]["kernel"],
    )


def test_adaptor_merges_vision_and_projector_lora(tmp_path, tiny):
    from llava_reward_tpu.evalx.adaptor import load_reward_adaptor
    from llava_reward_tpu.reward.model import RewardBatch

    cfg, params = tiny
    base = _write_base(tmp_path, cfg, params)
    rcfg = RewardConfig(is_general_preference=True, value_head_dim=2)
    head = jax.device_get(init_head_params(jax.random.PRNGKey(1), cfg, rcfg))

    lora = jax.device_get(init_lora(jax.random.PRNGKey(2), cfg.decoder, 4, 8))
    vlora = jax.device_get(
        init_vision_lora(jax.random.PRNGKey(3), cfg.vision, rank=4, alpha=8)
    )
    vlora = jax.tree_util.tree_map(lambda x: x + 0.03 if x.ndim == 3 else x, vlora)
    lora_state = stacked_to_peft_state(lora, cfg.decoder)
    lora_state.update(vision_stacked_to_peft_state(vlora, cfg.vision))
    # img_projection LoRA (reference target, utils/utils.py:211-212)
    H = cfg.decoder.hidden_size
    D = cfg.image_dim_out * 4
    rng = np.random.default_rng(5)
    lora_state["base_model.model.model.vision_embed_tokens.img_projection.0.lora_A.weight"] = (
        rng.standard_normal((4, D)).astype(np.float32) * 0.1
    )
    lora_state["base_model.model.model.vision_embed_tokens.img_projection.0.lora_B.weight"] = (
        rng.standard_normal((H, 4)).astype(np.float32) * 0.1
    )
    pm = tmp_path / "pm"
    save_reward_artifact(
        str(pm), rcfg, head,
        lora_state=lora_state,
        lora_config=peft_adapter_config(4, 8, 0.0),
        torch_dtype=torch.float32,
    )

    adaptor = load_reward_adaptor(str(base), str(pm))  # strict: nothing dropped
    # the vision tower must differ from the raw base by the merged deltas
    got = np.asarray(
        adaptor.params["backbone"]["vision"]["clip"]["layers"]["attn"]["q"]["kernel"]
    )
    want = np.asarray(params["vision"]["clip"]["layers"]["attn"]["q"]["kernel"]) + (
        8 / 4
    ) * np.einsum("lir,lro->lio", vlora["q"]["a"], vlora["q"]["b"])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # projector delta: ours (in, out) = (B@A).T * alpha/r
    a = lora_state[
        "base_model.model.model.vision_embed_tokens.img_projection.0.lora_A.weight"
    ]
    b = lora_state[
        "base_model.model.model.vision_embed_tokens.img_projection.0.lora_B.weight"
    ]
    want_fc1 = np.asarray(
        params["vision"]["img_projection"]["fc1"]["kernel"]
    ) + 2.0 * (b @ a).T
    np.testing.assert_allclose(
        np.asarray(adaptor.params["backbone"]["vision"]["img_projection"]["fc1"]["kernel"]),
        want_fc1, rtol=1e-4, atol=1e-5,
    )


def test_unconsumed_lora_key_raises(tmp_path, tiny):
    from llava_reward_tpu.evalx.adaptor import load_reward_adaptor

    cfg, params = tiny
    base = _write_base(tmp_path, cfg, params)
    rcfg = RewardConfig(is_general_preference=True, value_head_dim=2)
    head = jax.device_get(init_head_params(jax.random.PRNGKey(1), cfg, rcfg))
    lora = jax.device_get(init_lora(jax.random.PRNGKey(2), cfg.decoder, 4, 8))
    lora_state = stacked_to_peft_state(lora, cfg.decoder)
    lora_state["base_model.model.model.layers.0.self_attn.rogue_proj.lora_A.weight"] = (
        np.zeros((4, 8), np.float32)
    )
    pm = tmp_path / "pm"
    save_reward_artifact(
        str(pm), rcfg, head, lora_state=lora_state,
        lora_config=peft_adapter_config(4, 8, 0.0), torch_dtype=torch.float32,
    )
    with pytest.raises(ValueError, match="rogue_proj"):
        load_reward_adaptor(str(base), str(pm))
    load_reward_adaptor(str(base), str(pm), strict=False)


def test_trainer_exports_vision_lora(tmp_path, tiny):
    """save_artifact must write vision-LoRA deltas into the PEFT file (they
    were silently dropped before round 4)."""
    from llava_reward_tpu.io.torch_io import load_torch_state_dict

    cfg, params = tiny
    rcfg = RewardConfig(is_general_preference=True, value_head_dim=2)
    head = jax.device_get(init_head_params(jax.random.PRNGKey(1), cfg, rcfg))
    lora = jax.device_get(init_lora(jax.random.PRNGKey(2), cfg.decoder, 4, 8))
    vlora = jax.device_get(
        init_vision_lora(jax.random.PRNGKey(3), cfg.vision, rank=4, alpha=8)
    )

    class _FakeTrainer:
        pass

    from llava_reward_tpu.train.trainer import RewardTrainer

    t = _FakeTrainer()
    t.state = type("S", (), {"trainable": {
        "head": head, "lora": lora, "vision_lora": vlora, "projector": None,
    }})()
    t.cfg, t.rcfg = cfg, rcfg
    t.lora_rank, t.lora_alpha, t.lora_dropout = 4, 8, 0.0
    t.lora_targets = None
    t.model_type = "phi3v"
    t.frozen = {}
    # the multi-host save path (r5): host-gather + rank-0 barrier helpers
    t._fetch_host = RewardTrainer._fetch_host
    t._sync_hosts = lambda *a, **k: None
    RewardTrainer.save_artifact(t, str(tmp_path / "art"))

    sd = load_torch_state_dict(str(tmp_path / "art" / "lora" / "adapter_model.bin"))
    assert any("img_processor.vision_model.encoder.layers" in k for k in sd)
    with open(tmp_path / "art" / "lora" / "adapter_config.json") as f:
        acfg = json.load(f)
    assert "out_proj" in acfg["target_modules"]
