"""Qwen adaptor loader E2E: synthetic base checkpoint + artifact with LoRA."""

import json
import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from llava_reward_tpu.core.config import RewardConfig, qwen_tiny_config
from llava_reward_tpu.io.artifact import save_reward_artifact
from llava_reward_tpu.io.torch_io import save_torch_state_dict
from llava_reward_tpu.lora.lora import (
    QWEN_TARGETS,
    init_lora,
    peft_adapter_config,
    stacked_to_peft_state,
)
from llava_reward_tpu.models import qwen25_vl
from llava_reward_tpu.reward import init_head_params


def _qwen_hf_sd(params, cfg):
    """Our tree -> HF-layout state dict (inverse of io/hf_qwen.py)."""
    sd = {}
    T = lambda x: np.ascontiguousarray(np.asarray(x).T)
    vis, txt = params["visual"], params["text"]
    vc, tc = cfg.vision, cfg.text
    patch = np.asarray(vis["patch_embed"])  # (pd, H)
    sd["visual.patch_embed.proj.weight"] = T(patch).reshape(
        vc.hidden_size, vc.in_channels, vc.temporal_patch_size,
        vc.patch_size, vc.patch_size,
    )
    for i in range(vc.depth):
        b = vis["blocks"]
        sd[f"visual.blocks.{i}.norm1.weight"] = np.asarray(b["norm1"][i])
        sd[f"visual.blocks.{i}.norm2.weight"] = np.asarray(b["norm2"][i])
        sd[f"visual.blocks.{i}.attn.qkv.weight"] = T(b["qkv"]["kernel"][i])
        sd[f"visual.blocks.{i}.attn.qkv.bias"] = np.asarray(b["qkv"]["bias"][i])
        sd[f"visual.blocks.{i}.attn.proj.weight"] = T(b["proj"]["kernel"][i])
        sd[f"visual.blocks.{i}.attn.proj.bias"] = np.asarray(b["proj"]["bias"][i])
        for name, proj in (("gate", "gate_proj"), ("up", "up_proj"), ("down", "down_proj")):
            sd[f"visual.blocks.{i}.mlp.{proj}.weight"] = T(b["mlp"][name]["kernel"][i])
            sd[f"visual.blocks.{i}.mlp.{proj}.bias"] = np.asarray(b["mlp"][name]["bias"][i])
    sd["visual.merger.ln_q.weight"] = np.asarray(vis["merger"]["ln_q"])
    sd["visual.merger.mlp.0.weight"] = T(vis["merger"]["fc1"]["kernel"])
    sd["visual.merger.mlp.0.bias"] = np.asarray(vis["merger"]["fc1"]["bias"])
    sd["visual.merger.mlp.2.weight"] = T(vis["merger"]["fc2"]["kernel"])
    sd["visual.merger.mlp.2.bias"] = np.asarray(vis["merger"]["fc2"]["bias"])

    sd["model.embed_tokens.weight"] = np.asarray(txt["embed_tokens"])
    lay = txt["layers"]
    for i in range(tc.num_layers):
        sd[f"model.layers.{i}.input_layernorm.weight"] = np.asarray(lay["input_layernorm"][i])
        for p in ("q", "k", "v"):
            sd[f"model.layers.{i}.self_attn.{p}_proj.weight"] = T(lay[f"{p}_proj"]["kernel"][i])
            sd[f"model.layers.{i}.self_attn.{p}_proj.bias"] = np.asarray(lay[f"{p}_proj"]["bias"][i])
        sd[f"model.layers.{i}.self_attn.o_proj.weight"] = T(lay["o_proj"]["kernel"][i])
        sd[f"model.layers.{i}.post_attention_layernorm.weight"] = np.asarray(
            lay["post_attention_layernorm"][i]
        )
        for p in ("gate", "up", "down"):
            sd[f"model.layers.{i}.mlp.{p}_proj.weight"] = T(lay[f"{p}_proj"]["kernel"][i])
    sd["model.norm.weight"] = np.asarray(txt["final_layernorm"])
    return sd


def test_qwen_adaptor_end_to_end(tmp_path, rng):
    from llava_reward_tpu.evalx.adaptor import load_reward_adaptor

    cfg = qwen_tiny_config(num_layers=2, vision_depth=2)
    params = jax.device_get(qwen25_vl.init_params(jax.random.PRNGKey(0), cfg))
    base = tmp_path / "base"
    os.makedirs(base)
    save_torch_state_dict(
        _qwen_hf_sd(params, cfg), str(base / "pytorch_model.bin"), torch.float32
    )
    tc, vc = cfg.text, cfg.vision
    with open(base / "config.json", "w") as f:
        json.dump(
            {
                "model_type": "qwen2_5_vl",
                "vocab_size": tc.vocab_size,
                "hidden_size": tc.hidden_size,
                "intermediate_size": tc.intermediate_size,
                "num_hidden_layers": tc.num_layers,
                "num_attention_heads": tc.num_heads,
                "num_key_value_heads": tc.num_kv_heads,
                "rms_norm_eps": tc.rms_norm_eps,
                "rope_theta": tc.rope_theta,
                "rope_scaling": {"type": "mrope", "mrope_section": list(tc.mrope_section)},
                "image_token_id": tc.image_token_id,
                "pad_token_id": tc.pad_token_id,
                "vision_config": {
                    "depth": vc.depth,
                    "hidden_size": vc.hidden_size,
                    "intermediate_size": vc.intermediate_size,
                    "num_heads": vc.num_heads,
                    "out_hidden_size": vc.out_hidden_size,
                    "fullatt_block_indexes": list(vc.fullatt_block_indexes),
                },
            },
            f,
        )

    rcfg = RewardConfig(is_general_preference=True, value_head_dim=2)
    head = jax.device_get(init_head_params(jax.random.PRNGKey(1), cfg, rcfg))
    lora = jax.tree_util.tree_map(
        lambda x: x + 0.02 if x.ndim == 3 else x,
        jax.device_get(init_lora(jax.random.PRNGKey(2), tc, 4, 8, targets=QWEN_TARGETS)),
    )
    pm = tmp_path / "pm"
    save_reward_artifact(
        str(pm), rcfg, head,
        lora_state=stacked_to_peft_state(lora, tc),
        lora_config=peft_adapter_config(4, 8, 0.05, targets=QWEN_TARGETS),
        torch_dtype=torch.float32,
    )

    adaptor = load_reward_adaptor(str(base), str(pm), model_type="qwen",
                                  ft_projector=False)
    assert adaptor.cfg.text.num_layers == 2
    assert adaptor.cfg.text.mrope_section == tuple(tc.mrope_section)

    # lora merged: kernels differ from the raw base (the adaptor fuses
    # q/k/v -> qkv_proj for the inference fast path; q is the first slice)
    lay = adaptor.params["backbone"]["text"]["layers"]
    assert "q_proj" not in lay and "qkv_proj" in lay
    merged_q = lay["qkv_proj"]["kernel"][..., : tc.q_size]
    assert not np.allclose(merged_q, params["text"]["layers"]["q_proj"]["kernel"])

    # forward works (text-only)
    from llava_reward_tpu.reward.model import RewardBatch, reward_forward

    adaptor.rcfg.layer_id = cfg.text.num_layers
    B, S = 2, 12
    pos1 = np.tile(np.arange(S, dtype=np.int32)[None], (B, 1))
    batch = RewardBatch(
        input_ids=jnp.asarray(rng.integers(2, 100, (B, S)).astype(np.int32)),
        attention_mask=jnp.asarray(np.ones((B, S), np.int32)),
        pixel_values=None, img_gather_idx=None, splice_idx=None,
        num_img_tokens=None,
        position_ids=jnp.asarray(np.stack([pos1, pos1, pos1])),
    )
    r = reward_forward(
        adaptor.params, adaptor.cfg, adaptor.rcfg, batch,
        training=False, attn_impl="xla",
    ).reward
    assert r.shape == (B, 2) and np.all(np.isfinite(np.asarray(r)))

    # --load_in_8bit: the decoder carries w8a8 leaves, the vision tower
    # stays bf16 (tower-level chained timing: the qkv/gate/up mix LOSES —
    # PERF.md int8 ledger, scratch/probe_qwen_int8.py), and text-only
    # scores stay close to the f32 load
    from llava_reward_tpu.utils.quantize import is_w8a8

    a_q = load_reward_adaptor(str(base), str(pm), model_type="qwen",
                              ft_projector=False, quantize="w8a8",
                              quantize_min_size=0)
    a_q.rcfg.layer_id = cfg.text.num_layers
    lay_q = a_q.params["backbone"]["text"]["layers"]
    assert is_w8a8(lay_q["qkv_proj"]["kernel"])
    assert is_w8a8(lay_q["gate_up_proj"]["kernel"])
    assert is_w8a8(lay_q["down_proj"]["kernel"])
    blocks_q = a_q.params["backbone"]["visual"]["blocks"]
    assert not is_w8a8(blocks_q["qkv"]["kernel"])
    assert not is_w8a8(blocks_q["mlp"]["gate"]["kernel"])
    r_q = reward_forward(
        a_q.params, a_q.cfg, a_q.rcfg, batch, training=False, attn_impl="xla",
    ).reward
    np.testing.assert_allclose(np.asarray(r_q), np.asarray(r), atol=0.05)
