"""Cross-ecosystem compatibility: the real PEFT package must parse our
exported adapter artifacts (so the reference's model.load_adapter consumes
them, reward_adaptor_loader.py:44-45)."""

import os

import numpy as np
import pytest
import torch

import jax

from llava_reward_tpu.core.config import RewardConfig, phi3v_tiny_config
from llava_reward_tpu.io.artifact import save_reward_artifact
from llava_reward_tpu.lora.lora import (
    init_lora,
    peft_adapter_config,
    stacked_to_peft_state,
)
from llava_reward_tpu.reward import init_head_params


def test_peft_parses_exported_adapter(tmp_path):
    peft = pytest.importorskip("peft")

    cfg = phi3v_tiny_config()
    rcfg = RewardConfig(is_general_preference=True, value_head_dim=2)
    head = jax.device_get(init_head_params(jax.random.PRNGKey(0), cfg, rcfg))
    lora = jax.device_get(init_lora(jax.random.PRNGKey(1), cfg.decoder, 4, 8))
    save_reward_artifact(
        str(tmp_path), rcfg, head,
        lora_state=stacked_to_peft_state(lora, cfg.decoder),
        lora_config=peft_adapter_config(4, 8, 0.05),
        torch_dtype=torch.float32,
    )

    pc = peft.LoraConfig.from_pretrained(os.path.join(str(tmp_path), "lora"))
    assert pc.r == 4 and pc.lora_alpha == 8.0
    assert set(pc.target_modules) == {
        "qkv_proj", "o_proj", "gate_up_proj", "down_proj"
    }
    sd = torch.load(
        os.path.join(str(tmp_path), "lora", "adapter_model.bin"), weights_only=True
    )
    # PEFT's on-disk key format
    assert all(k.startswith("base_model.model.model.layers.") for k in sd)
    assert any(k.endswith(".lora_A.weight") for k in sd)
    a = sd["base_model.model.model.layers.0.self_attn.qkv_proj.lora_A.weight"]
    assert a.shape == (4, cfg.decoder.hidden_size)  # PEFT (r, in) orientation
