"""LLaVA adaptor loader E2E: synthetic base checkpoint + artifact."""

import json
import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from llava_reward_tpu.core.config import RewardConfig, llava_tiny_config
from llava_reward_tpu.io.artifact import save_reward_artifact
from llava_reward_tpu.io.torch_io import save_torch_state_dict
from llava_reward_tpu.models import llava_next
from llava_reward_tpu.reward import init_head_params


def _llava_hf_sd(params, cfg):
    """Our tree -> HF LlavaNext state dict (inverse of io/hf_llava.py)."""
    sd = {}
    T = lambda x: np.ascontiguousarray(np.asarray(x).T)
    vis, txt = params["vision"], params["text"]
    tc, vc = cfg.text, cfg.vision

    c = "vision_tower.vision_model"
    clip = vis["clip"]
    P, C, H = vc.patch_size, vc.num_channels, vc.hidden_size
    sd[f"{c}.embeddings.class_embedding"] = np.asarray(clip["class_embedding"])
    sd[f"{c}.embeddings.patch_embedding.weight"] = np.asarray(
        clip["patch_proj"]
    ).reshape(P, P, C, H).transpose(3, 2, 0, 1)
    sd[f"{c}.embeddings.position_embedding.weight"] = np.asarray(
        clip["position_embedding"]
    )
    sd[f"{c}.pre_layrnorm.weight"] = np.asarray(clip["pre_layernorm"]["weight"])
    sd[f"{c}.pre_layrnorm.bias"] = np.asarray(clip["pre_layernorm"]["bias"])
    for i in range(vc.num_layers):
        L = clip["layers"]
        sd[f"{c}.encoder.layers.{i}.layer_norm1.weight"] = np.asarray(L["ln1"]["weight"][i])
        sd[f"{c}.encoder.layers.{i}.layer_norm1.bias"] = np.asarray(L["ln1"]["bias"][i])
        sd[f"{c}.encoder.layers.{i}.layer_norm2.weight"] = np.asarray(L["ln2"]["weight"][i])
        sd[f"{c}.encoder.layers.{i}.layer_norm2.bias"] = np.asarray(L["ln2"]["bias"][i])
        for name, proj in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"), ("out", "out_proj")):
            sd[f"{c}.encoder.layers.{i}.self_attn.{proj}.weight"] = T(L["attn"][name]["kernel"][i])
            sd[f"{c}.encoder.layers.{i}.self_attn.{proj}.bias"] = np.asarray(L["attn"][name]["bias"][i])
        sd[f"{c}.encoder.layers.{i}.mlp.fc1.weight"] = T(L["mlp"]["fc1"]["kernel"][i])
        sd[f"{c}.encoder.layers.{i}.mlp.fc1.bias"] = np.asarray(L["mlp"]["fc1"]["bias"][i])
        sd[f"{c}.encoder.layers.{i}.mlp.fc2.weight"] = T(L["mlp"]["fc2"]["kernel"][i])
        sd[f"{c}.encoder.layers.{i}.mlp.fc2.bias"] = np.asarray(L["mlp"]["fc2"]["bias"][i])
    sd[f"{c}.post_layernorm.weight"] = np.asarray(clip["post_layernorm"]["weight"])
    sd[f"{c}.post_layernorm.bias"] = np.asarray(clip["post_layernorm"]["bias"])

    sd["multi_modal_projector.linear_1.weight"] = T(vis["projector"]["fc1"]["kernel"])
    sd["multi_modal_projector.linear_1.bias"] = np.asarray(vis["projector"]["fc1"]["bias"])
    sd["multi_modal_projector.linear_2.weight"] = T(vis["projector"]["fc2"]["kernel"])
    sd["multi_modal_projector.linear_2.bias"] = np.asarray(vis["projector"]["fc2"]["bias"])
    sd["image_newline"] = np.asarray(vis["image_newline"])

    lay = txt["layers"]
    for i in range(tc.num_layers):
        pre = f"language_model.model.layers.{i}"
        sd[f"{pre}.input_layernorm.weight"] = np.asarray(lay["input_layernorm"][i])
        for p in ("q", "k", "v", "o"):
            sd[f"{pre}.self_attn.{p}_proj.weight"] = T(lay[f"{p}_proj"]["kernel"][i])
        sd[f"{pre}.post_attention_layernorm.weight"] = np.asarray(
            lay["post_attention_layernorm"][i]
        )
        for p in ("gate", "up", "down"):
            sd[f"{pre}.mlp.{p}_proj.weight"] = T(lay[f"{p}_proj"]["kernel"][i])
    sd["language_model.model.embed_tokens.weight"] = np.asarray(txt["embed_tokens"])
    sd["language_model.model.norm.weight"] = np.asarray(txt["final_layernorm"])
    return sd


def test_llava_adaptor_end_to_end(tmp_path, rng):
    from llava_reward_tpu.evalx.adaptor import load_reward_adaptor

    cfg = llava_tiny_config(num_layers=2, vision_layers=2)
    params = jax.device_get(llava_next.init_params(jax.random.PRNGKey(0), cfg))
    base = tmp_path / "base"
    os.makedirs(base)
    save_torch_state_dict(
        _llava_hf_sd(params, cfg), str(base / "pytorch_model.bin"), torch.float32
    )
    tc, vc = cfg.text, cfg.vision
    with open(base / "config.json", "w") as f:
        json.dump(
            {
                "model_type": "llava_next",
                "image_token_index": tc.image_token_id,
                "image_grid_pinpoints": [list(p) for p in cfg.grid_pinpoints],
                "text_config": {
                    "vocab_size": tc.vocab_size,
                    "hidden_size": tc.hidden_size,
                    "intermediate_size": tc.intermediate_size,
                    "num_hidden_layers": tc.num_layers,
                    "num_attention_heads": tc.num_heads,
                    "num_key_value_heads": tc.num_kv_heads,
                    "rms_norm_eps": tc.rms_norm_eps,
                    "pad_token_id": tc.pad_token_id,
                },
                "vision_config": {
                    "hidden_size": vc.hidden_size,
                    "intermediate_size": vc.intermediate_size,
                    "num_hidden_layers": vc.num_layers,
                    "num_attention_heads": vc.num_heads,
                    "image_size": vc.image_size,
                    "patch_size": vc.patch_size,
                },
            },
            f,
        )

    rcfg = RewardConfig(is_general_preference=True, value_head_dim=2)
    head = jax.device_get(init_head_params(jax.random.PRNGKey(1), cfg, rcfg))
    pm = tmp_path / "pm"
    save_reward_artifact(str(pm), rcfg, head, torch_dtype=torch.float32)

    adaptor = load_reward_adaptor(
        str(base), str(pm), model_type="llava", ft_projector=False
    )
    assert adaptor.cfg.text.num_layers == 2
    np.testing.assert_allclose(
        adaptor.params["backbone"]["vision"]["image_newline"],
        params["vision"]["image_newline"],
    )

    # forward works with an image through the anyres path
    from PIL import Image

    from llava_reward_tpu.preprocess.collate import collate_samples, to_reward_batch
    from llava_reward_tpu.preprocess.llava_processor import LlavaNextProcessor
    from llava_reward_tpu.reward.model import reward_forward

    class Tok:
        def __call__(self, text):
            return {
                "input_ids": [
                    tc.image_token_id if t == "<image>" else hash(t) % 300 + 3
                    for t in text.split()
                ]
            }

    proc = LlavaNextProcessor(
        Tok(), image_token_id=tc.image_token_id, grid_pinpoints=cfg.grid_pinpoints
    )
    img = Image.fromarray((rng.random((200, 300, 3)) * 255).astype(np.uint8))
    s = proc("<image> a scene", [img])
    rb = to_reward_batch(collate_samples([s], len(s.input_ids) + 4, 0))
    adaptor.rcfg.layer_id = tc.num_layers
    r = reward_forward(
        adaptor.params, adaptor.cfg, adaptor.rcfg, rb, training=False, attn_impl="xla"
    ).reward
    assert r.shape == (1, 2) and np.all(np.isfinite(np.asarray(r)))
