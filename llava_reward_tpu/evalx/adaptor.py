"""Public inference API: reconstruct a reward model from base HF weights +
the published reward artifact (pm_path), exactly the contract of
eval/reward_adaptor_loader.py:24-152.

Steps (phi3v): read reward_config.yaml -> build config from the base
checkpoint's config.json -> load base weights -> MERGE the PEFT LoRA
adapter into the stacked decoder weights (zero per-step overhead, unlike
the reference's runtime adapter hooks) -> load value_head / SkipCA /
projector from pytorch_model.bin with the loader's re-keying quirks.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any, Optional

import numpy as np

from ..core.config import (
    DecoderConfig,
    Phi3VConfig,
    RewardConfig,
    RopeScalingConfig,
    VisionConfig,
    phi35_vision_config,
)
from ..io.artifact import (
    load_head_params,
    load_projector_params,
    load_reward_config,
)
from ..io.hf_phi3v import params_from_hf_state_dict
from ..io.torch_io import load_torch_state_dict
from ..lora.lora import merge_lora, peft_state_to_stacked


def decoder_config_from_hf_json(cfg_json: dict) -> DecoderConfig:
    """Phi3V config.json -> DecoderConfig (configuration_phi3_v.py:120-217)."""
    scaling = None
    rs = cfg_json.get("rope_scaling")
    if rs:
        scaling = RopeScalingConfig(
            rope_type=rs.get("type", "su"),
            short_factor=tuple(rs["short_factor"]),
            long_factor=tuple(rs["long_factor"]),
        )
    return DecoderConfig(
        vocab_size=cfg_json.get("vocab_size", 32064),
        hidden_size=cfg_json.get("hidden_size", 3072),
        intermediate_size=cfg_json.get("intermediate_size", 8192),
        num_layers=cfg_json.get("num_hidden_layers", 32),
        num_heads=cfg_json.get("num_attention_heads", 32),
        num_kv_heads=cfg_json.get("num_key_value_heads", 32),
        rms_norm_eps=cfg_json.get("rms_norm_eps", 1e-5),
        rope_theta=cfg_json.get("rope_theta", 10000.0),
        max_position_embeddings=cfg_json.get("max_position_embeddings", 131072),
        original_max_position_embeddings=cfg_json.get(
            "original_max_position_embeddings", 4096
        ),
        rope_scaling=scaling,
        sliding_window=cfg_json.get("sliding_window"),
        pad_token_id=cfg_json.get("pad_token_id", 32000),
        eos_token_id=cfg_json.get("eos_token_id", 32000),
    )


def _infer_vision_geometry(cfg: Phi3VConfig, sd: dict) -> Phi3VConfig:
    """The CLIP tower is hard-coded in the reference (modeling_phi3_v.py:68)
    and absent from config.json; read its true geometry off the weights so
    tiny/synthetic checkpoints load too."""
    import dataclasses
    import re as _re

    prefix = "model.vision_embed_tokens.img_processor.vision_model"
    layer_ids = {
        int(m.group(1))
        for k in sd
        for m in [_re.match(rf"{_re.escape(prefix)}\.encoder\.layers\.(\d+)\.", k)]
        if m
    }
    if not layer_ids:
        return cfg
    n_layers = max(layer_ids) + 1
    hidden = sd[f"{prefix}.embeddings.class_embedding"].reshape(-1).shape[0]
    inter = sd[f"{prefix}.encoder.layers.0.mlp.fc1.weight"].shape[0]
    vision = dataclasses.replace(
        cfg.vision, num_layers=n_layers, hidden_size=hidden, intermediate_size=inter
    )
    return dataclasses.replace(cfg, vision=vision, image_dim_out=hidden)


def phi3v_config_from_pretrain(pretrain: str) -> Phi3VConfig:
    cfg_path = os.path.join(pretrain, "config.json")
    if not os.path.exists(cfg_path):
        return phi35_vision_config()
    with open(cfg_path) as f:
        cj = json.load(f)
    return Phi3VConfig(decoder=decoder_config_from_hf_json(cj), vision=VisionConfig())


@dataclass
class RewardAdaptor:
    """Loaded model + configs; ``score(batch)`` is the jitted custom_forward."""

    cfg: Phi3VConfig
    rcfg: RewardConfig
    params: dict  # {'backbone': ..., 'head': ...} with LoRA merged
    model_type: str = "phi3v"

    def make_score_fn(self, attn_impl: str = "auto", training: bool = False):
        import jax

        from ..reward.model import reward_forward

        cfg, rcfg = self.cfg, self.rcfg

        @jax.jit
        def score(params, batch):
            return reward_forward(
                params, cfg, rcfg, batch, training=training, attn_impl=attn_impl
            ).reward

        return score


def load_reward_adaptor(
    pretrain: str,
    pm_path: str,
    model_type: str = "phi3v",
    dtype=np.float32,
    ft_projector: bool = True,
    compute_dtype=None,
) -> RewardAdaptor:
    """Rebuild the reward model from a base checkpoint dir + reward artifact.

    ``compute_dtype``: cast params for the device (e.g. jnp.bfloat16, the
    reference's torch_dtype=torch.bfloat16 at reward_adaptor_loader.py:36).
    """
    if model_type != "phi3v":
        raise NotImplementedError(
            f"model_type={model_type}: qwen/llava backbones land with their "
            "model implementations"
        )
    rcfg = load_reward_config(pm_path)
    cfg = phi3v_config_from_pretrain(pretrain)

    sd = load_torch_state_dict(pretrain)
    cfg = _infer_vision_geometry(cfg, sd)
    backbone = params_from_hf_state_dict(sd, cfg, dtype=dtype)

    # LoRA: merge-at-load (reference: load_adapter + enable_adapters,
    # reward_adaptor_loader.py:44-45)
    lora_dir = os.path.join(pm_path, "lora")
    if os.path.isdir(lora_dir):
        with open(os.path.join(lora_dir, "adapter_config.json")) as f:
            acfg = json.load(f)
        lora_sd = load_torch_state_dict(
            os.path.join(lora_dir, "adapter_model.bin")
            if os.path.exists(os.path.join(lora_dir, "adapter_model.bin"))
            else os.path.join(lora_dir, "adapter_model.safetensors")
        )
        targets = [
            t for t in ("qkv_proj", "o_proj", "gate_up_proj", "down_proj")
            if any(t in k for k in lora_sd)
        ]
        stacked = peft_state_to_stacked(
            lora_sd, cfg.decoder,
            alpha=float(acfg.get("lora_alpha", 1.0)),
            rank=int(acfg.get("r", 1)),
            targets=targets, dtype=dtype,
        )
        import jax.numpy as jnp

        backbone["decoder"]["layers"] = {
            k: np.asarray(v)
            for k, v in merge_lora(
                {k: jnp.asarray(v) for k, v in backbone["decoder"]["layers"].items()},
                {n: {kk: jnp.asarray(vv) for kk, vv in t.items()} for n, t in stacked.items()},
            ).items()
        }

    head = load_head_params(pm_path, rcfg, dtype=dtype)
    if ft_projector:
        proj = load_projector_params(pm_path, dtype=dtype)
        if proj is not None:
            backbone["vision"]["img_projection"] = proj

    params = {"backbone": backbone, "head": head}
    if compute_dtype is not None:
        import jax

        params = jax.tree_util.tree_map(
            lambda x: x.astype(compute_dtype)
            if np.issubdtype(np.asarray(x).dtype, np.floating)
            else x,
            params,
        )
    return RewardAdaptor(cfg=cfg, rcfg=rcfg, params=params, model_type=model_type)
