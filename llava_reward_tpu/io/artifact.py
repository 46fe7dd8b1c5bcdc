"""The public reward-checkpoint contract, read/written unchanged.

Artifact layout (reference deepspeed.py:333-417, consumed by
eval/reward_adaptor_loader.py:24-152 and published on HF):

  pm_path/
    pytorch_model.bin      filtered dict: value_head.*, W_q/W_k/W_v.*,
                           ca_layernorm.*, and the projector keys
                           (img_projection for phi3v)
    lora/                  PEFT adapter: adapter_config.json +
                           adapter_model.bin|safetensors
    reward_config.yaml     {general_preference_tau, value_head_dim,
                            add_cross_attention, is_general_preference}

Loader key quirks reproduced (reward_adaptor_loader.py:46-63): value_head /
W_q / W_k / W_v / ca_layernorm keys are re-keyed by their LAST path
component; the projector by the last TWO components.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np
import yaml

from ..core.config import Phi3VConfig, RewardConfig
from .torch_io import load_torch_state_dict, save_torch_state_dict


def load_reward_config(pm_path: str) -> RewardConfig:
    with open(os.path.join(pm_path, "reward_config.yaml")) as f:
        return RewardConfig.from_contract_dict(yaml.safe_load(f))


def save_reward_config(pm_path: str, rcfg: RewardConfig) -> None:
    os.makedirs(pm_path, exist_ok=True)
    with open(os.path.join(pm_path, "reward_config.yaml"), "w") as f:
        yaml.safe_dump(rcfg.to_contract_dict(), f)


def _t(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x).T)


# substrings the reference's loader re-keys by (reward_adaptor_loader.py:
# 46-63 heads, :98-110 qwen merger, :143-148 llava projector); any other key
# in pytorch_model.bin means drift the loader would silently drop
_ARTIFACT_KEY_FAMILIES = (
    "value_head", "W_q", "W_k", "W_v", "ca_layernorm", "prompt_head",
    "img_projection", "merger", "multi_modal_projector",
)


def check_artifact_keys(pm_path: str, *, strict: bool = True) -> list:
    """Flag pytorch_model.bin keys no loader family matches. Returns them."""
    sd = load_torch_state_dict(os.path.join(pm_path, "pytorch_model.bin"))
    extra = sorted(
        k for k in sd if not any(f in k for f in _ARTIFACT_KEY_FAMILIES)
    )
    if not extra:
        return []
    shown = ", ".join(extra[:12]) + (" ..." if len(extra) > 12 else "")
    msg = (
        f"{len(extra)} unrecognised key(s) in {pm_path}/pytorch_model.bin: "
        f"[{shown}] — the adaptor loader would silently drop these weights. "
        "Pass strict=False to downgrade this to a warning."
    )
    if strict:
        raise ValueError(msg)
    from ..core.logging import init_logger

    init_logger(__name__).warning(msg)
    return extra


def load_head_params(pm_path: str, rcfg: RewardConfig, dtype=np.float32) -> dict:
    """pytorch_model.bin -> head param tree (reward/model.py layout)."""
    sd = load_torch_state_dict(os.path.join(pm_path, "pytorch_model.bin"))

    def last(key_sub):
        return {k.split(".")[-1]: v for k, v in sd.items() if key_sub in k}

    head: dict = {}
    vh = last("value_head")
    head["value_head"] = {"kernel": _t(vh["weight"].astype(dtype))}
    if rcfg.add_cross_attention:
        head["skipca"] = {
            "W_q": {"kernel": _t(last("W_q")["weight"].astype(dtype))},
            "W_k": {"kernel": _t(last("W_k")["weight"].astype(dtype))},
            "W_v": {"kernel": _t(last("W_v")["weight"].astype(dtype))},
            "ca_layernorm": {"weight": last("ca_layernorm")["weight"].astype(dtype)},
        }
    ph = last("prompt_head")
    if ph:
        head["prompt_head"] = {"kernel": _t(ph["weight"].astype(dtype))}
    return head


def load_projector_params(pm_path: str, dtype=np.float32) -> Optional[dict]:
    """img_projection weights from the artifact (ft_projector mode;
    reward_adaptor_loader.py:59-60). Returns a phi3v 'img_projection' subtree
    or None if absent."""
    sd = load_torch_state_dict(os.path.join(pm_path, "pytorch_model.bin"))
    proj = {".".join(k.split(".")[-2:]): v for k, v in sd.items() if "img_projection" in k}
    if not proj:
        return None
    return {
        "fc1": {"kernel": _t(proj["0.weight"].astype(dtype)), "bias": proj["0.bias"].astype(dtype)},
        "fc2": {"kernel": _t(proj["2.weight"].astype(dtype)), "bias": proj["2.bias"].astype(dtype)},
    }


def load_qwen_merger_params(pm_path: str, dtype=np.float32) -> Optional[dict]:
    """Qwen merger (ft_projector) weights from the artifact, matching the
    loader's re-keying (reward_adaptor_loader.py:98-110: last two path parts
    of 'merger' keys -> ln_q.weight / mlp.{0,2}.{weight,bias})."""
    sd = load_torch_state_dict(os.path.join(pm_path, "pytorch_model.bin"))
    proj = {".".join(k.split(".")[-2:]): v for k, v in sd.items() if "merger" in k}
    if not proj:
        return None
    return {
        "ln_q": proj["ln_q.weight"].astype(dtype),
        "fc1": {"kernel": _t(proj["0.weight"].astype(dtype)), "bias": proj["0.bias"].astype(dtype)},
        "fc2": {"kernel": _t(proj["2.weight"].astype(dtype)), "bias": proj["2.bias"].astype(dtype)},
    }


def load_llava_projector_params(pm_path: str, dtype=np.float32) -> Optional[dict]:
    """LLaVA multi_modal_projector weights from the artifact
    (reward_adaptor_loader.py:143-148: re-keyed to linear_{1,2})."""
    sd = load_torch_state_dict(os.path.join(pm_path, "pytorch_model.bin"))
    proj = {
        ".".join(k.split(".")[-2:]): v
        for k, v in sd.items()
        if "multi_modal_projector" in k
    }
    if not proj:
        return None
    return {
        "fc1": {
            "kernel": _t(proj["linear_1.weight"].astype(dtype)),
            "bias": proj["linear_1.bias"].astype(dtype),
        },
        "fc2": {
            "kernel": _t(proj["linear_2.weight"].astype(dtype)),
            "bias": proj["linear_2.bias"].astype(dtype),
        },
    }


def projector_state_dict(projector_params: dict, model_type: str) -> Dict[str, np.ndarray]:
    """Family-specific torch keys for a trained projector, matching what the
    reference's save_model_lora filter would capture (deepspeed.py:343-357)
    and its loader's re-keying expects (reward_adaptor_loader.py:98-110 qwen
    'merger' last-two-parts, :143-148 llava 'multi_modal_projector')."""
    if model_type == "phi3v":
        return {
            "model.vision_embed_tokens.img_projection.0.weight": _t(projector_params["fc1"]["kernel"]),
            "model.vision_embed_tokens.img_projection.0.bias": np.asarray(projector_params["fc1"]["bias"]),
            "model.vision_embed_tokens.img_projection.2.weight": _t(projector_params["fc2"]["kernel"]),
            "model.vision_embed_tokens.img_projection.2.bias": np.asarray(projector_params["fc2"]["bias"]),
        }
    if model_type == "qwen":
        return {
            "visual.merger.ln_q.weight": np.asarray(projector_params["ln_q"]),
            "visual.merger.mlp.0.weight": _t(projector_params["fc1"]["kernel"]),
            "visual.merger.mlp.0.bias": np.asarray(projector_params["fc1"]["bias"]),
            "visual.merger.mlp.2.weight": _t(projector_params["fc2"]["kernel"]),
            "visual.merger.mlp.2.bias": np.asarray(projector_params["fc2"]["bias"]),
        }
    if model_type == "llava":
        return {
            "multi_modal_projector.linear_1.weight": _t(projector_params["fc1"]["kernel"]),
            "multi_modal_projector.linear_1.bias": np.asarray(projector_params["fc1"]["bias"]),
            "multi_modal_projector.linear_2.weight": _t(projector_params["fc2"]["kernel"]),
            "multi_modal_projector.linear_2.bias": np.asarray(projector_params["fc2"]["bias"]),
        }
    raise ValueError(f"unknown model_type {model_type!r}")


def save_reward_artifact(
    pm_path: str,
    rcfg: RewardConfig,
    head_params: dict,
    projector_params: Optional[dict] = None,
    lora_state: Optional[Dict[str, np.ndarray]] = None,
    lora_config: Optional[dict] = None,
    torch_dtype=None,
    model_type: str = "phi3v",
) -> None:
    """Write the full artifact so the REFERENCE loader can consume it
    (deepspeed.py:343-417 key naming)."""
    import json

    os.makedirs(pm_path, exist_ok=True)
    sd: Dict[str, np.ndarray] = {}
    sd["value_head.weight"] = _t(head_params["value_head"]["kernel"])
    if "skipca" in head_params:
        sk = head_params["skipca"]
        sd["W_q.weight"] = _t(sk["W_q"]["kernel"])
        sd["W_k.weight"] = _t(sk["W_k"]["kernel"])
        sd["W_v.weight"] = _t(sk["W_v"]["kernel"])
        sd["ca_layernorm.weight"] = np.asarray(sk["ca_layernorm"]["weight"])
    if "prompt_head" in head_params:
        sd["prompt_head.weight"] = _t(head_params["prompt_head"]["kernel"])
    if projector_params is not None:
        sd.update(projector_state_dict(projector_params, model_type))
    if torch_dtype is None:
        import torch

        torch_dtype = torch.bfloat16
    save_torch_state_dict(sd, os.path.join(pm_path, "pytorch_model.bin"), torch_dtype)
    save_reward_config(pm_path, rcfg)
    if lora_state is not None:
        lora_dir = os.path.join(pm_path, "lora")
        os.makedirs(lora_dir, exist_ok=True)
        save_torch_state_dict(
            lora_state, os.path.join(lora_dir, "adapter_model.bin"), torch_dtype
        )
        with open(os.path.join(lora_dir, "adapter_config.json"), "w") as f:
            json.dump(lora_config or {}, f, indent=2)
