"""HF LlavaNext checkpoint -> our param tree.

Key layout (HF LlavaNextForConditionalGeneration; both 'language_model.model.'
and 'model.language_model.' generations accepted):
  vision_tower.vision_model.*            CLIP (same structure as phi3v's)
  multi_modal_projector.linear_{1,2}.{weight,bias}
  image_newline
  language_model.model.layers.{i}.self_attn.{q,k,v,o}_proj.weight
  language_model.model.layers.{i}.mlp.{gate,up,down}_proj.weight
  language_model.model.{embed_tokens.weight, norm.weight}
  language_model.lm_head.weight
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..core.config import LlavaNextConfig


def _t(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(x.T)


def _normalise_keys(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        for pre in ("model.", ""):
            if k.startswith(pre + "language_model.model."):
                k = "lm." + k[len(pre + "language_model.model."):]
                break
            if k.startswith(pre + "language_model."):
                k = k[len(pre + "language_model."):]
                if not k.startswith("lm_head"):
                    k = "lm." + k
                break
        k = k.replace("model.vision_tower.", "vision_tower.")
        k = k.replace("model.multi_modal_projector.", "multi_modal_projector.")
        k = k.replace("model.image_newline", "image_newline")
        out[k] = v
    return out


def params_from_hf_state_dict(
    sd: Dict[str, np.ndarray], cfg: LlavaNextConfig, dtype=np.float32,
    strict: bool = True, ignore_head_keys: bool = False,
) -> dict:
    from .torch_io import TrackedStateDict, check_fully_consumed

    sd = TrackedStateDict(_normalise_keys(sd))
    tc, vc = cfg.text, cfg.vision

    def get(k):
        return sd[k].astype(dtype)

    def tstack(fmt, transform=lambda x: x):
        return np.stack(
            [transform(get(fmt.format(i=i))) for i in range(tc.num_layers)]
        )

    c = "vision_tower.vision_model"
    patch = get(f"{c}.embeddings.patch_embedding.weight")  # (out, C, P, P)
    patch_proj = np.ascontiguousarray(
        patch.transpose(2, 3, 1, 0).reshape(-1, patch.shape[0])
    )

    def clip_stacked(sub, transform=lambda x: x):
        return np.stack(
            [transform(get(f"{c}.encoder.layers.{i}.{sub}")) for i in range(vc.num_layers)]
        )

    # CLIP uses 'pre_layrnorm' (typo preserved on disk by HF)
    pre_key = (
        f"{c}.pre_layrnorm" if f"{c}.pre_layrnorm.weight" in sd else f"{c}.pre_layernorm"
    )
    clip = {
        "class_embedding": get(f"{c}.embeddings.class_embedding").reshape(-1),
        "patch_proj": patch_proj,
        "position_embedding": get(f"{c}.embeddings.position_embedding.weight"),
        "pre_layernorm": {
            "weight": get(f"{pre_key}.weight"),
            "bias": get(f"{pre_key}.bias"),
        },
        "layers": {
            "ln1": {
                "weight": clip_stacked("layer_norm1.weight"),
                "bias": clip_stacked("layer_norm1.bias"),
            },
            "ln2": {
                "weight": clip_stacked("layer_norm2.weight"),
                "bias": clip_stacked("layer_norm2.bias"),
            },
            "attn": {
                name: {
                    "kernel": clip_stacked(f"self_attn.{proj}.weight", _t),
                    "bias": clip_stacked(f"self_attn.{proj}.bias"),
                }
                for name, proj in (
                    ("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"), ("out", "out_proj"),
                )
            },
            "mlp": {
                "fc1": {
                    "kernel": clip_stacked("mlp.fc1.weight", _t),
                    "bias": clip_stacked("mlp.fc1.bias"),
                },
                "fc2": {
                    "kernel": clip_stacked("mlp.fc2.weight", _t),
                    "bias": clip_stacked("mlp.fc2.bias"),
                },
            },
        },
        "post_layernorm": {
            "weight": get(f"{c}.post_layernorm.weight"),
            "bias": get(f"{c}.post_layernorm.bias"),
        },
    }

    text = {
        "embed_tokens": get("lm.embed_tokens.weight"),
        "layers": {
            "input_layernorm": tstack("lm.layers.{i}.input_layernorm.weight"),
            "q_proj": {"kernel": tstack("lm.layers.{i}.self_attn.q_proj.weight", _t)},
            "k_proj": {"kernel": tstack("lm.layers.{i}.self_attn.k_proj.weight", _t)},
            "v_proj": {"kernel": tstack("lm.layers.{i}.self_attn.v_proj.weight", _t)},
            "o_proj": {"kernel": tstack("lm.layers.{i}.self_attn.o_proj.weight", _t)},
            "post_attention_layernorm": tstack(
                "lm.layers.{i}.post_attention_layernorm.weight"
            ),
            "gate_proj": {"kernel": tstack("lm.layers.{i}.mlp.gate_proj.weight", _t)},
            "up_proj": {"kernel": tstack("lm.layers.{i}.mlp.up_proj.weight", _t)},
            "down_proj": {"kernel": tstack("lm.layers.{i}.mlp.down_proj.weight", _t)},
        },
        "final_layernorm": get("lm.norm.weight"),
    }

    tree = {
        "vision": {
            "clip": clip,
            "projector": {
                "fc1": {
                    "kernel": _t(get("multi_modal_projector.linear_1.weight")),
                    "bias": get("multi_modal_projector.linear_1.bias"),
                },
                "fc2": {
                    "kernel": _t(get("multi_modal_projector.linear_2.weight")),
                    "bias": get("multi_modal_projector.linear_2.bias"),
                },
            },
            "image_newline": get("image_newline").reshape(-1),
        },
        "text": text,
    }
    if "lm_head.weight" in sd:
        tree["lm_head"] = _t(get("lm_head.weight"))
    from .torch_io import REWARD_HEAD_PATTERNS

    check_fully_consumed(
        sd, strict=strict, what="llava base checkpoint",
        ignore=REWARD_HEAD_PATTERNS if ignore_head_keys else (),
    )
    return tree
