"""HF Qwen2.5-VL checkpoint <-> our param tree.

Key layout (HF Qwen2_5_VLForConditionalGeneration; both the 4.50-era
('visual.', 'model.') and newer ('model.visual.', 'model.language_model.')
prefixes are accepted):

  visual.patch_embed.proj.weight  (H, C, tps, ps, ps) -> (patch_dim, H)
  visual.blocks.{i}.{norm1,norm2}.weight
  visual.blocks.{i}.attn.qkv.{weight,bias}   (fused 3H)
  visual.blocks.{i}.attn.proj.{weight,bias}
  visual.blocks.{i}.mlp.{gate_proj,up_proj,down_proj}.{weight,bias}
  visual.merger.ln_q.weight, visual.merger.mlp.{0,2}.{weight,bias}
  model.embed_tokens.weight
  model.layers.{i}.self_attn.{q,k,v}_proj.{weight,bias}, o_proj.weight
  model.layers.{i}.mlp.{gate,up,down}_proj.weight
  model.layers.{i}.{input,post_attention}_layernorm.weight
  model.norm.weight, lm_head.weight
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..core.config import Qwen25VLConfig


def _t(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(x.T)


def _normalise_keys(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        k = k.replace("model.visual.", "visual.")
        k = k.replace("model.language_model.", "model.")
        k = k.replace("language_model.model.", "model.")
        out[k] = v
    return out


def params_from_hf_state_dict(
    sd: Dict[str, np.ndarray], cfg: Qwen25VLConfig, dtype=np.float32,
    strict: bool = True, ignore_head_keys: bool = False,
) -> dict:
    from .torch_io import TrackedStateDict, check_fully_consumed

    sd = TrackedStateDict(_normalise_keys(sd))
    vc, tc = cfg.vision, cfg.text

    def get(k):
        return sd[k].astype(dtype)

    def vstack(fmt, transform=lambda x: x):
        return np.stack(
            [transform(get(fmt.format(i=i))) for i in range(vc.depth)]
        )

    def tstack(fmt, transform=lambda x: x):
        return np.stack(
            [transform(get(fmt.format(i=i))) for i in range(tc.num_layers)]
        )

    patch = get("visual.patch_embed.proj.weight")  # (H, C, tps, ps, ps)
    patch_embed = np.ascontiguousarray(patch.reshape(patch.shape[0], -1).T)

    visual = {
        "patch_embed": patch_embed,
        "blocks": {
            "norm1": vstack("visual.blocks.{i}.norm1.weight"),
            "norm2": vstack("visual.blocks.{i}.norm2.weight"),
            "qkv": {
                "kernel": vstack("visual.blocks.{i}.attn.qkv.weight", _t),
                "bias": vstack("visual.blocks.{i}.attn.qkv.bias"),
            },
            "proj": {
                "kernel": vstack("visual.blocks.{i}.attn.proj.weight", _t),
                "bias": vstack("visual.blocks.{i}.attn.proj.bias"),
            },
            "mlp": {
                name: {
                    "kernel": vstack(f"visual.blocks.{{i}}.mlp.{proj}.weight", _t),
                    "bias": vstack(f"visual.blocks.{{i}}.mlp.{proj}.bias"),
                }
                for name, proj in (
                    ("gate", "gate_proj"), ("up", "up_proj"), ("down", "down_proj"),
                )
            },
        },
        "merger": {
            "ln_q": get("visual.merger.ln_q.weight"),
            "fc1": {
                "kernel": _t(get("visual.merger.mlp.0.weight")),
                "bias": get("visual.merger.mlp.0.bias"),
            },
            "fc2": {
                "kernel": _t(get("visual.merger.mlp.2.weight")),
                "bias": get("visual.merger.mlp.2.bias"),
            },
        },
    }

    text = {
        "embed_tokens": get("model.embed_tokens.weight"),
        "layers": {
            "input_layernorm": tstack("model.layers.{i}.input_layernorm.weight"),
            "q_proj": {
                "kernel": tstack("model.layers.{i}.self_attn.q_proj.weight", _t),
                "bias": tstack("model.layers.{i}.self_attn.q_proj.bias"),
            },
            "k_proj": {
                "kernel": tstack("model.layers.{i}.self_attn.k_proj.weight", _t),
                "bias": tstack("model.layers.{i}.self_attn.k_proj.bias"),
            },
            "v_proj": {
                "kernel": tstack("model.layers.{i}.self_attn.v_proj.weight", _t),
                "bias": tstack("model.layers.{i}.self_attn.v_proj.bias"),
            },
            "o_proj": {
                "kernel": tstack("model.layers.{i}.self_attn.o_proj.weight", _t)
            },
            "post_attention_layernorm": tstack(
                "model.layers.{i}.post_attention_layernorm.weight"
            ),
            "gate_proj": {"kernel": tstack("model.layers.{i}.mlp.gate_proj.weight", _t)},
            "up_proj": {"kernel": tstack("model.layers.{i}.mlp.up_proj.weight", _t)},
            "down_proj": {"kernel": tstack("model.layers.{i}.mlp.down_proj.weight", _t)},
        },
        "final_layernorm": get("model.norm.weight"),
    }

    tree = {"visual": visual, "text": text}
    if "lm_head.weight" in sd:
        tree["lm_head"] = _t(get("lm_head.weight"))
    from .torch_io import REWARD_HEAD_PATTERNS

    check_fully_consumed(
        sd, strict=strict, what="qwen base checkpoint",
        ignore=REWARD_HEAD_PATTERNS if ignore_head_keys else (),
    )
    return tree
