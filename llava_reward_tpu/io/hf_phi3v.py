"""HF Phi-3.5-vision checkpoint <-> our param tree.

Key mapping (HF microsoft/Phi-3.5-vision-instruct state-dict layout, which is
what the reference's vendored Phi3VForCausalLM produces/consumes —
modeling_phi3_v.py:1332-1742):

  model.embed_tokens.weight                         -> decoder.embed_tokens
  model.layers.{i}.input_layernorm.weight           -> stacked layers
  model.layers.{i}.self_attn.qkv_proj.weight        (fused, kept fused)
  model.layers.{i}.self_attn.o_proj.weight
  model.layers.{i}.post_attention_layernorm.weight
  model.layers.{i}.mlp.gate_up_proj.weight          (fused, kept fused)
  model.layers.{i}.mlp.down_proj.weight
  model.norm.weight                                 -> decoder.final_layernorm
  lm_head.weight                                    -> lm_head (optional)
  model.vision_embed_tokens.{glb_GN,sub_GN}
  model.vision_embed_tokens.img_projection.{0,2}.{weight,bias}
  model.vision_embed_tokens.img_processor.vision_model.*   (CLIP tower;
      note HF's 'pre_layrnorm' typo is preserved on disk)

All torch Linear weights are (out, in); ours are (in, out) so apply is
``x @ W`` — transposed at load/save. The CLIP patch conv (out, C, P, P) maps
to our (P*P*C, out) 'patch_proj' with flat order (ph, pw, C) to match the
reshape-based patchify (models/clip_vit.py).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..core.config import Phi3VConfig

_CLIP_PREFIX = "model.vision_embed_tokens.img_processor.vision_model"


def _t(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(x.T)


def params_from_hf_state_dict(
    sd: Dict[str, np.ndarray], cfg: Phi3VConfig, dtype=np.float32,
    strict: bool = True, ignore_head_keys: bool = False,
) -> dict:
    """Build the phi3v param tree (models/phi3v.py layout) from an HF state
    dict. Missing weights raise KeyError with context; keys the mapping never
    reads raise ValueError unless ``strict=False`` (then they log a warning) —
    mirroring strict load_state_dict (eval/reward_adaptor_loader.py:46-63).

    ``ignore_head_keys``: only the ft-phi full-checkpoint mode sets this (the
    artifact bin legitimately holds reward-head keys next to the backbone);
    a genuine separate base checkpoint keeps the strict check intact so stale
    head keys are flagged, not silently dropped (ADVICE r4)."""
    from .torch_io import TrackedStateDict, check_fully_consumed

    sd = TrackedStateDict(sd)
    L = cfg.decoder.num_layers
    VL = cfg.vision.num_layers

    def get(k):
        return sd[k].astype(dtype)

    def stack(fmt, transform=lambda x: x, n=L):
        return np.stack([transform(get(fmt.format(i=i))) for i in range(n)])

    decoder = {
        "embed_tokens": get("model.embed_tokens.weight"),
        "layers": {
            "input_layernorm": stack("model.layers.{i}.input_layernorm.weight"),
            "qkv_proj": stack("model.layers.{i}.self_attn.qkv_proj.weight", _t),
            "o_proj": stack("model.layers.{i}.self_attn.o_proj.weight", _t),
            "post_attention_layernorm": stack(
                "model.layers.{i}.post_attention_layernorm.weight"
            ),
            "gate_up_proj": stack("model.layers.{i}.mlp.gate_up_proj.weight", _t),
            "down_proj": stack("model.layers.{i}.mlp.down_proj.weight", _t),
        },
        "final_layernorm": get("model.norm.weight"),
    }

    c = _CLIP_PREFIX
    patch = get(f"{c}.embeddings.patch_embedding.weight")  # (out, C, P, P)
    # -> (P, P, C, out) -> (P*P*C, out): flat order (ph, pw, C) matches the
    # reshape-based patchify in models/clip_vit.py
    patch_proj = np.ascontiguousarray(
        patch.transpose(2, 3, 1, 0).reshape(-1, patch.shape[0])
    )

    def clip_stacked(sub, transform=lambda x: x):
        return np.stack(
            [transform(get(f"{c}.encoder.layers.{i}.{sub}")) for i in range(VL)]
        )

    clip = {
        "class_embedding": get(f"{c}.embeddings.class_embedding").reshape(-1),
        "patch_proj": patch_proj,
        "position_embedding": get(f"{c}.embeddings.position_embedding.weight"),
        "pre_layernorm": {
            "weight": get(f"{c}.pre_layrnorm.weight"),
            "bias": get(f"{c}.pre_layrnorm.bias"),
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

    vision = {
        "clip": clip,
        "glb_GN": get("model.vision_embed_tokens.glb_GN").reshape(-1),
        "sub_GN": get("model.vision_embed_tokens.sub_GN").reshape(-1),
        "img_projection": {
            "fc1": {
                "kernel": _t(get("model.vision_embed_tokens.img_projection.0.weight")),
                "bias": get("model.vision_embed_tokens.img_projection.0.bias"),
            },
            "fc2": {
                "kernel": _t(get("model.vision_embed_tokens.img_projection.2.weight")),
                "bias": get("model.vision_embed_tokens.img_projection.2.bias"),
            },
        },
    }

    tree = {"decoder": decoder, "vision": vision}
    if "lm_head.weight" in sd:
        tree["lm_head"] = _t(get("lm_head.weight"))
    # vision_embed_tokens.wte IS model.embed_tokens (the image embedder holds
    # the shared text embedding module, modeling_phi3_v.py:1355); checkpoints
    # serialize it as a duplicate key — already consumed via embed_tokens.
    from .torch_io import REWARD_HEAD_PATTERNS

    check_fully_consumed(
        sd, strict=strict, what="phi3v base checkpoint",
        ignore=(r"^model\.vision_embed_tokens\.wte\.weight$",)
        + (REWARD_HEAD_PATTERNS if ignore_head_keys else ()),
    )
    return tree


def hf_state_dict_from_params(params: dict, cfg: Phi3VConfig) -> Dict[str, np.ndarray]:
    """Inverse mapping for save_model-style full exports (deepspeed.py:277)."""
    sd: Dict[str, np.ndarray] = {}
    dec = params["decoder"]
    sd["model.embed_tokens.weight"] = np.asarray(dec["embed_tokens"])
    L = cfg.decoder.num_layers
    lay = dec["layers"]
    for i in range(L):
        sd[f"model.layers.{i}.input_layernorm.weight"] = np.asarray(
            lay["input_layernorm"][i]
        )
        sd[f"model.layers.{i}.self_attn.qkv_proj.weight"] = _t(
            np.asarray(lay["qkv_proj"][i])
        )
        sd[f"model.layers.{i}.self_attn.o_proj.weight"] = _t(np.asarray(lay["o_proj"][i]))
        sd[f"model.layers.{i}.post_attention_layernorm.weight"] = np.asarray(
            lay["post_attention_layernorm"][i]
        )
        sd[f"model.layers.{i}.mlp.gate_up_proj.weight"] = _t(
            np.asarray(lay["gate_up_proj"][i])
        )
        sd[f"model.layers.{i}.mlp.down_proj.weight"] = _t(np.asarray(lay["down_proj"][i]))
    sd["model.norm.weight"] = np.asarray(dec["final_layernorm"])
    if "lm_head" in params:
        sd["lm_head.weight"] = _t(np.asarray(params["lm_head"]))

    vis = params["vision"]
    sd["model.vision_embed_tokens.glb_GN"] = np.asarray(vis["glb_GN"]).reshape(1, 1, -1)
    sd["model.vision_embed_tokens.sub_GN"] = np.asarray(vis["sub_GN"]).reshape(
        1, 1, 1, -1
    )
    sd["model.vision_embed_tokens.img_projection.0.weight"] = _t(
        np.asarray(vis["img_projection"]["fc1"]["kernel"])
    )
    sd["model.vision_embed_tokens.img_projection.0.bias"] = np.asarray(
        vis["img_projection"]["fc1"]["bias"]
    )
    sd["model.vision_embed_tokens.img_projection.2.weight"] = _t(
        np.asarray(vis["img_projection"]["fc2"]["kernel"])
    )
    sd["model.vision_embed_tokens.img_projection.2.bias"] = np.asarray(
        vis["img_projection"]["fc2"]["bias"]
    )

    c = _CLIP_PREFIX
    clip = vis["clip"]
    P, C = cfg.vision.patch_size, cfg.vision.num_channels
    H = cfg.vision.hidden_size
    sd[f"{c}.embeddings.class_embedding"] = np.asarray(clip["class_embedding"])
    sd[f"{c}.embeddings.patch_embedding.weight"] = np.asarray(
        clip["patch_proj"]
    ).reshape(P, P, C, H).transpose(3, 2, 0, 1)
    sd[f"{c}.embeddings.position_embedding.weight"] = np.asarray(
        clip["position_embedding"]
    )
    sd[f"{c}.pre_layrnorm.weight"] = np.asarray(clip["pre_layernorm"]["weight"])
    sd[f"{c}.pre_layrnorm.bias"] = np.asarray(clip["pre_layernorm"]["bias"])
    for i in range(cfg.vision.num_layers):
        sd[f"{c}.encoder.layers.{i}.layer_norm1.weight"] = np.asarray(
            clip["layers"]["ln1"]["weight"][i]
        )
        sd[f"{c}.encoder.layers.{i}.layer_norm1.bias"] = np.asarray(
            clip["layers"]["ln1"]["bias"][i]
        )
        sd[f"{c}.encoder.layers.{i}.layer_norm2.weight"] = np.asarray(
            clip["layers"]["ln2"]["weight"][i]
        )
        sd[f"{c}.encoder.layers.{i}.layer_norm2.bias"] = np.asarray(
            clip["layers"]["ln2"]["bias"][i]
        )
        for name, proj in (
            ("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"), ("out", "out_proj"),
        ):
            sd[f"{c}.encoder.layers.{i}.self_attn.{proj}.weight"] = _t(
                np.asarray(clip["layers"]["attn"][name]["kernel"][i])
            )
            sd[f"{c}.encoder.layers.{i}.self_attn.{proj}.bias"] = np.asarray(
                clip["layers"]["attn"][name]["bias"][i]
            )
        sd[f"{c}.encoder.layers.{i}.mlp.fc1.weight"] = _t(
            np.asarray(clip["layers"]["mlp"]["fc1"]["kernel"][i])
        )
        sd[f"{c}.encoder.layers.{i}.mlp.fc1.bias"] = np.asarray(
            clip["layers"]["mlp"]["fc1"]["bias"][i]
        )
        sd[f"{c}.encoder.layers.{i}.mlp.fc2.weight"] = _t(
            np.asarray(clip["layers"]["mlp"]["fc2"]["kernel"][i])
        )
        sd[f"{c}.encoder.layers.{i}.mlp.fc2.bias"] = np.asarray(
            clip["layers"]["mlp"]["fc2"]["bias"][i]
        )
    sd[f"{c}.post_layernorm.weight"] = np.asarray(clip["post_layernorm"]["weight"])
    sd[f"{c}.post_layernorm.bias"] = np.asarray(clip["post_layernorm"]["bias"])
    return sd
