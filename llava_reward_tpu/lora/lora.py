"""LoRA adapters as stacked param trees + PEFT checkpoint interop.

Reference behaviour: PEFT LoRA on the decoder's fused projections
(create_lora_config, utils/utils.py:194-222: qkv_proj, o_proj, down_proj,
gate_up_proj; r=128, alpha=256, dropout=0.05 in the published configs) with
W' = W + (alpha/r) * B A, A ~ kaiming-uniform, B = 0.

TPU-first design: adapters live in a separate pytree with a leading layer
axis, scanned together with the frozen stacked base weights
(models/phi3.py:_maybe_lora) — the frozen 4B base stays sharded/immutable,
the trainable tree is tiny, and differentiation targets only this tree
(no optimizer masking needed).

PEFT on-disk format (lora/adapter_model.bin,
reward_adaptor_loader.py:44-45):
  base_model.model.model.layers.{i}.self_attn.qkv_proj.lora_A.weight (r, in)
  base_model.model.model.layers.{i}.self_attn.qkv_proj.lora_B.weight (out, r)
  (mlp.gate_up_proj / mlp.down_proj / self_attn.o_proj likewise)
"""

from __future__ import annotations

import math
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np


DEFAULT_TARGETS = ("qkv_proj", "o_proj", "gate_up_proj", "down_proj")
# Qwen targets (create_lora_config_qwen, utils/utils.py:223-242): per-layer
# q/k/v/o + gate/up/down
QWEN_TARGETS = (
    "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj",
)

_PEFT_PATH = {
    "qkv_proj": "self_attn.qkv_proj",
    "o_proj": "self_attn.o_proj",
    "gate_up_proj": "mlp.gate_up_proj",
    "down_proj": "mlp.down_proj",
    "q_proj": "self_attn.q_proj",
    "k_proj": "self_attn.k_proj",
    "v_proj": "self_attn.v_proj",
    "gate_proj": "mlp.gate_proj",
    "up_proj": "mlp.up_proj",
}


def _target_dims(cfg, name: str):
    H, I = cfg.hidden_size, cfg.intermediate_size
    dims = {
        "o_proj": (cfg.q_size, H),
        "down_proj": (I, H),
        "q_proj": (H, cfg.q_size),
        "k_proj": (H, cfg.kv_size),
        "v_proj": (H, cfg.kv_size),
        "gate_proj": (H, I),
        "up_proj": (H, I),
    }
    if hasattr(cfg, "q_size"):
        dims["qkv_proj"] = (H, cfg.q_size + 2 * cfg.kv_size)
        dims["gate_up_proj"] = (H, 2 * I)
    return dims[name]


def init_lora(
    key: jax.Array,
    cfg,
    rank: int,
    alpha: float,
    targets: Sequence[str] = DEFAULT_TARGETS,
    dtype=jnp.float32,
) -> dict:
    """A ~ kaiming-uniform(a=sqrt(5)) over (r, in) like PEFT; B = 0."""
    L = cfg.num_layers
    tree = {}
    keys = jax.random.split(key, len(targets))
    for k, name in zip(keys, targets):
        in_dim, out_dim = _target_dims(cfg, name)
        bound = math.sqrt(6.0 / in_dim)  # kaiming_uniform_ with a=sqrt(5) on fan_in
        a = jax.random.uniform(k, (L, in_dim, rank), minval=-bound, maxval=bound)
        tree[name] = {
            "a": a.astype(dtype),
            "b": jnp.zeros((L, rank, out_dim), dtype),
            "scale": jnp.full((L,), alpha / rank, dtype),
        }
    return tree


CLIP_TARGETS = ("q", "k", "v", "out", "fc1", "fc2")


def init_vision_lora(
    key: jax.Array,
    cfg,  # VisionConfig
    rank: int,
    alpha: float,
    targets: Sequence[str] = CLIP_TARGETS,
    dtype=jnp.float32,
) -> dict:
    """LoRA over the CLIP tower (the reference's unfrozen-vision mode:
    create_lora_config adds CLIP modules when freeze_vision_model is off,
    utils/utils.py:205-222). Only the active (penultimate-truncated) layers
    are ever executed — patch_clip_for_lora's truncation is inherent here."""
    H, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    dims = {
        "q": (H, H), "k": (H, H), "v": (H, H), "out": (H, H),
        "fc1": (H, I), "fc2": (I, H),
    }
    tree = {}
    keys = jax.random.split(key, len(targets))
    for k_, name in zip(keys, targets):
        in_dim, out_dim = dims[name]
        bound = math.sqrt(6.0 / in_dim)
        a = jax.random.uniform(k_, (L, in_dim, rank), minval=-bound, maxval=bound)
        tree[name] = {
            "a": a.astype(dtype),
            "b": jnp.zeros((L, rank, out_dim), dtype),
            "scale": jnp.full((L,), alpha / rank, dtype),
        }
    return tree


def merge_lora(base_layers: dict, lora: dict) -> dict:
    """Fold adapters into the frozen stacked weights (merge-at-load for pure
    inference: zero per-step overhead). Handles both bare-array layers
    (phi3's fused weights) and {kernel, bias} dict layers (qwen)."""
    merged = dict(base_layers)
    for name, t in lora.items():
        delta = jnp.einsum("lir,lro->lio", t["a"], t["b"]) * t["scale"][:, None, None]
        base = base_layers[name]
        if isinstance(base, dict):
            new = dict(base)
            new["kernel"] = base["kernel"] + delta.astype(base["kernel"].dtype)
            merged[name] = new
        else:
            merged[name] = base + delta.astype(base.dtype)
    return merged


def peft_state_to_stacked(
    sd: Dict[str, np.ndarray],
    cfg,
    alpha: float,
    rank: int,
    targets: Sequence[str] = DEFAULT_TARGETS,
    dtype=np.float32,
) -> dict:
    """PEFT adapter_model dict -> stacked lora tree. Accepts both
    'base_model.model.model.layers...' and 'model.layers...' prefixes and
    optional '.default.' adapter-name segments."""

    def find(i, path, ab):
        suffixes = [
            f"model.layers.{i}.{path}.lora_{ab}.weight",
            f"model.layers.{i}.{path}.lora_{ab}.default.weight",
        ]
        for k, v in sd.items():
            for s in suffixes:
                if k.endswith(s):
                    return v
        raise KeyError(f"missing lora weight for layer {i} {path} {ab}")

    tree = {}
    for name in targets:
        path = _PEFT_PATH[name]
        a = np.stack(
            [find(i, path, "A").astype(dtype).T for i in range(cfg.num_layers)]
        )  # (L, in, r)
        b = np.stack(
            [find(i, path, "B").astype(dtype).T for i in range(cfg.num_layers)]
        )  # (L, r, out)
        tree[name] = {
            "a": a,
            "b": b,
            "scale": np.full((cfg.num_layers,), alpha / rank, dtype),
        }
    return tree


def stacked_to_peft_state(
    lora: dict, cfg
) -> Dict[str, np.ndarray]:
    """Stacked lora tree -> PEFT adapter_model dict (so the reference's
    model.load_adapter can consume our trained adapters)."""
    sd: Dict[str, np.ndarray] = {}
    for name, t in lora.items():
        path = _PEFT_PATH[name]
        a = np.asarray(t["a"])  # (L, in, r)
        b = np.asarray(t["b"])  # (L, r, out)
        for i in range(cfg.num_layers):
            prefix = f"base_model.model.model.layers.{i}.{path}"
            sd[f"{prefix}.lora_A.weight"] = np.ascontiguousarray(a[i].T)
            sd[f"{prefix}.lora_B.weight"] = np.ascontiguousarray(b[i].T)
    return sd


# CLIP tower PEFT paths (the reference's unfrozen-vision targets,
# create_lora_config utils/utils.py:205-213: q/k/v/out_proj + fc1/fc2 inside
# model.vision_embed_tokens.img_processor.vision_model.encoder.layers.{i})
_VISION_PEFT_PATH = {
    "q": "self_attn.q_proj",
    "k": "self_attn.k_proj",
    "v": "self_attn.v_proj",
    "out": "self_attn.out_proj",
    "fc1": "mlp.fc1",
    "fc2": "mlp.fc2",
}
_VISION_PEFT_PREFIX = (
    "vision_embed_tokens.img_processor.vision_model.encoder.layers"
)


def vision_stacked_to_peft_state(vlora: dict, vcfg) -> Dict[str, np.ndarray]:
    """Stacked CLIP LoRA tree -> PEFT adapter_model keys, so the reference's
    model.load_adapter consumes our vision adapters (utils/utils.py:205-213)."""
    sd: Dict[str, np.ndarray] = {}
    for name, t in vlora.items():
        path = _VISION_PEFT_PATH[name]
        a = np.asarray(t["a"])  # (L, in, r)
        b = np.asarray(t["b"])  # (L, r, out)
        for i in range(a.shape[0]):
            prefix = f"base_model.model.model.{_VISION_PEFT_PREFIX}.{i}.{path}"
            sd[f"{prefix}.lora_A.weight"] = np.ascontiguousarray(a[i].T)
            sd[f"{prefix}.lora_B.weight"] = np.ascontiguousarray(b[i].T)
    return sd


def vision_peft_state_to_stacked(
    sd: Dict[str, np.ndarray],
    vcfg,
    alpha: float,
    rank: int,
    dtype=np.float32,
) -> dict:
    """PEFT adapter keys on the CLIP tower -> stacked vision-LoRA tree.
    Returns {} when the adapter has no vision keys."""
    present = [
        name for name, path in _VISION_PEFT_PATH.items()
        if any(
            _VISION_PEFT_PREFIX in k and f"{path}.lora_A" in k for k in sd
        )
    ]
    if not present:
        return {}

    def find(i, path, ab):
        suffixes = [
            f"{_VISION_PEFT_PREFIX}.{i}.{path}.lora_{ab}.weight",
            f"{_VISION_PEFT_PREFIX}.{i}.{path}.lora_{ab}.default.weight",
        ]
        for k, v in sd.items():
            for s in suffixes:
                if k.endswith(s):
                    return v
        raise KeyError(f"missing vision lora weight for layer {i} {path} {ab}")

    tree = {}
    for name in present:
        path = _VISION_PEFT_PATH[name]
        a = np.stack(
            [find(i, path, "A").astype(dtype).T for i in range(vcfg.num_layers)]
        )
        b = np.stack(
            [find(i, path, "B").astype(dtype).T for i in range(vcfg.num_layers)]
        )
        tree[name] = {
            "a": a,
            "b": b,
            "scale": np.full((vcfg.num_layers,), alpha / rank, dtype),
        }
    return tree


def merge_vision_lora(clip_params: dict, vlora: dict) -> dict:
    """Fold stacked CLIP LoRA into the clip param tree (models/clip_vit.py
    layout: layers.attn.{q,k,v,out}.kernel, layers.mlp.{fc1,fc2}.kernel)."""
    import copy

    clip = copy.deepcopy(clip_params)
    lay = clip["layers"]
    for name, t in vlora.items():
        delta = jnp.einsum(
            "lir,lro->lio", jnp.asarray(t["a"]), jnp.asarray(t["b"])
        ) * jnp.asarray(t["scale"])[:, None, None]
        sub = lay["attn"][name] if name in ("q", "k", "v", "out") else lay["mlp"][name]
        sub["kernel"] = np.asarray(
            jnp.asarray(sub["kernel"]) + delta.astype(jnp.asarray(sub["kernel"]).dtype)
        )
    return clip


def peft_adapter_config(
    rank: int, alpha: float, dropout: float, targets: Sequence[str] = DEFAULT_TARGETS
) -> dict:
    """adapter_config.json matching create_lora_config (utils/utils.py:194-222)."""
    return {
        "peft_type": "LORA",
        "task_type": "CAUSAL_LM",
        "r": int(rank),
        "lora_alpha": float(alpha),
        "lora_dropout": float(dropout),
        "bias": "none",
        "target_modules": list(targets),
        "base_model_name_or_path": None,
    }
