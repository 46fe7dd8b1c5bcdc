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
    load_llava_projector_params,
    load_projector_params,
    load_qwen_merger_params,
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


def llava_config_from_pretrain(pretrain: str):
    """config.json -> LlavaNextConfig (nested text_config/vision_config)."""
    from ..core.config import LlavaNextConfig, QwenTextConfig, VisionConfig

    cfg_path = os.path.join(pretrain, "config.json")
    if not os.path.exists(cfg_path):
        return LlavaNextConfig()
    with open(cfg_path) as f:
        cj = json.load(f)
    tj = cj.get("text_config", {})
    vj = cj.get("vision_config", {})
    hd = tj.get("hidden_size", 5120) // tj.get("num_attention_heads", 40)
    text = QwenTextConfig(
        vocab_size=tj.get("vocab_size", 32064),
        hidden_size=tj.get("hidden_size", 5120),
        intermediate_size=tj.get("intermediate_size", 13824),
        num_layers=tj.get("num_hidden_layers", 40),
        num_heads=tj.get("num_attention_heads", 40),
        num_kv_heads=tj.get("num_key_value_heads", tj.get("num_attention_heads", 40)),
        rms_norm_eps=tj.get("rms_norm_eps", 1e-5),
        rope_theta=tj.get("rope_theta", 10000.0),
        max_position_embeddings=tj.get("max_position_embeddings", 4096),
        mrope_section=(hd // 2, 0, 0),
        pad_token_id=tj.get("pad_token_id") or 0,
        eos_token_id=tj.get("eos_token_id", 2),
        image_token_id=cj.get("image_token_index", 32000),
    )
    vision = VisionConfig(
        hidden_size=vj.get("hidden_size", 1024),
        intermediate_size=vj.get("intermediate_size", 4096),
        num_layers=vj.get("num_hidden_layers", 24),
        num_heads=vj.get("num_attention_heads", 16),
        image_size=vj.get("image_size", 336),
        patch_size=vj.get("patch_size", 14),
        feature_layer_idx=cj.get("vision_feature_layer", -2),
    )
    return LlavaNextConfig(
        text=text,
        vision=vision,
        grid_pinpoints=tuple(
            tuple(p) for p in cj.get(
                "image_grid_pinpoints",
                [[336, 672], [672, 336], [672, 672], [1008, 336], [336, 1008]],
            )
        ),
    )


def qwen_config_from_pretrain(pretrain: str):
    """config.json -> Qwen25VLConfig; handles both flat (4.50-era) and
    nested text_config layouts."""
    from ..core.config import Qwen25VLConfig, QwenTextConfig, QwenVisionConfig

    cfg_path = os.path.join(pretrain, "config.json")
    if not os.path.exists(cfg_path):
        from ..core.config import qwen25_vl_7b_config

        return qwen25_vl_7b_config()
    with open(cfg_path) as f:
        cj = json.load(f)
    tj = cj.get("text_config", cj)
    vj = cj.get("vision_config", {})
    rs = tj.get("rope_scaling") or cj.get("rope_scaling") or {}
    text = QwenTextConfig(
        vocab_size=tj.get("vocab_size", 152064),
        hidden_size=tj.get("hidden_size", 3584),
        intermediate_size=tj.get("intermediate_size", 18944),
        num_layers=tj.get("num_hidden_layers", 28),
        num_heads=tj.get("num_attention_heads", 28),
        num_kv_heads=tj.get("num_key_value_heads", 4),
        rms_norm_eps=tj.get("rms_norm_eps", 1e-6),
        rope_theta=tj.get("rope_theta", 1000000.0),
        max_position_embeddings=tj.get("max_position_embeddings", 128000),
        mrope_section=tuple(rs.get("mrope_section", (16, 24, 24))),
        sliding_window=tj.get("sliding_window")
        if tj.get("use_sliding_window", False)
        else None,
        pad_token_id=tj.get("pad_token_id") or 151643,
        eos_token_id=tj.get("eos_token_id", 151645),
        image_token_id=cj.get("image_token_id", 151655),
    )
    vision = QwenVisionConfig(
        depth=vj.get("depth", 32),
        hidden_size=vj.get("hidden_size", 1280),
        intermediate_size=vj.get("intermediate_size", 3420),
        num_heads=vj.get("num_heads", 16),
        patch_size=vj.get("patch_size", 14),
        temporal_patch_size=vj.get("temporal_patch_size", 2),
        spatial_merge_size=vj.get("spatial_merge_size", 2),
        window_size=vj.get("window_size", 112),
        fullatt_block_indexes=tuple(vj.get("fullatt_block_indexes", (7, 15, 23, 31))),
        out_hidden_size=vj.get("out_hidden_size", 3584),
    )
    return Qwen25VLConfig(text=text, vision=vision)


@dataclass
class RewardAdaptor:
    """Loaded model + configs; ``score(batch)`` is the jitted custom_forward."""

    cfg: Phi3VConfig
    rcfg: RewardConfig
    params: dict  # {'backbone': ..., 'head': ...} with LoRA merged
    model_type: str = "phi3v"

    def make_score_fn(self, attn_impl: str = "auto", training: bool = False):
        # memoised per adaptor: a fresh jit closure per call retraces the
        # whole model and re-loads the executable — ~90s per
        # batch_rm_inference call at full size on a 1-core host even with a
        # persistent-cache HIT (same retrace class as VERDICT r4 item 5)
        import jax

        from ..reward.model import reward_forward

        key = (attn_impl, training)
        cache = self.__dict__.setdefault("_score_fns", {})
        if key in cache:
            return cache[key]

        cfg, rcfg = self.cfg, self.rcfg

        @jax.jit
        def score(params, batch):
            return reward_forward(
                params, cfg, rcfg, batch, training=training, attn_impl=attn_impl
            ).reward

        cache[key] = score
        return score


def _merge_projector_lora(proj: dict, lora_sd: dict, alpha: float, rank: int) -> bool:
    """Merge img_projection.{0,2} LoRA (a reference unfrozen-vision target,
    utils/utils.py:211-212) into the projector fc1/fc2 kernels. PEFT stores
    lora_A (r, in) / lora_B (out, r); torch delta B@A is (out, in), ours is
    its transpose. Returns True if any keys were merged."""
    merged = False
    for idx, fc in (("0", "fc1"), ("2", "fc2")):
        a = b = None
        for k, v in lora_sd.items():
            if f"img_projection.{idx}.lora_A" in k:
                a = v
            elif f"img_projection.{idx}.lora_B" in k:
                b = v
        if a is None or b is None:
            continue
        delta = (alpha / rank) * (b @ a).T  # (in, out)
        kern = np.asarray(proj[fc]["kernel"])
        proj[fc]["kernel"] = kern + delta.astype(kern.dtype)
        merged = True
    return merged


def _check_lora_consumed(lora_sd, targets, vision_merged, proj_merged, *,
                         strict: bool = True):
    """Error on adapter keys no merge path consumed (e.g. a PEFT adapter
    trained on modules this loader doesn't know) — the reference's
    load_adapter is strict about this too."""
    from ..lora.lora import _PEFT_PATH, _VISION_PEFT_PREFIX, _VISION_PEFT_PATH

    dec_paths = [_PEFT_PATH[t] for t in targets]

    def consumed(k):
        if _VISION_PEFT_PREFIX in k:
            return vision_merged and any(
                f"{p}.lora_" in k for p in _VISION_PEFT_PATH.values()
            )
        if "img_projection." in k:
            return proj_merged
        return ".layers." in k and any(f"{p}.lora_" in k for p in dec_paths)

    extra = sorted(k for k in lora_sd if not consumed(k))
    if not extra:
        return
    shown = ", ".join(extra[:8]) + (" ..." if len(extra) > 8 else "")
    msg = (
        f"{len(extra)} unconsumed LoRA adapter key(s): [{shown}] — these "
        "deltas would be silently dropped. Pass strict=False to downgrade "
        "this to a warning."
    )
    if strict:
        raise ValueError(msg)
    from ..core.logging import init_logger

    init_logger(__name__).warning(msg)


def load_reward_adaptor(
    pretrain: str,
    pm_path: str,
    model_type: str = "phi3v",
    dtype=np.float32,
    ft_projector: bool = True,
    compute_dtype=None,
    quantize: Optional[str] = None,
    quantize_min_size: int = 1 << 20,
    strict: bool = True,
) -> RewardAdaptor:
    """Rebuild the reward model from a base checkpoint dir + reward artifact.

    ``strict``: error on state-dict keys the mapping never consumes (and on
    artifact/LoRA keys no loader family matches) — strict load_state_dict
    semantics (reward_adaptor_loader.py:46-63); False downgrades to warnings.

    ``compute_dtype``: cast params for the device (e.g. jnp.bfloat16, the
    reference's torch_dtype=torch.bfloat16 at reward_adaptor_loader.py:36).

    ``quantize``: frozen-backbone quantization applied AFTER the LoRA merge
    (so the adapter rides inside the quantized weights): 'w8a8' (int8
    inference mode, --load_in_8bit: matmuls run on the v5e's 394 TOPS int8
    path), 'nf4' / 'int4' / 'int8' (weight-only; the reference's
    --load_in_4bit analog, rw_model_general_preference.py:166-185).
    """
    rcfg = load_reward_config(pm_path)
    sd = load_torch_state_dict(pretrain)

    # ft-phi full-checkpoint mode (batch_inference_rm_ft_phi.py:28-55):
    # pretrain IS the artifact (the dir, or its pytorch_model.bin directly —
    # load_torch_state_dict accepts both), so the one .bin legitimately holds
    # backbone AND reward-head keys. Only then may the base strict check
    # ignore the head keys (ADVICE r4: a genuine separate base checkpoint
    # with stale head keys must still be flagged).
    full_ckpt = os.path.realpath(pretrain) in (
        os.path.realpath(pm_path),
        os.path.realpath(os.path.join(pm_path, "pytorch_model.bin")),
    )
    cfg_dir = os.path.dirname(pretrain) if os.path.isfile(pretrain) else pretrain

    if model_type == "phi3v":
        cfg = phi3v_config_from_pretrain(cfg_dir)
        cfg = _infer_vision_geometry(cfg, sd)
        backbone = params_from_hf_state_dict(
            sd, cfg, dtype=dtype, strict=strict, ignore_head_keys=full_ckpt
        )
        decoder_cfg = cfg.decoder
        layers_tree = backbone["decoder"]["layers"]
        default_targets = ("qkv_proj", "o_proj", "gate_up_proj", "down_proj")
    elif model_type == "qwen":
        from ..io.hf_qwen import params_from_hf_state_dict as qwen_params
        from ..lora.lora import QWEN_TARGETS

        cfg = qwen_config_from_pretrain(cfg_dir)
        backbone = qwen_params(
            sd, cfg, dtype=dtype, strict=strict, ignore_head_keys=full_ckpt
        )
        decoder_cfg = cfg.text
        layers_tree = backbone["text"]["layers"]
        default_targets = QWEN_TARGETS
    elif model_type == "llava":
        from ..io.hf_llava import params_from_hf_state_dict as llava_params
        from ..lora.lora import QWEN_TARGETS

        cfg = llava_config_from_pretrain(cfg_dir)
        backbone = llava_params(
            sd, cfg, dtype=dtype, strict=strict, ignore_head_keys=full_ckpt
        )
        decoder_cfg = cfg.text
        layers_tree = backbone["text"]["layers"]
        default_targets = QWEN_TARGETS
    else:
        raise NotImplementedError(f"unknown model_type={model_type}")

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
        targets = [t for t in default_targets if any(f"{t}.lora" in k for k in lora_sd)]
        stacked = peft_state_to_stacked(
            lora_sd, decoder_cfg,
            alpha=float(acfg.get("lora_alpha", 1.0)),
            rank=int(acfg.get("r", 1)),
            targets=targets, dtype=dtype,
        )
        import jax
        import jax.numpy as jnp

        # merge ON CPU: the full-size f32 layer stack is ~15 GB — letting
        # jnp default to the accelerator would OOM a 16 GB chip before the
        # bf16 cast even happens
        with jax.default_device(jax.devices("cpu")[0]):
            merged = merge_lora(
                {
                    k: (
                        jax.tree_util.tree_map(jnp.asarray, v)
                        if isinstance(v, dict)
                        else jnp.asarray(v)
                    )
                    for k, v in layers_tree.items()
                },
                {n: {kk: jnp.asarray(vv) for kk, vv in t.items()} for n, t in stacked.items()},
            )
            merged = {
                k: ({kk: np.asarray(vv) for kk, vv in v.items()} if isinstance(v, dict) else np.asarray(v))
                for k, v in merged.items()
            }
        if model_type == "phi3v":
            backbone["decoder"]["layers"] = merged
        else:
            backbone["text"]["layers"] = merged

        alpha = float(acfg.get("lora_alpha", 1.0))
        rank = int(acfg.get("r", 1))
        vision_merged = proj_merged = False
        if model_type == "phi3v":
            # unfrozen-vision adapters (reference CLIP targets,
            # utils/utils.py:205-213): merge into the CLIP tower / projector
            from ..lora.lora import (
                merge_vision_lora,
                vision_peft_state_to_stacked,
            )

            vlora = vision_peft_state_to_stacked(
                lora_sd, cfg.vision, alpha=alpha, rank=rank, dtype=dtype
            )
            if vlora:
                backbone["vision"]["clip"] = merge_vision_lora(
                    backbone["vision"]["clip"], vlora
                )
                vision_merged = True
            proj_merged = _merge_projector_lora(
                backbone["vision"]["img_projection"], lora_sd, alpha, rank
            )
        _check_lora_consumed(
            lora_sd, targets, vision_merged, proj_merged, strict=strict
        )

    from ..io.artifact import check_artifact_keys

    # In full-checkpoint mode the base load above already strict-checked
    # every key of the artifact bin (head keys excepted), so the
    # artifact-shape check is both redundant and wrong there — skip it.
    if not full_ckpt:
        check_artifact_keys(pm_path, strict=strict)
    head = load_head_params(pm_path, rcfg, dtype=dtype)
    if ft_projector:
        if model_type == "phi3v":
            proj = load_projector_params(pm_path, dtype=dtype)
            if proj is not None:
                backbone["vision"]["img_projection"] = proj
        elif model_type == "qwen":
            merger = load_qwen_merger_params(pm_path, dtype=dtype)
            if merger is not None:
                backbone["visual"]["merger"] = merger
        else:  # llava: multi_modal_projector re-keyed by linear_{1,2}
            proj = load_llava_projector_params(pm_path, dtype=dtype)
            if proj is not None:
                backbone["vision"]["projector"] = proj

    if quantize:
        from ..utils.quantize import quantize_stacked_layers

        scheme = {"w8a8": "w8a8", "nf4": "nf4"}.get(quantize, "absmax")
        bits = 4 if quantize in ("nf4", "int4") else 8
        dec = backbone["decoder"] if model_type == "phi3v" else backbone["text"]
        dec["layers"] = quantize_stacked_layers(
            dec["layers"], bits=bits, scheme=scheme, min_size=quantize_min_size
        )
        # Vision towers stay bf16 under every quantize scheme: the
        # per-matmul int8 wins (PERF.md int8 ledger) do NOT transfer to the
        # towers once embedded in the producer chain — chained tower-level
        # timing at production shapes: CLIP bf16 389.0 ms vs int8-qkv+fc1
        # 389.5 vs int8-all 409.5 (scratch/probe_clip_int8.py); qwen bf16
        # 129.5 ms vs the qkv/gate/up mix 139.8 vs int8-all 128.1
        # (scratch/probe_qwen_int8.py). Quantizing them buys nothing (or
        # loses) and costs numerics headroom, so only the decoder carries
        # int8 leaves.

    if model_type in ("qwen", "llava"):
        # inference fast-path layout: q/k/v -> qkv_proj, gate/up ->
        # gate_up_proj (one matmul + one W8A8 activation-quantize pass each,
        # and the fused Pallas attention path — in-kernel rope, zero layout
        # transposes). Exact: quantized codes/scales concat per out column.
        # Safe here because LoRA was merged above; phi3v is natively fused.
        from ..models.qwen25_vl import fuse_decoder_projections

        backbone["text"]["layers"] = fuse_decoder_projections(
            backbone["text"]["layers"]
        )

    params = {"backbone": backbone, "head": head}
    if compute_dtype is not None:

        def cast(v):
            if isinstance(v, dict):
                # quantized leaf-dicts keep their int8 codes and f32 scales
                from ..utils.quantize import is_quantized, is_w8a8

                if is_quantized(v) or is_w8a8(v):
                    return v
                return {k: cast(x) for k, x in v.items()}
            if np.issubdtype(np.asarray(v).dtype, np.floating):
                return v.astype(compute_dtype)
            return v

        params = cast(params)
    # Commit the tree to the device ONCE. The loaders above build host
    # (numpy) leaves; numpy args to a jitted score fn are re-transferred on
    # EVERY call (jit does not memoise host buffers), which on the tunnelled
    # backend means re-uploading the full model per batch (~30 MB/s). The
    # score fns (batch_inference.py:194, server.py:153) feed adaptor.params
    # straight into jit and rely on this.
    import jax

    params = jax.device_put(params)
    return RewardAdaptor(cfg=cfg, rcfg=rcfg, params=params, model_type=model_type)
