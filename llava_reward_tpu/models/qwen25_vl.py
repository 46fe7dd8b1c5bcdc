"""Qwen2.5-VL backbone, TPU-first.

Reference integration points: the reward model runs the HF
Qwen2_5_VLForConditionalGeneration forward and re-gathers vision tokens
with a per-sample Python loop (rw_model_general_preference.py:354-371).
Architecture semantics follow HF modeling_qwen2_5_vl.py (public), rebuilt
for XLA:

- vision tower: patch "conv3d" as one matmul; blocks stacked + lax.scan
  with a per-layer full/window flag; WINDOW attention is a reshape to
  (B*num_windows, win_patches) + batched dense attention over the host's
  window-ordered padded layout (preprocess/qwen_vision.py) — replacing the
  cu_seqlens varlen path; 2D rotary applied in fp32;
- merger (RMSNorm -> 2x2-unit concat -> GELU MLP) runs in window order,
  then one static gather restores original merged order — replacing HF's
  argsort(window_index) and the reference's ragged re-gather loop;
- decoder: Qwen2 GQA (q/k/v bias), separate gate/up SwiGLU, M-RoPE section
  interleave via a precomputed channel->axis map, stacked scan like phi3.

Param tree:
  visual: {patch_embed (pd,H), blocks{norm1,norm2 (L,H),
           qkv{kernel(L,H,3H),bias}, proj{kernel,bias},
           mlp{gate|up|down: {kernel,bias}}},
           merger{ln_q (H,), fc1{kernel(mm*H, mm*H),bias},
                  fc2{kernel(mm*H, out),bias}}}
  text:   {embed_tokens (V,H), layers{input_layernorm, q|k|v_proj{kernel,
           bias}, o_proj, post_attention_layernorm, gate|up|down_proj},
           final_layernorm}
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import Qwen25VLConfig, QwenTextConfig, QwenVisionConfig
from ..ops.activations import gelu, silu
from ..ops.attention import mha
from ..ops.norms import rms_norm


# ------------------------------------------------------------------ init

def init_vision_params(key: jax.Array, vc: QwenVisionConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 8)
    H, I, L = vc.hidden_size, vc.intermediate_size, vc.depth
    mm = vc.spatial_merge_size ** 2
    std = 0.02

    def dense(k, shape):
        return (jax.random.normal(k, shape) * std).astype(dtype)

    def lin(k, i, o):
        return {"kernel": dense(k, (L, i, o)), "bias": jnp.zeros((L, o), dtype)}

    return {
        "patch_embed": dense(ks[0], (vc.patch_dim, H)),
        "blocks": {
            "norm1": jnp.ones((L, H), dtype),
            "norm2": jnp.ones((L, H), dtype),
            "qkv": lin(ks[1], H, 3 * H),
            "proj": lin(ks[2], H, H),
            "mlp": {
                "gate": lin(ks[3], H, I),
                "up": lin(ks[4], H, I),
                "down": lin(ks[5], I, H),
            },
        },
        "merger": {
            "ln_q": jnp.ones((H,), dtype),
            "fc1": {
                "kernel": dense(ks[6], (mm * H, mm * H)),
                "bias": jnp.zeros((mm * H,), dtype),
            },
            "fc2": {
                "kernel": dense(ks[7], (mm * H, vc.out_hidden_size)),
                "bias": jnp.zeros((vc.out_hidden_size,), dtype),
            },
        },
    }


def init_text_params(key: jax.Array, tc: QwenTextConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 8)
    H, I, L, V = tc.hidden_size, tc.intermediate_size, tc.num_layers, tc.vocab_size
    std = 0.02

    def dense(k, shape):
        return (jax.random.normal(k, shape) * std).astype(dtype)

    def lin(k, i, o, bias=True):
        d = {"kernel": dense(k, (L, i, o))}
        if bias:
            d["bias"] = jnp.zeros((L, o), dtype)
        return d

    return {
        "embed_tokens": dense(ks[0], (V, H)),
        "layers": {
            "input_layernorm": jnp.ones((L, H), dtype),
            "q_proj": lin(ks[1], H, tc.q_size),
            "k_proj": lin(ks[2], H, tc.kv_size),
            "v_proj": lin(ks[3], H, tc.kv_size),
            "o_proj": {"kernel": dense(ks[4], (L, tc.q_size, H))},
            "post_attention_layernorm": jnp.ones((L, H), dtype),
            "gate_proj": {"kernel": dense(ks[5], (L, H, I))},
            "up_proj": {"kernel": dense(ks[6], (L, H, I))},
            "down_proj": {"kernel": dense(ks[7], (L, I, H))},
        },
        "final_layernorm": jnp.ones((H,), dtype),
    }


def init_params(key: jax.Array, cfg: Qwen25VLConfig, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "visual": init_vision_params(k1, cfg.vision, dtype),
        "text": init_text_params(k2, cfg.text, dtype),
    }


# ------------------------------------------------------------------ vision

def _vision_rope(rot_pos: jnp.ndarray, head_dim: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """rot_pos (B, P, 2) -> fp32 cos/sin (B, P, head_dim): per-patch freq
    vector [h*invf, w*invf] duplicated (Qwen2_5_VisionRotaryEmbedding +
    rot_pos_emb)."""
    quarter = head_dim // 4
    inv_freq = 1.0 / (10000.0 ** (jnp.arange(0, quarter, dtype=jnp.float32) / quarter))
    pos = rot_pos.astype(jnp.float32)  # (B, P, 2)
    freqs = pos[..., None] * inv_freq[None, None, None, :]  # (B, P, 2, quarter)
    half = freqs.reshape(*freqs.shape[:2], -1)  # (B, P, head_dim//2)
    emb = jnp.concatenate([half, half], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def _vision_block(h, lp, vc: QwenVisionConfig, cos, sin, patch_valid, is_full, attn_impl):
    B, P, H = h.shape
    nh, hd = vc.num_heads, vc.head_dim
    wp = vc.win_patches

    x = rms_norm(h, lp["norm1"], vc.rms_norm_eps)
    qkv = _lin(x, lp["qkv"])
    q, k, v = jnp.split(qkv.reshape(B, P, 3, nh, hd), 3, axis=2)
    q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]
    # fp32 rotary (apply_rotary_pos_emb_vision)
    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    c, s = cos[:, :, None, :], sin[:, :, None, :]
    q = (qf * c + _rotate_half(qf) * s).astype(h.dtype)
    k = (kf * c + _rotate_half(kf) * s).astype(h.dtype)

    # patch_valid carries SEGMENT ids (0 = pad; images: 1; video: t+1 per
    # temporal slice). Full-attention blocks attend within one segment only
    # — HF computes cu_seqlens per grid_t slice
    # (Qwen2_5_VisionTransformer.forward), so a video's frames never attend
    # across time in these blocks.
    def full_attn(q, k, v):
        return mha(
            q, k, v, causal=False, key_padding_mask=patch_valid,
            impl=attn_impl, mask_layout="segments",
        )

    def win_attn(q, k, v):
        nW = P // wp
        qw = q.reshape(B * nW, wp, nh, hd)
        kw = k.reshape(B * nW, wp, nh, hd)
        vw = v.reshape(B * nW, wp, nh, hd)
        mw = patch_valid.reshape(B * nW, wp)
        out = mha(
            qw, kw, vw, causal=False, key_padding_mask=mw,
            impl=attn_impl, mask_layout="arbitrary",
        )
        return out.reshape(B, P, nh, hd)

    attn = jax.lax.cond(is_full, full_attn, win_attn, q, k, v)
    attn = _lin(attn.reshape(B, P, H), lp["proj"])
    h = h + attn

    x = rms_norm(h, lp["norm2"], vc.rms_norm_eps)
    mlp = lp["mlp"]
    x = _lin(silu(_lin(x, mlp["gate"])) * _lin(x, mlp["up"]), mlp["down"])
    return h + x


def vision_forward(
    params: dict,
    vc: QwenVisionConfig,
    patches: jnp.ndarray,  # (B, P, patch_dim), window-ordered + padded
    patch_valid: jnp.ndarray,  # (B, P)
    rot_pos: jnp.ndarray,  # (B, P, 2)
    unit_gather: jnp.ndarray,  # (B, U) original unit -> windowed unit idx
    num_units: jnp.ndarray,  # (B,)
    *,
    attn_impl: str = "auto",
    remat: bool = False,
) -> jnp.ndarray:
    """-> (B, U, out_hidden) merged vision tokens in ORIGINAL unit order,
    zeroed on invalid slots."""
    B, P, _ = patches.shape
    mm = vc.spatial_merge_size ** 2
    if patches.dtype == jnp.uint8:
        # device-side preprocessing: host ships raw uint8 patches (4x fewer
        # wire bytes); the CLIP normalisation applies here with mean/std
        # broadcast in the patch-flat (C, tps, ph, pw) order — XLA fuses it
        # into the patch_embed matmul operand load
        from ..preprocess.qwen_vision import patch_norm_vectors

        mean_vec, std_vec = patch_norm_vectors(
            vc.in_channels, vc.temporal_patch_size, vc.patch_size
        )
        patches = (
            patches.astype(jnp.float32) / 255.0 - jnp.asarray(mean_vec)
        ) / jnp.asarray(std_vec)
        # pad slots held u8 zeros; keep them zero post-normalise like the
        # host path does
        patches = patches * (patch_valid != 0)[..., None]
        patches = patches.astype(params["patch_embed"].dtype)
    h = patches @ params["patch_embed"]  # (B, P, H)
    cos, sin = _vision_rope(rot_pos, vc.head_dim)

    is_full = jnp.zeros((vc.depth,), jnp.bool_).at[
        jnp.asarray(vc.fullatt_block_indexes, jnp.int32)
    ].set(True)

    body = _vision_block
    if remat:
        body = jax.checkpoint(body, static_argnums=(2, 7))

    def scan_fn(carry, xs):
        lp, full_flag = xs
        return body(carry, lp, vc, cos, sin, patch_valid, full_flag, attn_impl), None

    h, _ = jax.lax.scan(scan_fn, h, (params["blocks"], is_full))

    # merger in window order (Qwen2_5_VLPatchMerger)
    m = params["merger"]
    x = rms_norm(h, m["ln_q"], vc.rms_norm_eps)
    x = x.reshape(B, P // mm, mm * vc.hidden_size)
    x = gelu(x @ m["fc1"]["kernel"] + m["fc1"]["bias"])
    x = x @ m["fc2"]["kernel"] + m["fc2"]["bias"]  # (B, U_w, out)

    # restore original merged order + zero invalid
    out = jnp.take_along_axis(x, unit_gather[..., None], axis=1)  # (B, U, out)
    slot = jnp.arange(out.shape[1])[None, :]
    return jnp.where((slot < num_units[:, None])[..., None], out, 0)


# ------------------------------------------------------------------ decoder

def _mrope_cos_sin(
    position_ids: jnp.ndarray,  # (3, B, S)
    tc: QwenTextConfig,
    dtype,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """M-RoPE: per-axis rope then section interleave
    (apply_multimodal_rotary_pos_emb: sections*2 pattern over head_dim)."""
    hd = tc.head_dim
    half = hd // 2
    inv_freq = 1.0 / (tc.rope_theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    pos = position_ids.astype(jnp.float32)  # (3, B, S)
    freqs = pos[..., None] * inv_freq[None, None, None, :]  # (3, B, S, half)
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # (3, B, S, hd)
    cos, sin = jnp.cos(emb), jnp.sin(emb)

    sections = list(tc.mrope_section) * 2
    axis_map = np.concatenate(
        [np.full(n, i % 3, np.int32) for i, n in enumerate(sections)]
    )
    assert axis_map.shape[0] == hd, (axis_map.shape, hd)
    am = jnp.asarray(axis_map)
    cos = jnp.take_along_axis(cos, am[None, None, None, :], axis=0)[0]
    sin = jnp.take_along_axis(sin, am[None, None, None, :], axis=0)[0]
    # take_along_axis over axis 0 needs matching dims; the [None]s broadcast
    return cos.astype(dtype), sin.astype(dtype)


def _maybe_lora(x, base_out, lora_layer, name):
    if lora_layer is None or name not in lora_layer:
        return base_out
    t = lora_layer[name]
    a = t["a"].astype(x.dtype)
    b = t["b"].astype(x.dtype)
    return base_out + (x @ a) @ b * t["scale"].astype(x.dtype)


def _lin(x, p):
    """x @ kernel (+ bias if present) — llama (vicuna) layers share the qwen
    structure minus the qkv biases. W8A8-quantized kernels (inference mode)
    run on the int8 MXU path via qmatmul."""
    from ..utils.quantize import qmatmul

    out = qmatmul(x, p["kernel"])
    if "bias" in p:
        out = out + p["bias"]
    return out


def fuse_decoder_projections(layers: dict) -> dict:
    """Fuse separate q/k/v -> qkv_proj and gate/up -> gate_up_proj in a
    stacked decoder-layer tree — the inference fast-path layout consumed by
    _decoder_layer's fused branch (one matmul + one W8A8 activation-quantize
    pass instead of three, feeding the fused Pallas attention straight from
    the projection output).

    Handles dense kernels (+bias) and quantized leaf-dicts: W8A8 / packed
    int4 codes and their per-out-column scales all concatenate along the out
    axis, so fusing after quantization is exact. Call AFTER any LoRA merge —
    the fused branch applies no adapters (the trainer keeps the separate
    layout)."""

    def cat(parts):
        if isinstance(parts[0], dict):
            return {k: cat([p[k] for p in parts]) for k in parts[0]}
        if any(isinstance(p, jnp.ndarray) for p in parts):
            return jnp.concatenate(parts, axis=-1)
        return np.concatenate(parts, axis=-1)

    out = dict(layers)
    if all(n in out for n in ("q_proj", "k_proj", "v_proj")):
        out["qkv_proj"] = cat(
            [out.pop("q_proj"), out.pop("k_proj"), out.pop("v_proj")]
        )
    if all(n in out for n in ("gate_proj", "up_proj")):
        out["gate_up_proj"] = cat([out.pop("gate_proj"), out.pop("up_proj")])
    return out


def _decoder_layer(h, lp, tc: QwenTextConfig, cos, sin, attention_mask, attn_impl, lora_layer):
    import os

    from ..ops.attention import fused_rope_attention
    from ..utils.quantize import dequant_layer, int8_linear_pre, is_w8a8

    lp = dequant_layer(lp, h.dtype)  # no-op unless weight-only quantized
    B, S, H = h.shape
    nh, nkv, hd = tc.num_heads, tc.num_kv_heads, tc.head_dim

    # quantizing-RMSNorm epilogue for W8A8 fused-layout inference (same
    # gating as phi3.decoder_layer; measured +1% fwd_int8 on the v5e)
    from ..ops.quant_epilogue import supported as _lnq_supported
    from .clip_vit import _on_tpu

    use_rq = (
        lora_layer is None
        and os.environ.get("LRT_LN_QUANT", "1") != "0"
        and _on_tpu()
        and _lnq_supported(h)
    )

    def _rq_lin(hid, gamma, proj):
        from ..ops.quant_epilogue import rms_quant

        codes, rs = rms_quant(hid, gamma, tc.rms_norm_eps)
        out = int8_linear_pre(codes, rs, proj["kernel"], hid.dtype)
        if "bias" in proj:
            out = out + proj["bias"]
        return out

    residual = h
    if "qkv_proj" in lp:
        # fused-projection inference layout (fuse_decoder_projections):
        # ONE matmul (one activation-quantize pass under W8A8) feeding the
        # fused Pallas attention path — in-kernel rope, zero layout
        # transposes (direct kernel for MHA/vicuna, prep kernel for GQA).
        # LoRA never rides here: the adaptor merges adapters before fusing.
        if use_rq and is_w8a8(lp["qkv_proj"]["kernel"]):
            qkv = _rq_lin(h, lp["input_layernorm"], lp["qkv_proj"])
        else:
            x = rms_norm(h, lp["input_layernorm"], tc.rms_norm_eps)
            qkv = _lin(x, lp["qkv_proj"])
        attn = fused_rope_attention(
            qkv, cos, sin, n_heads=nh, n_kv_heads=nkv, head_dim=hd,
            causal=True, key_padding_mask=attention_mask,
            sliding_window=tc.sliding_window, impl=attn_impl,
        )
    else:
        x = rms_norm(h, lp["input_layernorm"], tc.rms_norm_eps)
        q = _maybe_lora(x, _lin(x, lp["q_proj"]), lora_layer, "q_proj")
        k = _maybe_lora(x, _lin(x, lp["k_proj"]), lora_layer, "k_proj")
        v = _maybe_lora(x, _lin(x, lp["v_proj"]), lora_layer, "v_proj")
        q = q.reshape(B, S, nh, hd)
        k = k.reshape(B, S, nkv, hd)
        v = v.reshape(B, S, nkv, hd)
        c, s = cos[:, :, None, :], sin[:, :, None, :]
        q = q * c + _rotate_half(q) * s
        k = k * c + _rotate_half(k) * s
        attn = mha(
            q, k, v, causal=True, key_padding_mask=attention_mask,
            sliding_window=tc.sliding_window, impl=attn_impl,
        ).reshape(B, S, nh * hd)
    # NOTE: row_quant for o_proj measured a consistent small LOSS here
    # (qwen 4.67 -> 4.61-4.64, llava 1.44 -> 1.42) while WINNING on phi3
    # (3.66 -> 3.68) — per-shape, like the whole int8 ledger. Only
    # phi3.decoder_layer carries it.
    attn = _maybe_lora(attn, _lin(attn, lp["o_proj"]), lora_layer, "o_proj")
    h = residual + attn

    residual = h
    if "gate_up_proj" in lp:
        if use_rq and is_w8a8(lp["gate_up_proj"]["kernel"]):
            gate_up = _rq_lin(
                h, lp["post_attention_layernorm"], lp["gate_up_proj"]
            )
        else:
            x = rms_norm(h, lp["post_attention_layernorm"], tc.rms_norm_eps)
            gate_up = _lin(x, lp["gate_up_proj"])
        if (
            use_rq
            and is_w8a8(lp["down_proj"]["kernel"])
            and tc.intermediate_size % 128 == 0
        ):
            # silu(gate)*up fused straight to int8 codes for down_proj
            from ..ops.quant_epilogue import silu_mul_quant

            codes, rs = silu_mul_quant(gate_up)
            mlp = int8_linear_pre(codes, rs, lp["down_proj"]["kernel"], h.dtype)
            if "bias" in lp["down_proj"]:
                mlp = mlp + lp["down_proj"]["bias"]
            return residual + mlp
        gate, up = jnp.split(gate_up, 2, axis=-1)
    else:
        x = rms_norm(h, lp["post_attention_layernorm"], tc.rms_norm_eps)
        gate = _maybe_lora(x, _lin(x, lp["gate_proj"]), lora_layer, "gate_proj")
        up = _maybe_lora(x, _lin(x, lp["up_proj"]), lora_layer, "up_proj")
    mlp = silu(gate) * up
    mlp = _maybe_lora(mlp, _lin(mlp, lp["down_proj"]), lora_layer, "down_proj")
    return residual + mlp


class QwenOutput(NamedTuple):
    last_hidden_state: jnp.ndarray
    collected_hidden_state: Optional[jnp.ndarray]
    vision_embedding: Optional[jnp.ndarray]  # (B, U, H) zeroed invalid slots


def text_forward(
    params: dict,
    tc: QwenTextConfig,
    inputs_embeds: jnp.ndarray,
    attention_mask: jnp.ndarray,
    position_ids: jnp.ndarray,  # (3, B, S)
    *,
    collect_layer_id: Optional[int] = None,
    attn_impl: str = "auto",
    remat: bool = False,
    lora: Optional[dict] = None,
):
    cos, sin = _mrope_cos_sin(position_ids, tc, inputs_embeds.dtype)
    collect = collect_layer_id is not None and collect_layer_id < tc.num_layers

    body = _decoder_layer
    if remat:
        body = jax.checkpoint(
            body, static_argnums=(2, 6),
            policy=jax.checkpoint_policies.nothing_saveable,
        )

    def scan_fn(carry, xs):
        h, collected, i = carry
        lp, lora_layer = xs
        h_new = body(h, lp, tc, cos, sin, attention_mask, attn_impl, lora_layer)
        if collect:
            collected = jnp.where(i + 1 == collect_layer_id, h_new, collected)
        return (h_new, collected, i + 1), None

    init_collected = inputs_embeds if collect else jnp.zeros((), inputs_embeds.dtype)
    (h, collected, _), _ = jax.lax.scan(
        scan_fn, (inputs_embeds, init_collected, jnp.int32(0)),
        (params["layers"], lora),
    )
    last = rms_norm(h, params["final_layernorm"], tc.rms_norm_eps)
    return last, (collected if collect else None)


def forward(
    params: dict,
    cfg: Qwen25VLConfig,
    input_ids: jnp.ndarray,  # (B, S)
    attention_mask: jnp.ndarray,
    position_ids: jnp.ndarray,  # (3, B, S)
    patches: Optional[jnp.ndarray],  # (B, P, patch_dim) windowed
    patch_valid: Optional[jnp.ndarray],
    rot_pos: Optional[jnp.ndarray],
    unit_gather: Optional[jnp.ndarray],
    splice_idx: Optional[jnp.ndarray],  # (B, S)
    num_img_tokens: Optional[jnp.ndarray],  # (B,) merged units
    *,
    collect_layer_id: Optional[int] = None,
    attn_impl: str = "auto",
    remat: bool = False,
    lora: Optional[dict] = None,
) -> QwenOutput:
    embeds = params["text"]["embed_tokens"][input_ids]
    dtype = embeds.dtype

    vision_embedding = None
    if patches is not None:
        vision_embedding = vision_forward(
            params["visual"], cfg.vision,
            patches.astype(dtype), patch_valid, rot_pos, unit_gather,
            num_img_tokens, attn_impl=attn_impl, remat=remat,
        ).astype(dtype)
        k = jnp.clip(splice_idx, 0, vision_embedding.shape[1] - 1)
        spliced = jnp.take_along_axis(vision_embedding, k[..., None], axis=1)
        embeds = jnp.where((splice_idx >= 0)[..., None], spliced, embeds)

    last, collected = text_forward(
        params["text"], cfg.text, embeds, attention_mask, position_ids,
        collect_layer_id=collect_layer_id, attn_impl=attn_impl, remat=remat,
        lora=lora,
    )
    return QwenOutput(last, collected, vision_embedding)
