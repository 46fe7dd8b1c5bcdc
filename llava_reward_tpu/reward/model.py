"""The reward model: backbone forward + SkipCA + pooling + value-head readout.

Functional equivalent of CustomRewardModel.custom_forward
(rw_model_general_preference.py:290-485), jit-compiled end to end. The pair
(chosen, rejected) is scored by stacking along the batch axis in ONE forward
— the reference's "concatenated_forward" actually runs two sequential
forwards (rm_trainer_general_preference.py:447-460); batching is both faster
and semantically identical.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.config import (
    LlavaNextConfig,
    Phi3VConfig,
    Qwen25VLConfig,
    RewardConfig,
)
from ..models import llava_next, phi3v, qwen25_vl
from . import heads, skipca


def _is_qwen(cfg) -> bool:
    return isinstance(cfg, Qwen25VLConfig)


def _is_llava(cfg) -> bool:
    return isinstance(cfg, LlavaNextConfig)


def hidden_size_of(cfg) -> int:
    return cfg.text.hidden_size if hasattr(cfg, "text") else cfg.decoder.hidden_size


def num_layers_of(cfg) -> int:
    return cfg.text.num_layers if hasattr(cfg, "text") else cfg.decoder.num_layers


def rms_eps_of(cfg) -> float:
    return cfg.text.rms_norm_eps if hasattr(cfg, "text") else cfg.decoder.rms_norm_eps


class RewardBatch(NamedTuple):
    """Static-shape device batch produced by the processor/collator.

    Phi3V uses (pixel_values, img_gather_idx); Qwen2.5-VL reuses
    ``pixel_values`` for its windowed patch array plus the qwen-only
    fields (position_ids (3, B, S) M-RoPE, patch_valid, rot_pos,
    unit_gather)."""

    input_ids: jnp.ndarray  # (B, S)
    attention_mask: jnp.ndarray  # (B, S)
    pixel_values: Optional[jnp.ndarray]  # phi3v: (B, crops+1, 336, 336, 3); qwen: (B, P, patch_dim)
    img_gather_idx: Optional[jnp.ndarray]  # (B, T_img) phi3v feature-bank gather
    splice_idx: Optional[jnp.ndarray]  # (B, S)
    num_img_tokens: Optional[jnp.ndarray]  # (B,)
    position_ids: Optional[jnp.ndarray] = None  # qwen M-RoPE (3, B, S)
    patch_valid: Optional[jnp.ndarray] = None  # qwen (B, P)
    rot_pos: Optional[jnp.ndarray] = None  # qwen (B, P, 2)
    unit_gather: Optional[jnp.ndarray] = None  # qwen (B, U)
    crop_grid: Optional[jnp.ndarray] = None  # phi3v u8 path: (B, 2) (hc, wc)
    # when pixel_values is uint8 (B, nc, 336, 336, 3) CROPS-ONLY, the
    # device computes normalisation + the global bicubic (ops/pixels.py)
    resize_tabs: Optional[dict] = None  # device-RESIZE path: pixel_values is
    # the DECODED u8 original (B, Hs, Ws, 3) + these bilinear tap tables;
    # the HD resize itself runs on device (ops/pixels.hd_resize_u8_bank)


class RewardOutput(NamedTuple):
    reward: jnp.ndarray  # (B, value_head_dim)
    prompt_hidden: Optional[jnp.ndarray]  # (B, H) for the MoE prompt head
    last_hidden: Optional[jnp.ndarray]  # RAW backbone last_hidden_state
    # (pre-SkipCA — the reference's MoE prompt gather and ptx logits both
    #  read outputs["last_hidden_state"], rm_trainer…py:169-171,178-208)


def init_head_params(
    key: jax.Array, cfg, rcfg: RewardConfig, dtype=jnp.float32
) -> dict:
    """Initialise the trainable reward-specific modules (value head, optional
    SkipCA and prompt head) — rw_model_general_preference.py:235-284."""
    k1, k2, k3 = jax.random.split(key, 3)
    H = hidden_size_of(cfg)
    dim = rcfg.value_head_dim if rcfg.is_general_preference else 1
    p = {"value_head": heads.init_value_head(k1, H, dim, dtype)}
    if rcfg.add_cross_attention:
        p["skipca"] = skipca.init_params(k2, H, dtype)
    if rcfg.is_general_preference and rcfg.add_prompt_head:
        p["prompt_head"] = heads.init_prompt_head(k3, H, rcfg.value_head_dim, dtype)
    return p


def reward_forward(
    params: dict,  # {'backbone': phi3v tree, 'head': head tree}
    cfg: Phi3VConfig,
    rcfg: RewardConfig,
    batch: RewardBatch,
    *,
    training: bool = False,
    attn_impl: str = "auto",
    remat: bool = False,
    lora: Optional[dict] = None,
    vision_lora: Optional[dict] = None,
    prompt_end_index: Optional[jnp.ndarray] = None,  # (B,) for MoE prompt head
    skipca_batch_max: Optional[jnp.ndarray] = None,  # (B,) see skipca.apply
) -> RewardOutput:
    attention_mask = batch.attention_mask
    collect = None if rcfg.layer_id >= num_layers_of(cfg) else rcfg.layer_id

    if _is_qwen(cfg):
        assert batch.position_ids is not None, "qwen needs M-RoPE position_ids"
        out = qwen25_vl.forward(
            params["backbone"],
            cfg,
            batch.input_ids,
            attention_mask,
            batch.position_ids,
            batch.pixel_values,
            batch.patch_valid,
            batch.rot_pos,
            batch.unit_gather,
            batch.splice_idx,
            batch.num_img_tokens,
            collect_layer_id=collect,
            attn_impl=attn_impl,
            remat=remat,
            lora=lora,
        )
        skipca_mode = "qwen"  # per-sample -1e4 mask (rw:390)
    elif _is_llava(cfg):
        out = llava_next.forward(
            params["backbone"],
            cfg,
            batch.input_ids,
            attention_mask,
            batch.pixel_values,
            batch.img_gather_idx,
            batch.splice_idx,
            batch.num_img_tokens,
            collect_layer_id=collect,
            attn_impl=attn_impl,
            remat=remat,
            lora=lora,
        )
        # SkipCA is not wired for llava in the reference (rw:372-375)
        skipca_mode = None
    else:
        # position_ids = cumsum(mask)-1 with pads forced to 1 (rw:344-345)
        position_ids = jnp.cumsum(attention_mask.astype(jnp.int32), axis=-1) - 1
        position_ids = jnp.where(attention_mask == 0, 1, position_ids)
        pixel_values = batch.pixel_values
        if pixel_values is not None and pixel_values.dtype == jnp.uint8:
            # device-side preprocessing path: u8 crops -> normalised bank
            # with the MXU-computed global view (ops/pixels.py)
            from ..ops.pixels import hd_resize_u8_bank, prepare_pixel_bank

            assert batch.crop_grid is not None, "u8 pixels need crop_grid"
            if batch.resize_tabs is not None:
                # device-RESIZE path: decoded original -> PIL-exact bilinear
                # HD resize + white-pad + crop split, all on device
                t = batch.resize_tabs
                pixel_values = hd_resize_u8_bank(
                    pixel_values, t["hidx"], t["hw"], t["vidx"], t["vw"],
                    t["vbias"], t["col_start"], t["slot_perm"], t["tflag"],
                )
            pixel_values = prepare_pixel_bank(
                pixel_values, batch.crop_grid, dtype=jnp.float32
            )
        out = phi3v.forward(
            params["backbone"],
            cfg,
            batch.input_ids,
            attention_mask,
            position_ids,
            pixel_values,
            batch.img_gather_idx,
            batch.splice_idx,
            batch.num_img_tokens,
            collect_layer_id=collect,
            attn_impl=attn_impl,
            remat=remat,
            lora=lora,
            vision_lora=vision_lora,
        )
        skipca_mode = "phi3v"

    hidden = (
        out.last_hidden_state if collect is None else out.collected_hidden_state
    )

    if (
        rcfg.add_cross_attention
        and skipca_mode is not None
        and out.vision_embedding is not None
    ):
        hidden = skipca.apply(
            params["head"]["skipca"],
            hidden,
            out.vision_embedding,
            batch.num_img_tokens,
            rms_eps=rms_eps_of(cfg),
            mode=skipca_mode,
            batch_max=skipca_batch_max,
        )

    if rcfg.mean_hidden_state:
        pooled = heads.masked_mean_pool(hidden, attention_mask)
        values = heads.apply_value_head(params["head"]["value_head"], pooled)
        reward = values
    else:
        values = heads.apply_value_head(params["head"]["value_head"], hidden)
        reward = heads.readout(
            values, attention_mask, training=training, mean_pooled=False
        )

    prompt_hidden = None
    if prompt_end_index is not None:
        prompt_hidden = jnp.take_along_axis(
            out.last_hidden_state, prompt_end_index[:, None, None], axis=1
        )[:, 0, :]

    return RewardOutput(
        reward=reward,
        prompt_hidden=prompt_hidden,
        last_hidden=out.last_hidden_state,
    )


def paired_forward(
    params: dict,
    cfg: Phi3VConfig,
    rcfg: RewardConfig,
    chosen: RewardBatch,
    rejected: RewardBatch,
    *,
    training: bool = True,
    attn_impl: str = "auto",
    remat: bool = False,
    lora: Optional[dict] = None,
    vision_lora: Optional[dict] = None,
    prompt_end_index: Optional[jnp.ndarray] = None,
):
    """Score (chosen, rejected) in one stacked forward. Both batches must be
    padded to the same static S (the collator guarantees this)."""

    def cat(a, b):
        if a is None:
            return None
        return jnp.concatenate([a, b], axis=0)

    fields = {}
    for name, a, b in zip(RewardBatch._fields, chosen, rejected):
        if name == "position_ids" and a is not None:
            fields[name] = jnp.concatenate([a, b], axis=1)  # (3, B, S) batch axis
        else:
            fields[name] = cat(a, b)
    stacked = RewardBatch(**fields)
    # The reference runs chosen and rejected as two SEPARATE forwards, so each
    # half's SkipCA zero-pad width is that half's own max image-token count
    # (phi3v's zero-column semantics only; qwen masks per sample).
    skipca_bm = None
    if (
        rcfg.add_cross_attention
        and not _is_qwen(cfg)
        and chosen.num_img_tokens is not None
    ):
        Bc = chosen.input_ids.shape[0]
        skipca_bm = jnp.concatenate(
            [
                jnp.broadcast_to(jnp.max(chosen.num_img_tokens), (Bc,)),
                jnp.broadcast_to(jnp.max(rejected.num_img_tokens), (Bc,)),
            ]
        )
    out = reward_forward(
        params,
        cfg,
        rcfg,
        stacked,
        training=training,
        attn_impl=attn_impl,
        remat=remat,
        lora=lora,
        vision_lora=vision_lora,
        prompt_end_index=(
            cat(prompt_end_index, prompt_end_index)
            if prompt_end_index is not None
            else None
        ),
        skipca_batch_max=skipca_bm,
    )
    B = chosen.input_ids.shape[0]
    chosen_reward, reject_reward = out.reward[:B], out.reward[B:]
    prompt_hidden = out.prompt_hidden[:B] if out.prompt_hidden is not None else None
    chosen_last_hidden = (
        out.last_hidden[:B] if out.last_hidden is not None else None
    )
    return chosen_reward, reject_reward, prompt_hidden, chosen_last_hidden
