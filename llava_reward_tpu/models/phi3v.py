"""Phi-3.5-V backbone forward: CLIP tower -> HD 2x2 merge -> projector ->
static-shape splice into text embeddings -> Phi-3 decoder.

Reference (modeling_phi3_v.py:118-362, Phi3ImageEmbedding):
- CLIP penultimate patch features (24x24x1024 per 336x336 crop),
- HD transform: 2x2 spatial merge to 4096-d, per-row newline token (sub_GN),
  a glb_GN separator, ordered [sub, GN, global] per image,
- 2-layer GELU MLP projection to hidden_size,
- scatter into text embeddings at negative-token-id positions.

TPU-first redesign (no ragged shapes, no index_put, no per-image Python loop):
the host processor (preprocess/phi3v_processor.py) precomputes, per sample,
  * ``img_gather_idx`` (T_img,): index into a dense per-image "feature bank"
    [(num_crops+1)*144 merged patches] + [sub_GN row] + [glb_GN row], encoding
    exactly the reference's [sub+newline, glb_GN, global+newline] ordering for
    that image's (h_crop, w_crop) geometry;
  * ``splice_idx`` (S,): for each sequence position, the image-token slot it
    takes its embedding from, or -1 for text positions;
  * ``num_img_tokens`` (): valid image-token count.
In-jit everything is dense gathers/wheres over static shapes. The decoder
batch never changes shape with image geometry.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.config import Phi3VConfig
from ..ops.activations import gelu
from . import clip_vit, phi3


def init_params(key: jax.Array, cfg: Phi3VConfig, dtype=jnp.float32) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    D = cfg.merged_feature_dim
    H = cfg.decoder.hidden_size
    std = 0.02

    def dense(k, shape):
        return (jax.random.normal(k, shape) * std).astype(dtype)

    return {
        "decoder": phi3.init_params(k1, cfg.decoder, dtype),
        "vision": {
            "clip": clip_vit.init_params(k2, cfg.vision, dtype),
            "glb_GN": jnp.zeros((D,), dtype),
            "sub_GN": jnp.zeros((D,), dtype),
            "img_projection": {
                "fc1": {"kernel": dense(k3, (D, H)), "bias": jnp.zeros((H,), dtype)},
                "fc2": {"kernel": dense(k4, (H, H)), "bias": jnp.zeros((H,), dtype)},
            },
        },
    }


def merge_2x2(features: jnp.ndarray, grid: int = 24) -> jnp.ndarray:
    """(N, grid*grid, C) -> (N, (grid/2)^2, 4C), matching
    reshape_hd_patches_2x2merge's permute order (modeling_phi3_v.py:305-349):
    output channel blocks are the (2x2) spatial neighbours in row-major order.
    """
    N, L, C = features.shape
    g2 = grid // 2
    x = features.reshape(N, g2, 2, g2, 2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (N, 12, 12, 2, 2, C)
    return x.reshape(N, g2 * g2, 4 * C)


def vision_feature_bank(
    params: dict,
    cfg: Phi3VConfig,
    pixel_values: jnp.ndarray,  # (B, num_crops+1, crop, crop, 3), normalised
    *,
    attn_impl: str = "auto",
    remat: bool = False,
    vision_lora: Optional[dict] = None,
) -> jnp.ndarray:
    """Dense merged-feature bank (B, 2 + NC*merge_grid^2, 4C): rows 0/1 are
    sub_GN/glb_GN, then every crop's merged patches."""
    B, NC, Himg, Wimg, C = pixel_values.shape
    feats = clip_vit.extract_patch_features(
        params["vision"]["clip"],
        cfg.vision,
        pixel_values.reshape(B * NC, Himg, Wimg, C),
        attn_impl=attn_impl,
        remat=remat,
        lora=vision_lora,
    )  # (B*NC, grid^2, image_dim_out)
    grid = cfg.vision.image_size // cfg.vision.patch_size
    merged = merge_2x2(feats, grid)  # (B*NC, (grid/2)^2, 4C)
    D = merged.shape[-1]
    bank = merged.reshape(B, NC * merged.shape[1], D)
    gns = jnp.stack(
        [params["vision"]["sub_GN"], params["vision"]["glb_GN"]], axis=0
    ).astype(bank.dtype)
    # sentinels FIRST: gather indices stay valid however many crop slots
    # follow (crop-count bucketing, multi-image concatenation)
    return jnp.concatenate([jnp.broadcast_to(gns[None], (B, 2, D)), bank], axis=1)


class Phi3VOutput(NamedTuple):
    last_hidden_state: jnp.ndarray  # (B, S, H) post final RMSNorm
    collected_hidden_state: Optional[jnp.ndarray]  # layer_id readout (pre-norm)
    vision_embedding: Optional[jnp.ndarray]  # (B, T_img, H), zero on invalid slots
    # (matches the reference's padded per-image vision batch appended to
    #  hidden_states, modeling_phi3_v.py:242-252,1505)


def forward(
    params: dict,
    cfg: Phi3VConfig,
    input_ids: jnp.ndarray,  # (B, S) int32, image slots hold pad/0 (clamped)
    attention_mask: jnp.ndarray,  # (B, S) 1=valid
    position_ids: jnp.ndarray,  # (B, S)
    pixel_values: Optional[jnp.ndarray],  # (B, num_crops+1, crop, crop, 3)
    img_gather_idx: Optional[jnp.ndarray],  # (B, T_img) into the feature bank
    splice_idx: Optional[jnp.ndarray],  # (B, S) slot index or -1
    num_img_tokens: Optional[jnp.ndarray],  # (B,) valid slots
    *,
    collect_layer_id: Optional[int] = None,
    attn_impl: str = "auto",
    remat: bool = False,
    lora: Optional[dict] = None,
    vision_lora: Optional[dict] = None,  # stacked CLIP LoRA (train_vision)
) -> Phi3VOutput:
    embeds = params["decoder"]["embed_tokens"][input_ids]
    dtype = embeds.dtype

    vision_embedding = None
    if pixel_values is not None:
        bank = vision_feature_bank(
            params, cfg, pixel_values.astype(dtype),
            attn_impl=attn_impl, remat=remat, vision_lora=vision_lora,
        )  # (B, bank_len, 4C)
        gathered = jnp.take_along_axis(
            bank, img_gather_idx[..., None], axis=1
        )  # (B, T_img, 4C)
        proj = params["vision"]["img_projection"]
        x = gelu(gathered @ proj["fc1"]["kernel"] + proj["fc1"]["bias"])
        img_tokens = x @ proj["fc2"]["kernel"] + proj["fc2"]["bias"]  # (B, T_img, H)
        # zero invalid slots so the SkipCA zero-pad semantics match the
        # reference's zero-padded per-image batch (modeling_phi3_v.py:242-249)
        slot = jnp.arange(img_tokens.shape[1])[None, :]
        valid = (slot < num_img_tokens[:, None])[..., None]
        vision_embedding = jnp.where(valid, img_tokens, 0).astype(dtype)

        # splice image tokens into the text embedding stream
        k = jnp.clip(splice_idx, 0, img_tokens.shape[1] - 1)
        spliced = jnp.take_along_axis(vision_embedding, k[..., None], axis=1)
        embeds = jnp.where((splice_idx >= 0)[..., None], spliced, embeds)

    out = phi3.forward(
        params["decoder"],
        cfg.decoder,
        embeds,
        attention_mask,
        position_ids,
        collect_layer_id=collect_layer_id,
        attn_impl=attn_impl,
        remat=remat,
        lora=lora,
    )
    return Phi3VOutput(
        last_hidden_state=out.last_hidden_state,
        collected_hidden_state=out.collected_hidden_state,
        vision_embedding=vision_embedding,
    )
