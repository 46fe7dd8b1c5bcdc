"""LLaVA-v1.6 (LlavaNext) backbone: CLIP tower + anyres gather + projector
+ vicuna decoder.

Reference path: plain HF LlavaNextForConditionalGeneration forward with the
last hidden state only; SkipCA is NOT wired for llava
(rw_model_general_preference.py:372-375). HF semantics rebuilt TPU-first:
the ragged pack_image_features/unpad assembly becomes a host-precomputed
gather over a dense projected-feature bank (preprocess/llava_processor.py),
and the vicuna decoder reuses the scanned qwen text stack (separate
q/k/v/gate/up without biases, standard rope).

Param tree:
  {'vision': {'clip': <clip_vit tree>,
              'projector': {'fc1'|'fc2': {kernel, bias}},
              'image_newline': (H,)},
   'text': <qwen25_vl text tree (no qkv biases)>}
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.config import LlavaNextConfig
from ..ops.activations import ACT2FN
from . import clip_vit, qwen25_vl


def init_params(key: jax.Array, cfg: LlavaNextConfig, dtype=jnp.float32) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    VH = cfg.vision.hidden_size
    H = cfg.text.hidden_size
    std = 0.02

    def dense(k, shape):
        return (jax.random.normal(k, shape) * std).astype(dtype)

    text = qwen25_vl.init_text_params(k1, cfg.text, dtype)
    # vicuna has no qkv biases
    for name in ("q_proj", "k_proj", "v_proj"):
        text["layers"][name].pop("bias", None)
    return {
        "vision": {
            "clip": clip_vit.init_params(k2, cfg.vision, dtype),
            "projector": {
                "fc1": {"kernel": dense(k3, (VH, H)), "bias": jnp.zeros((H,), dtype)},
                "fc2": {"kernel": dense(k4, (H, H)), "bias": jnp.zeros((H,), dtype)},
            },
            "image_newline": jnp.zeros((H,), dtype),
        },
        "text": text,
    }


class LlavaOutput(NamedTuple):
    last_hidden_state: jnp.ndarray
    collected_hidden_state: Optional[jnp.ndarray]
    vision_embedding: Optional[jnp.ndarray]


def forward(
    params: dict,
    cfg: LlavaNextConfig,
    input_ids: jnp.ndarray,  # (B, S)
    attention_mask: jnp.ndarray,
    pixel_values: Optional[jnp.ndarray],  # (B, 1+max_tiles, 336, 336, 3)
    img_gather_idx: Optional[jnp.ndarray],  # (B, T_img) into the bank
    splice_idx: Optional[jnp.ndarray],  # (B, S)
    num_img_tokens: Optional[jnp.ndarray],  # (B,)
    *,
    collect_layer_id: Optional[int] = None,
    attn_impl: str = "auto",
    remat: bool = False,
    lora: Optional[dict] = None,
) -> LlavaOutput:
    embeds = params["text"]["embed_tokens"][input_ids]
    dtype = embeds.dtype

    vision_embedding = None
    if pixel_values is not None:
        B, NT, Hc, Wc, C = pixel_values.shape
        feats = clip_vit.extract_patch_features(
            params["vision"]["clip"],
            cfg.vision,
            pixel_values.reshape(B * NT, Hc, Wc, C).astype(dtype),
            attn_impl=attn_impl,
            remat=remat,
        )  # (B*NT, 576, VH)
        proj = params["vision"]["projector"]
        act = ACT2FN[cfg.projector_hidden_act]
        x = act(feats @ proj["fc1"]["kernel"] + proj["fc1"]["bias"])
        x = x @ proj["fc2"]["kernel"] + proj["fc2"]["bias"]  # (B*NT, 576, H)
        H = x.shape[-1]
        bank = x.reshape(B, NT * x.shape[1], H)
        newline = jnp.broadcast_to(
            params["vision"]["image_newline"][None, None, :], (B, 1, H)
        ).astype(bank.dtype)
        # newline row LEADS (llava_processor.NEWLINE_IDX == 0): gather
        # indices stay valid when the collator pads the tile axis
        bank = jnp.concatenate([newline, bank], axis=1)

        gathered = jnp.take_along_axis(bank, img_gather_idx[..., None], axis=1)
        slot = jnp.arange(gathered.shape[1])[None, :]
        valid = (slot < num_img_tokens[:, None])[..., None]
        vision_embedding = jnp.where(valid, gathered, 0).astype(dtype)

        k = jnp.clip(splice_idx, 0, vision_embedding.shape[1] - 1)
        spliced = jnp.take_along_axis(vision_embedding, k[..., None], axis=1)
        embeds = jnp.where((splice_idx >= 0)[..., None], spliced, embeds)

    # vicuna: standard rope == degenerate mrope; positions = cumsum(mask)-1
    pos1d = jnp.cumsum(attention_mask.astype(jnp.int32), axis=-1) - 1
    pos1d = jnp.where(attention_mask == 0, 1, pos1d)
    position_ids = jnp.broadcast_to(pos1d[None], (3,) + pos1d.shape)

    last, collected = qwen25_vl.text_forward(
        params["text"], cfg.text, embeds, attention_mask, position_ids,
        collect_layer_id=collect_layer_id, attn_impl=attn_impl, remat=remat,
        lora=lora,
    )
    return LlavaOutput(last, collected, vision_embedding)
