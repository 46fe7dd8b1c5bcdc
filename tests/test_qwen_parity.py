"""Qwen2.5-VL parity vs HF on tiny random-init configs (fp32, CPU)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from llava_reward_tpu.core.config import qwen_tiny_config
from llava_reward_tpu.io.hf_qwen import params_from_hf_state_dict
from llava_reward_tpu.models import qwen25_vl
from llava_reward_tpu.preprocess.qwen_vision import (
    _merged_block_pos,
    image_to_patches,
    mrope_position_ids,
    smart_resize,
    windowize,
)


def _hf_model(cfg, seed=0):
    from transformers import Qwen2_5_VLConfig
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VLForConditionalGeneration,
    )

    torch.manual_seed(seed)
    tc, vc = cfg.text, cfg.vision
    hf_cfg = Qwen2_5_VLConfig(
        text_config=dict(
            vocab_size=tc.vocab_size,
            hidden_size=tc.hidden_size,
            intermediate_size=tc.intermediate_size,
            num_hidden_layers=tc.num_layers,
            num_attention_heads=tc.num_heads,
            num_key_value_heads=tc.num_kv_heads,
            rms_norm_eps=tc.rms_norm_eps,
            rope_theta=tc.rope_theta,
            rope_scaling={"type": "mrope", "mrope_section": list(tc.mrope_section)},
            attention_dropout=0.0,
            max_position_embeddings=4096,
        ),
        vision_config=dict(
            depth=vc.depth,
            hidden_size=vc.hidden_size,
            intermediate_size=vc.intermediate_size,
            num_heads=vc.num_heads,
            patch_size=vc.patch_size,
            temporal_patch_size=vc.temporal_patch_size,
            spatial_merge_size=vc.spatial_merge_size,
            window_size=vc.window_size,
            fullatt_block_indexes=list(vc.fullatt_block_indexes),
            out_hidden_size=vc.out_hidden_size,
            in_channels=vc.in_channels,
        ),
        image_token_id=tc.image_token_id,
        vocab_size=tc.vocab_size,
    )
    model = Qwen2_5_VLForConditionalGeneration(hf_cfg).eval()
    return model


def test_smart_resize_matches_spec():
    # independent brute-force of the spec (vision_process.py:59-85)
    import math

    for (h, w) in [(480, 640), (1000, 333), (28, 28), (900, 300)]:
        hb, wb = smart_resize(h, w, 28, 4 * 28 * 28, 16 * 28 * 28)
        assert hb % 28 == 0 and wb % 28 == 0
        assert 4 * 28 * 28 <= hb * wb or (hb == 28 or wb == 28)
        assert hb * wb <= 16 * 28 * 28 or hb * wb >= 4 * 28 * 28


def test_image_to_patches_matches_hf_processor():
    from PIL import Image

    try:
        from transformers import Qwen2VLImageProcessor
    except ImportError:
        pytest.skip("no Qwen2VLImageProcessor")

    rng = np.random.default_rng(0)
    img = Image.fromarray((rng.random((90, 130, 3)) * 255).astype(np.uint8))
    min_px, max_px = 4 * 28 * 28, 16 * 28 * 28
    ours, grid = image_to_patches(img, min_pixels=min_px, max_pixels=max_px)

    hf = Qwen2VLImageProcessor(
        min_pixels=min_px, max_pixels=max_px, patch_size=14,
        temporal_patch_size=2, merge_size=2,
    )
    out = hf(images=[img], return_tensors="np")
    ref = out["pixel_values"]
    ref_grid = out["image_grid_thw"][0]
    assert tuple(ref_grid) == grid
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-2)  # PIL resample diffs


def test_vision_tower_parity():
    cfg = qwen_tiny_config(vision_depth=4, vision_hidden=32)
    hf = _hf_model(cfg)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = params_from_hf_state_dict(sd, cfg)

    from PIL import Image

    rng = np.random.default_rng(1)
    img = Image.fromarray((rng.random((112, 168, 3)) * 255).astype(np.uint8))
    patches, grid = image_to_patches(
        img, min_pixels=cfg.min_pixels, max_pixels=cfg.max_pixels
    )

    with torch.no_grad():
        ref = hf.model.visual(
            torch.from_numpy(patches), torch.tensor([list(grid)])
        ).numpy()  # (n_units, out)

    patch_src, patch_valid, unit_gather, _ = windowize(grid)
    pw = patches[patch_src] * patch_valid[:, None]
    rot = _merged_block_pos(grid[1], grid[2], 2)[patch_src]
    n_units = ref.shape[0]
    ours = qwen25_vl.vision_forward(
        params["visual"], cfg.vision,
        jnp.asarray(pw[None]), jnp.asarray(patch_valid[None]),
        jnp.asarray(rot[None]), jnp.asarray(unit_gather[None]),
        jnp.asarray(np.array([n_units], np.int32)),
        attn_impl="xla",
    )
    np.testing.assert_allclose(np.asarray(ours)[0], ref, rtol=3e-4, atol=3e-4)


def test_text_decoder_parity_mrope():
    cfg = qwen_tiny_config(num_layers=3)
    hf = _hf_model(cfg)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = params_from_hf_state_dict(sd, cfg)

    rng = np.random.default_rng(2)
    B, S = 2, 10
    tc = cfg.text
    ids = rng.integers(0, 100, (B, S)).astype(np.int32)
    mask = np.ones((B, S), np.int32)
    mask[0, :3] = 0
    # synthetic 3-axis positions (as if an image were present)
    pos = np.stack(
        [np.tile(np.arange(S), (B, 1)), np.tile(np.arange(S), (B, 1)) + 1,
         np.tile(np.arange(S), (B, 1)) + 2]
    ).astype(np.int32)

    embeds = params["text"]["embed_tokens"][ids]
    last, _ = qwen25_vl.text_forward(
        params["text"], tc, jnp.asarray(embeds), jnp.asarray(mask),
        jnp.asarray(pos), attn_impl="xla",
    )

    text_model = hf.model.language_model if hasattr(hf.model, "language_model") else hf.model
    with torch.no_grad():
        ref = text_model(
            inputs_embeds=torch.from_numpy(embeds),
            attention_mask=torch.from_numpy(mask.astype(np.int64)),
            position_ids=torch.from_numpy(pos.astype(np.int64)),
        ).last_hidden_state.numpy()
    valid = mask.astype(bool)
    np.testing.assert_allclose(
        np.asarray(last)[valid], ref[valid], rtol=3e-4, atol=3e-4
    )


def test_full_forward_with_splice_matches_hf():
    cfg = qwen_tiny_config(num_layers=2, vision_depth=2)
    hf = _hf_model(cfg)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = params_from_hf_state_dict(sd, cfg)

    from PIL import Image

    rng = np.random.default_rng(3)
    img = Image.fromarray((rng.random((80, 80, 3)) * 255).astype(np.uint8))
    patches, grid = image_to_patches(
        img, min_pixels=cfg.min_pixels, max_pixels=cfg.max_pixels
    )
    n_units = (grid[1] // 2) * (grid[2] // 2)
    tc = cfg.text

    # well-formed vision span: HF's get_rope_index keys off
    # vision_start_token_id (modeling_qwen2_5_vl.py:956-1139)
    vstart = 101  # matches Qwen2_5_VLConfig default offsets below
    hf.config.vision_start_token_id = vstart
    hf.model.config.vision_start_token_id = vstart
    prefix = rng.integers(0, 100, 3).astype(np.int32)
    suffix = rng.integers(0, 100, 2).astype(np.int32)
    ids = np.concatenate(
        [prefix, [vstart], np.full(n_units, tc.image_token_id, np.int32), suffix]
    )
    S = len(ids)
    mask = np.ones((1, S), np.int32)
    pos = mrope_position_ids(ids, tc.image_token_id, grid)[:, None, :]  # (3,1,S)

    splice = np.full(S, -1, np.int32)
    splice[4 : 4 + n_units] = np.arange(n_units)
    patch_src, patch_valid, unit_gather, _ = windowize(grid)
    pw = patches[patch_src] * patch_valid[:, None]
    rot = _merged_block_pos(grid[1], grid[2], 2)[patch_src]

    out = qwen25_vl.forward(
        params, cfg,
        jnp.asarray(ids[None]), jnp.asarray(mask), jnp.asarray(pos),
        jnp.asarray(pw[None]), jnp.asarray(patch_valid[None]),
        jnp.asarray(rot[None]), jnp.asarray(unit_gather[None]),
        jnp.asarray(splice[None]), jnp.asarray(np.array([n_units], np.int32)),
        attn_impl="xla",
    )

    with torch.no_grad():
        ref = hf.model(
            input_ids=torch.from_numpy(ids[None].astype(np.int64)),
            attention_mask=torch.from_numpy(mask.astype(np.int64)),
            pixel_values=torch.from_numpy(patches),
            image_grid_thw=torch.tensor([list(grid)]),
        ).last_hidden_state.numpy()
    np.testing.assert_allclose(
        np.asarray(out.last_hidden_state)[0], ref[0], rtol=5e-4, atol=5e-4
    )
