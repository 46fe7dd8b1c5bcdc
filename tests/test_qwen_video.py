"""Qwen2.5-VL VIDEO path (VERDICT r1 item 8): smart_nframes / frame
sampling / temporal patches / video M-RoPE vs HF's own implementations
(reference: qwen_vl_utils/vision_process.py:143-331)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from llava_reward_tpu.core.config import qwen_tiny_config
from llava_reward_tpu.preprocess.qwen_video import (
    FRAME_FACTOR,
    fetch_video,
    frames_to_patches,
    mrope_position_ids_video,
    smart_nframes,
    windowize_video,
)
from llava_reward_tpu.preprocess.qwen_vision import _merged_block_pos, windowize


def test_smart_nframes_semantics():
    # fps mode: total/video_fps*FPS, bounded, FRAME_FACTOR-floored
    assert smart_nframes({}, total_frames=100, video_fps=25.0) == 8  # 100/25*2
    assert smart_nframes({}, total_frames=6, video_fps=30.0) == 4  # min_frames
    assert smart_nframes({"fps": 10}, total_frames=50, video_fps=25.0) == 20
    assert smart_nframes({"nframes": 7}, total_frames=50, video_fps=25.0) == 8
    with pytest.raises(ValueError):
        smart_nframes({"nframes": 80}, total_frames=50, video_fps=25.0)


def test_fetch_video_array_sampling(rng):
    vid = (rng.random((30, 60, 90, 3)) * 255).astype(np.uint8)
    frames, sample_fps = fetch_video({"video": vid, "video_fps": 15.0})
    assert frames.shape[0] == 4  # 30/15*2 = 4
    assert frames.shape[1] % 28 == 0 and frames.shape[2] % 28 == 0
    assert sample_fps == pytest.approx(15.0 * 4 / 30)
    # frame-list input pads to FRAME_FACTOR
    from PIL import Image

    imgs = [Image.fromarray(vid[i]) for i in range(3)]
    frames2, _ = fetch_video({"video": imgs})
    assert frames2.shape[0] % FRAME_FACTOR == 0


def test_frames_to_patches_matches_hf(rng):
    from transformers import Qwen2VLImageProcessor

    v = (rng.random((4, 56, 84, 3)) * 255).astype(np.uint8)
    hf = Qwen2VLImageProcessor(min_pixels=4 * 28 * 28, max_pixels=256 * 28 * 28)
    out = hf(images=None, videos=[list(v)], return_tensors="np")
    patches, grid = frames_to_patches(v.astype(np.float32))
    assert tuple(out["video_grid_thw"][0]) == grid
    np.testing.assert_allclose(
        patches, out["pixel_values_videos"], atol=2e-5, rtol=1e-5
    )


def test_mrope_video_matches_hf_get_rope_index(rng):
    from test_qwen_parity import _hf_model

    cfg = qwen_tiny_config()
    hf = _hf_model(cfg)
    tc = cfg.text
    vstart = 101
    video_id = 102
    for c in (hf.config, hf.model.config):
        c.vision_start_token_id = vstart
        c.video_token_id = video_id

    grid = (2, 4, 6)  # gt, gh, gw -> 2*2*3 = 12 merged units
    n = 2 * 2 * 3
    ids = np.concatenate([
        rng.integers(0, 100, 3).astype(np.int64), [vstart],
        np.full(n, video_id, np.int64),
        rng.integers(0, 100, 2).astype(np.int64),
    ])
    spgt = 0.5
    pos_hf, _ = hf.model.get_rope_index(
        torch.from_numpy(ids[None]),
        image_grid_thw=None,
        video_grid_thw=torch.tensor([list(grid)]),
        second_per_grid_ts=torch.tensor([spgt]),
        attention_mask=torch.ones(1, len(ids), dtype=torch.long),
    )
    tokens_per_second = getattr(hf.config.vision_config, "tokens_per_second", 2.0)
    ours = mrope_position_ids_video(
        ids.astype(np.int32), video_id, grid,
        second_per_grid_t=spgt, tokens_per_second=tokens_per_second,
    )
    np.testing.assert_array_equal(ours, pos_hf[:, 0].numpy())


def test_windowize_video_consistency():
    grid = (2, 8, 12)
    src, seg, gather, n_win = windowize_video(grid)
    src1, valid1, gather1, n_win1 = windowize((1, 8, 12))
    assert n_win == 2 * n_win1
    assert src.shape[0] == 2 * src1.shape[0]
    # slice 1's sources offset by one slice of patches
    np.testing.assert_array_equal(src[src1.shape[0]:], src1 + 8 * 12)
    # segment ids: slice t -> t+1 on valid slots, 0 on pads
    np.testing.assert_array_equal(seg[: src1.shape[0]], valid1.astype(np.int32))
    np.testing.assert_array_equal(seg[src1.shape[0]:], valid1.astype(np.int32) * 2)
    # unit gather is a permutation of valid windowed unit slots
    units = gather.shape[0]
    assert units == 2 * gather1.shape[0]
    assert len(set(gather.tolist())) == units


def test_video_forward_matches_hf(rng):
    """End-to-end: our processor video sample through qwen25_vl.forward vs
    the HF model fed pixel_values_videos (same random weights)."""
    from test_qwen_parity import _hf_model

    from llava_reward_tpu.io.hf_qwen import params_from_hf_state_dict
    from llava_reward_tpu.models import qwen25_vl
    from llava_reward_tpu.preprocess.qwen_vision import Qwen25VLProcessor

    cfg = qwen_tiny_config(vision_depth=4, vision_hidden=32)
    hf = _hf_model(cfg)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = params_from_hf_state_dict(sd, cfg)
    tc = cfg.text

    class Tok:
        def __call__(self, text):
            return {"input_ids": [hash(t) % 90 + 3 for t in text.split()]}

    proc = Qwen25VLProcessor(
        Tok(), min_pixels=4 * 28 * 28, max_pixels=256 * 28 * 28,
        window_size=cfg.vision.window_size, image_token_id=tc.image_token_id,
    )
    proc.VIDEO_TOKEN_ID = tc.image_token_id + 1

    vid = (rng.random((4, 56, 84, 3)) * 255).astype(np.uint8)

    vstart = 101  # HF's get_rope_index keys off vision_start_token_id

    class TokV(Tok):
        def __call__(self, text):
            ids = []
            for t in text.split():
                if t == "<|video_pad|>":
                    ids.append(proc.VIDEO_TOKEN_ID)
                elif t == "<|vision_start|>":
                    ids.append(vstart)
                else:
                    ids.append(hash(t) % 90 + 3)
            return {"input_ids": ids}

    proc.tokenizer = TokV()
    for c in (hf.config, hf.model.config):
        c.vision_start_token_id = vstart
    s = proc(
        "describe <|vision_start|> <|video_pad|> now",
        videos=[{"video": vid, "nframes": 4}],
    )
    assert s.grid_thw[0] == 2 and s.num_img_tokens == s.grid_thw[0] * (
        s.grid_thw[1] // 2
    ) * (s.grid_thw[2] // 2)

    out = qwen25_vl.forward(
        params, cfg,
        jnp.asarray(s.input_ids[None]),
        jnp.asarray(s.attention_mask[None]),
        jnp.asarray(s.position_ids[:, None, :]),
        jnp.asarray(s.patches[None]),
        jnp.asarray(s.patch_valid[None]),
        jnp.asarray(s.rot_pos[None]),
        jnp.asarray(s.unit_gather[None]),
        jnp.asarray(s.splice_idx[None]),
        jnp.asarray(np.asarray([s.num_img_tokens], np.int32)),
        attn_impl="xla",
    )

    video_id = proc.VIDEO_TOKEN_ID
    for c in (hf.config, hf.model.config):
        c.video_token_id = video_id
    with torch.no_grad():
        hf_out = hf.model(
            input_ids=torch.from_numpy(s.input_ids[None].astype(np.int64)),
            attention_mask=torch.ones(1, len(s.input_ids), dtype=torch.long),
            pixel_values_videos=torch.from_numpy(_unwindow(s)),
            video_grid_thw=torch.tensor([list(s.grid_thw)]),
            second_per_grid_ts=torch.tensor([1.0]),
            output_hidden_states=True,
        )
    ours = np.asarray(out.last_hidden_state[0], np.float32)
    ref = hf_out.last_hidden_state[0].numpy()
    assert np.abs(ours - ref).max() < 2e-3, np.abs(ours - ref).max()


def _unwindow(s):
    """Recover original-order patches from the windowed layout for HF."""
    from llava_reward_tpu.preprocess.qwen_video import windowize_video

    src, seg, _, _ = windowize_video(s.grid_thw)
    valid = seg > 0
    out = np.zeros((int(valid.sum()), s.patches.shape[1]), np.float32)
    out[src[valid]] = s.patches[valid]
    return out
