"""Device-side preprocessing (ops/pixels.py): u8 crop banks + on-device
normalise/global-bicubic vs the host f32 path (VERDICT r1 item 5; replaces
the reference's host torchvision ops, processing_phi3_v.py:62-136,265)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from PIL import Image

from llava_reward_tpu.core.config import RewardConfig, phi3v_tiny_config
from llava_reward_tpu.models import phi3v
from llava_reward_tpu.ops.pixels import MAX_GRID, prepare_pixel_bank
from llava_reward_tpu.preprocess.collate import collate_samples, to_reward_batch
from llava_reward_tpu.preprocess.phi3v_processor import (
    Phi3VProcessor,
    hd_transform_image,
    host_bank_from_u8,
    preprocess_image,
)
from llava_reward_tpu.reward import init_head_params
from llava_reward_tpu.reward.model import reward_forward


@pytest.mark.parametrize("size", [(500, 400), (336, 700), (1400, 200)])
def test_prepare_pixel_bank_matches_host(rng, size):
    img = Image.fromarray((rng.random((size[1], size[0], 3)) * 255).astype(np.uint8))
    ref_bank, (h, w), _ = preprocess_image(img, num_crops=16)
    crops, (h2, w2), _ = preprocess_image(img, num_crops=16, layout="u8")
    assert (h, w) == (h2, w2)
    hc, wc = h // 336, w // 336
    u8 = np.zeros((16, 336, 336, 3), np.uint8)
    u8[: hc * wc] = crops
    out = np.asarray(
        prepare_pixel_bank(jnp.asarray(u8[None]), jnp.asarray([[hc, wc]], np.int32))
    )[0]
    assert np.abs(out[0] - ref_bank[0]).max() < 5e-4  # global (MXU bicubic)
    assert np.abs(out[1 : 1 + hc * wc] - ref_bank[1 : 1 + hc * wc]).max() < 1e-5


def test_host_bank_from_u8_matches_f32(rng):
    img = Image.fromarray((rng.random((700, 900, 3)) * 255).astype(np.uint8))
    ref_bank, (h, w), _ = preprocess_image(img, num_crops=16)
    crops, _, _ = preprocess_image(img, num_crops=16, layout="u8")
    bank = host_bank_from_u8(crops, (h // 336, w // 336))
    n = bank.shape[0]
    assert np.abs(bank - ref_bank[:n]).max() < 1e-5


class _Tok:
    eos_token = "</s>"

    def __call__(self, text):
        return {"input_ids": [hash(t) % 200 + 3 for t in text.split()]}


def _sample_rows(rng, proc, n=2, size=(400, 380)):
    rows = []
    for i in range(n):
        img = Image.fromarray((rng.random((size[1], size[0], 3)) * 255).astype(np.uint8))
        rows.append(proc(f"prompt number {i} <|image_1|> end", [img]))
    return rows


def test_end_to_end_u8_matches_f32_path(rng):
    cfg = phi3v_tiny_config(num_crops=4, num_layers=2, vision_layers=1)
    rcfg = RewardConfig(is_general_preference=True, value_head_dim=2)
    rcfg.layer_id = cfg.decoder.num_layers
    params = {
        "backbone": phi3v.init_params(jax.random.PRNGKey(0), cfg),
        "head": init_head_params(jax.random.PRNGKey(1), cfg, rcfg),
    }
    tok = _Tok()
    proc_u8 = Phi3VProcessor(tok, num_crops=cfg.num_crops, device_preproc=True)
    proc_f32 = Phi3VProcessor(tok, num_crops=cfg.num_crops, device_preproc=False)

    imgs = [
        Image.fromarray((rng.random((380, 400, 3)) * 255).astype(np.uint8))
        for _ in range(2)
    ]
    pad = cfg.decoder.pad_token_id

    def run(proc):
        samples = [
            proc(f"prompt number {i} <|image_1|> end", [img])
            for i, img in enumerate(imgs)
        ]
        batch = to_reward_batch(collate_samples(samples, 640, pad))
        b = batch._replace(
            **{
                f: jnp.asarray(getattr(batch, f))
                for f in batch._fields
                if getattr(batch, f) is not None
            }
        )
        return np.asarray(
            reward_forward(params, cfg, rcfg, b, training=False, attn_impl="xla").reward
        )

    r_u8 = run(proc_u8)
    r_f32 = run(proc_f32)
    np.testing.assert_allclose(r_u8, r_f32, atol=2e-4, rtol=1e-4)


def test_u8_none_buckets_mean_static_shape(rng):
    """crop_buckets=None is the server's 'stable shapes across requests'
    request: the u8 path must produce a FIXED max-bucket bank, not the
    batch-max grid (which would recompile per request; r2 advisor)."""
    tok = _Tok()
    proc = Phi3VProcessor(tok, num_crops=16, device_preproc=True)
    shapes = set()
    for size in [(380, 400), (300, 900), (700, 700)]:
        img = Image.fromarray(
            (rng.random((size[0], size[1], 3)) * 255).astype(np.uint8)
        )
        s = proc("a <|image_1|> b", [img])
        batch = collate_samples([s], 2800, 0, crop_buckets=None)
        shapes.add(batch["pixel_values"].shape)
    assert len(shapes) == 1  # one compiled program across requests
    assert next(iter(shapes))[1] == 16  # the fixed max u8 bucket


def test_u8_custom_bucket_list_honored(rng):
    """A caller-provided bucket list reaches the u8 path (translated from
    [global]+crops counts to crops-only counts)."""
    tok = _Tok()
    proc = Phi3VProcessor(tok, num_crops=16, device_preproc=True)
    img = Image.fromarray((rng.random((380, 400, 3)) * 255).astype(np.uint8))
    s = proc("a <|image_1|> b", [img])
    hc, wc = s.crop_grid
    real = hc * wc
    batch = collate_samples([s], 2800, 0, crop_buckets=(real + 1,))
    assert batch["pixel_values"].shape[1] == real


def test_mixed_batch_falls_back_to_f32(rng):
    """One u8 sample + one f32 sample (as an extreme-aspect fallback would
    produce) -> the collator converts and the batch comes out f32."""
    tok = _Tok()
    proc_u8 = Phi3VProcessor(tok, num_crops=4, device_preproc=True)
    proc_f32 = Phi3VProcessor(tok, num_crops=4, device_preproc=False)
    img = Image.fromarray((rng.random((380, 400, 3)) * 255).astype(np.uint8))
    s1 = proc_u8("a <|image_1|> b", [img])
    s2 = proc_f32("c <|image_1|> d", [img])
    assert s1.crop_grid is not None and s2.crop_grid is None
    batch = collate_samples([s1, s2], 640, 0)
    assert batch["pixel_values"].dtype == np.float32
    assert batch.get("crop_grid") is None
    np.testing.assert_allclose(
        batch["pixel_values"][0, : batch["pixel_values"].shape[1]],
        batch["pixel_values"][1],
        atol=1e-5,
    )


def test_end_to_end_device_resize_matches_u8_path(rng, monkeypatch):
    """LRT_DEVICE_RESIZE=1: decoded-original batches (device HD resize) must
    score EXACTLY like the u8-crop path — the device bilinear is bit-exact
    vs PIL, so the downstream pixel banks are identical."""
    monkeypatch.setenv("LRT_DEVICE_RESIZE", "1")
    cfg = phi3v_tiny_config(num_crops=4, num_layers=2, vision_layers=1)
    rcfg = RewardConfig(is_general_preference=True, value_head_dim=2)
    rcfg.layer_id = cfg.decoder.num_layers
    params = {
        "backbone": phi3v.init_params(jax.random.PRNGKey(0), cfg),
        "head": init_head_params(jax.random.PRNGKey(1), cfg, rcfg),
    }
    tok = _Tok()
    proc_rs = Phi3VProcessor(tok, num_crops=cfg.num_crops, device_preproc=True)
    assert proc_rs.device_resize
    monkeypatch.setenv("LRT_DEVICE_RESIZE", "0")
    proc_u8 = Phi3VProcessor(tok, num_crops=cfg.num_crops, device_preproc=True)
    assert not proc_u8.device_resize

    # one landscape + one portrait (transpose path)
    imgs = [
        Image.fromarray((rng.random((380, 500, 3)) * 255).astype(np.uint8)),
        Image.fromarray((rng.random((520, 390, 3)) * 255).astype(np.uint8)),
    ]
    pad = cfg.decoder.pad_token_id

    def run(proc, expect_src):
        samples = [
            proc(f"prompt number {i} <|image_1|> end", [img])
            for i, img in enumerate(imgs)
        ]
        if expect_src:
            assert all(s.src_u8 is not None for s in samples)
        batch = collate_samples(samples, 640, pad)
        if expect_src:
            assert batch["pixel_values"].dtype == np.uint8
            assert batch["pixel_values"].ndim == 4  # (B, Hs, Ws, 3) source
            assert "resize_tabs" in batch
        rb = to_reward_batch(batch)
        rb = rb._replace(
            **{
                f: jax.tree_util.tree_map(jnp.asarray, getattr(rb, f))
                for f in rb._fields
                if getattr(rb, f) is not None
            }
        )
        return np.asarray(
            reward_forward(params, cfg, rcfg, rb, training=False, attn_impl="xla").reward
        )

    r_rs = run(proc_rs, expect_src=True)
    r_u8 = run(proc_u8, expect_src=False)
    np.testing.assert_allclose(r_rs, r_u8, atol=1e-6, rtol=1e-6)


def test_device_resize_mixed_batch_falls_back(rng, monkeypatch):
    """A batch mixing device-resize samples with host-path samples converts
    the former on host (sample_from_src) — same rewards, no resize_tabs."""
    monkeypatch.setenv("LRT_DEVICE_RESIZE", "1")
    tok = _Tok()
    proc_rs = Phi3VProcessor(tok, num_crops=4, device_preproc=True)
    monkeypatch.setenv("LRT_DEVICE_RESIZE", "0")
    proc_f32 = Phi3VProcessor(tok, num_crops=4, device_preproc=False)
    img = Image.fromarray((rng.random((380, 500, 3)) * 255).astype(np.uint8))
    s_rs = proc_rs("a <|image_1|> b", [img])
    s_f32 = proc_f32("c <|image_1|> d", [img])
    assert s_rs.src_u8 is not None and s_f32.pixel_values is not None
    batch = collate_samples([s_rs, s_f32], 256, 0)
    assert "resize_tabs" not in batch
    assert batch["pixel_values"].dtype == np.float32  # everything went f32


def test_pairwise_eval_mixed_buckets_and_modes_match_f32(rng, monkeypatch, tmp_path):
    """Pairwise eval merge paths (evalx/batch_inference.py): chosen/rejected
    sides landing in different SRC/nc buckets (u8src tap-table merge +
    4-dim spatial pad) and in different preproc MODES (u8src vs u8 vs f32
    -> _materialize_f32 unification) must score exactly like the pure-f32
    host path. These paths only fire on rare mixed production batches, so
    CI covers them explicitly (r3 advisor)."""
    import os

    from llava_reward_tpu.evalx.adaptor import RewardAdaptor
    from llava_reward_tpu.evalx.batch_inference import batch_rm_inference
    from llava_reward_tpu.ops.pixels import MAX_GRID, WOUT_MAX

    cfg = phi3v_tiny_config(num_crops=16, num_layers=2, vision_layers=1)
    rcfg = RewardConfig(is_general_preference=True, value_head_dim=2)
    rcfg.layer_id = cfg.decoder.num_layers
    params = {
        "backbone": phi3v.init_params(jax.random.PRNGKey(0), cfg),
        "head": init_head_params(jax.random.PRNGKey(1), cfg, rcfg),
    }
    adaptor = RewardAdaptor(cfg=cfg, rcfg=rcfg, params=params, model_type="phi3v")

    class Tok:
        eos_token = "</s>"
        pad_token_id = 0

        def __call__(self, text):
            return {"input_ids": [hash(t) % 400 + 3 for t in text.split()]}

        def apply_chat_template(self, msgs, tokenize=False, add_generation_prompt=True):
            return "".join(m["content"] for m in msgs) + " " + "x" * 22

    tok = Tok()
    # geometry per mode (asserted below so the test can't silently degrade;
    # with num_crops=16 the grid depends only on aspect ratio):
    #   small  (380, 400)   -> u8src, SRC bucket 672, 4x4 grid (nc bucket 16)
    #   large  (334, 1002)  -> u8src, SRC bucket 1344, 2x6 grid (nc bucket 12)
    #   big    (2800, 3000) -> raw edge > WOUT_MAX but grid <= MAX_GRID -> u8 crops
    #   pano   (200, 3000)  -> grid > MAX_GRID -> host f32 bank
    sizes = {
        "small": (380, 400), "large": (334, 1002),
        "big": (2800, 3000), "pano": (200, 3000),
    }
    for name, (h, w) in sizes.items():
        arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / f"{name}.png")

    monkeypatch.setenv("LRT_DEVICE_RESIZE", "1")
    proc_rs = Phi3VProcessor(tok, num_crops=16, device_preproc=True)
    assert proc_rs.device_resize

    def mode(name):
        s = proc_rs("a <|image_1|> b", [Image.open(tmp_path / f"{name}.png")])
        if s.src_u8 is not None:
            return "u8src"
        return "u8" if s.crop_grid is not None else "f32"

    assert mode("small") == "u8src" and mode("large") == "u8src"
    assert mode("big") == "u8" and mode("pano") == "f32"
    s_small = proc_rs("a <|image_1|> b", [Image.open(tmp_path / "small.png")])
    s_large = proc_rs("a <|image_1|> b", [Image.open(tmp_path / "large.png")])
    assert s_small.src_u8.shape != s_large.src_u8.shape  # different SRC buckets
    assert s_small.crop_grid != s_large.crop_grid  # different nc buckets

    rows = [
        {"prompt": "p0", "chosen_path": "small.png", "reject_path": "large.png"},
        {"prompt": "p1", "chosen_path": "small.png", "reject_path": "big.png"},
        {"prompt": "p2", "chosen_path": "small.png", "reject_path": "pano.png"},
    ]

    def run(proc):
        return batch_rm_inference(
            adaptor, rows, tok, proc,
            batch_size=1, seq_len=2816, image_root=str(tmp_path),
            attn_impl="xla", num_workers=1, progress=False,
        )

    m_rs = run(proc_rs)
    monkeypatch.setenv("LRT_DEVICE_RESIZE", "0")
    proc_f32 = Phi3VProcessor(tok, num_crops=16, device_preproc=False)
    m_f32 = run(proc_f32)
    assert m_rs["num_pairs"] == m_f32["num_pairs"] == 3
    # device bilinear + bank assembly are bit-exact vs PIL; the f32
    # unification path adds only bf16-free f32 resampling -> tight tol
    np.testing.assert_allclose(m_rs["mean_prob"], m_f32["mean_prob"], atol=3e-4)
    assert m_rs["accuracy"] == m_f32["accuracy"]
