"""Crop-bucketed collation: smaller pixel batches, identical rewards."""

import numpy as np
import pytest

import jax

from llava_reward_tpu.core.config import RewardConfig, phi3v_tiny_config
from llava_reward_tpu.models import phi3v
from llava_reward_tpu.preprocess.collate import collate_samples, to_reward_batch
from llava_reward_tpu.preprocess.phi3v_processor import Phi3VProcessor
from llava_reward_tpu.reward import init_head_params, reward_forward


class FakeTok:
    def __call__(self, text):
        return {"input_ids": [hash(t) % 400 + 2 for t in text.split()]}


def _img(rng, h, w):
    from PIL import Image

    return Image.fromarray((rng.random((h, w, 3)) * 255).astype(np.uint8))


def test_bucketed_collate_matches_full(rng):
    cfg = phi3v_tiny_config(num_crops=16)
    rcfg = RewardConfig(is_general_preference=True, value_head_dim=2,
                        add_cross_attention=True)
    rcfg.layer_id = cfg.decoder.num_layers
    params = {
        "backbone": phi3v.init_params(jax.random.PRNGKey(0), cfg),
        "head": init_head_params(jax.random.PRNGKey(1), cfg, rcfg),
    }
    proc = Phi3VProcessor(FakeTok(), num_crops=16)
    # ~1.4-1.5 aspect -> HD picks 4x3 = 12 crops -> bucket 13 (square images
    # always fill all 16 crops, the HD transform upscales)
    samples = [
        proc("<|image_1|> a small photo", [_img(rng, 100, 150)]),
        proc("<|image_1|> another one", [_img(rng, 100, 140)]),
    ]
    S = 1300
    full = to_reward_batch(collate_samples(samples, S, 0, crop_buckets=None))
    bucketed = to_reward_batch(collate_samples(samples, S, 0))

    assert full.pixel_values.shape[1] == 17
    assert bucketed.pixel_values.shape[1] < 17  # shrunk to a bucket

    r_full = reward_forward(params, cfg, rcfg, full, training=False, attn_impl="xla").reward
    r_bkt = reward_forward(params, cfg, rcfg, bucketed, training=False, attn_impl="xla").reward
    np.testing.assert_allclose(
        np.asarray(r_bkt), np.asarray(r_full), rtol=1e-4, atol=1e-5
    )


def test_big_image_keeps_full_bucket(rng):
    proc = Phi3VProcessor(FakeTok(), num_crops=16)
    s = proc("<|image_1|> wide", [_img(rng, 300, 1800)])  # extreme aspect
    batch = collate_samples([s], 2800, 0)
    hc, wc = s.image_size[0] // 336, s.image_size[1] // 336
    assert batch["pixel_values"].shape[1] >= hc * wc + 1
