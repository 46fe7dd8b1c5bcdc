"""Multi-image prompts (<|image_1|>..<|image_n|>, processing_phi3_v.py:426-454)."""

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


def test_two_image_prompt(rng):
    cfg = phi3v_tiny_config(num_crops=4)
    rcfg = RewardConfig(is_general_preference=True, value_head_dim=2)
    rcfg.layer_id = cfg.decoder.num_layers
    params = {
        "backbone": phi3v.init_params(jax.random.PRNGKey(0), cfg),
        "head": init_head_params(jax.random.PRNGKey(1), cfg, rcfg),
    }
    proc = Phi3VProcessor(FakeTok(), num_crops=4)
    img1, img2 = _img(rng, 90, 130), _img(rng, 130, 90)
    s = proc("compare <|image_1|> with <|image_2|> which is better", [img1, img2])
    assert s.pixel_values.shape[0] == 2 * 5  # two images x (crops+1)
    n1 = proc("<|image_1|> x", [img1]).num_img_tokens
    n2 = proc("<|image_1|> x", [img2]).num_img_tokens
    assert s.num_img_tokens == n1 + n2

    rb = to_reward_batch(collate_samples([s], len(s.input_ids) + 4, 0))
    out = reward_forward(params, cfg, rcfg, rb, training=False, attn_impl="xla")
    assert np.all(np.isfinite(np.asarray(out.reward)))


def test_single_image_token_values_unchanged_by_multi_support(rng):
    """A 1-image prompt must splice exactly the same embeddings as before:
    check gather indices address the same features a manual bank build does."""
    proc = Phi3VProcessor(FakeTok(), num_crops=4)
    img = _img(rng, 100, 150)
    s = proc("<|image_1|> hello", [img])
    n = s.num_img_tokens
    idx = s.img_gather_idx[:n]
    # sentinel rows are 0/1; crop rows start at 2
    assert idx.min() >= 0
    assert (idx >= 2).sum() > 0 and (idx <= 1).sum() > 0
    hc, wc = s.image_size[0] // 336, s.image_size[1] // 336
    assert idx.max() < 2 + 5 * 144  # within this image's bank region


def test_mixed_batch_single_and_two_image(rng):
    cfg = phi3v_tiny_config(num_crops=4)
    rcfg = RewardConfig(is_general_preference=False)
    rcfg.layer_id = cfg.decoder.num_layers
    params = {
        "backbone": phi3v.init_params(jax.random.PRNGKey(0), cfg),
        "head": init_head_params(jax.random.PRNGKey(1), cfg, rcfg),
    }
    proc = Phi3VProcessor(FakeTok(), num_crops=4)
    s1 = proc("<|image_1|> one", [_img(rng, 90, 130)])
    s2 = proc("<|image_1|> and <|image_2|> two", [_img(rng, 90, 130), _img(rng, 100, 100)])
    S = max(len(s1.input_ids), len(s2.input_ids)) + 3
    rb = to_reward_batch(collate_samples([s1, s2], S, 0))
    assert rb.pixel_values.shape[1] == 10  # padded to the 2-image crop count
    out = reward_forward(params, cfg, rcfg, rb, training=False, attn_impl="xla")
    assert out.reward.shape == (2, 1)
    assert np.all(np.isfinite(np.asarray(out.reward)))
