"""LLaVA-NeXT parity vs HF on tiny random-init configs (fp32, CPU)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from llava_reward_tpu.core.config import RewardConfig, llava_tiny_config
from llava_reward_tpu.io.hf_llava import params_from_hf_state_dict
from llava_reward_tpu.models import llava_next
from llava_reward_tpu.preprocess.llava_processor import (
    LlavaNextProcessor,
    build_anyres_gather_idx,
    max_image_tokens,
    num_image_tokens,
    preprocess_image_anyres,
    select_best_resolution,
)


def _hf_model(cfg, seed=0):
    from transformers import (
        CLIPVisionConfig,
        LlamaConfig,
        LlavaNextConfig as HFLlavaNextConfig,
    )
    from transformers.models.llava_next.modeling_llava_next import (
        LlavaNextForConditionalGeneration,
    )

    torch.manual_seed(seed)
    tc, vc = cfg.text, cfg.vision
    hf_cfg = HFLlavaNextConfig(
        vision_config=CLIPVisionConfig(
            hidden_size=vc.hidden_size,
            intermediate_size=vc.intermediate_size,
            num_hidden_layers=vc.num_layers,
            num_attention_heads=vc.num_heads,
            image_size=vc.image_size,
            patch_size=vc.patch_size,
            hidden_act="quick_gelu",
        ).to_dict(),
        text_config=LlamaConfig(
            vocab_size=tc.vocab_size,
            hidden_size=tc.hidden_size,
            intermediate_size=tc.intermediate_size,
            num_hidden_layers=tc.num_layers,
            num_attention_heads=tc.num_heads,
            num_key_value_heads=tc.num_kv_heads,
            rms_norm_eps=tc.rms_norm_eps,
            rope_theta=tc.rope_theta,
            attention_bias=False,
            attention_dropout=0.0,
        ).to_dict(),
        image_grid_pinpoints=[list(p) for p in cfg.grid_pinpoints],
        image_token_index=tc.image_token_id,
        vision_feature_layer=-2,
        vision_feature_select_strategy="default",
    )
    return LlavaNextForConditionalGeneration(hf_cfg).eval()


def test_select_best_resolution_matches_hf():
    from transformers.image_processing_utils import select_best_resolution as hf_sbr

    pin = [[336, 672], [672, 336], [672, 672], [1008, 336], [336, 1008]]
    for size in [(480, 640), (640, 480), (700, 700), (100, 900), (1200, 300)]:
        assert select_best_resolution(size, pin) == tuple(hf_sbr(size, pin))


def test_num_image_tokens_bounds():
    assert max_image_tokens() == 576 + 48 * 49  # 672x672 square fill
    n = num_image_tokens(480, 640)
    assert 576 < n <= max_image_tokens()


def test_llava_full_forward_parity():
    cfg = llava_tiny_config(num_layers=2, vision_layers=2)
    hf = _hf_model(cfg)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = params_from_hf_state_dict(sd, cfg)

    from PIL import Image

    rng = np.random.default_rng(0)
    img = Image.fromarray((rng.random((500, 640, 3)) * 255).astype(np.uint8))

    pixel_values, (oh, ow) = preprocess_image_anyres(img, cfg.grid_pinpoints)
    budget = max_image_tokens(cfg.grid_pinpoints)
    gidx, n_img = build_anyres_gather_idx(oh, ow, budget, cfg.grid_pinpoints)

    tc = cfg.text
    prefix = rng.integers(3, 100, 4).astype(np.int32)
    suffix = rng.integers(3, 100, 3).astype(np.int32)
    ids = np.concatenate([prefix, np.zeros(n_img, np.int32), suffix])
    ids_hf = np.concatenate(
        [prefix, np.full(n_img, tc.image_token_id, np.int64), suffix]
    )
    S = len(ids)
    mask = np.ones((1, S), np.int32)
    splice = np.full(S, -1, np.int32)
    splice[4 : 4 + n_img] = np.arange(n_img)

    out = llava_next.forward(
        params, cfg,
        jnp.asarray(ids[None]), jnp.asarray(mask),
        jnp.asarray(pixel_values[None]),
        jnp.asarray(gidx[None]), jnp.asarray(splice[None]),
        jnp.asarray(np.array([n_img], np.int32)),
        attn_impl="xla",
    )

    # HF path: number of real tiles for this image
    from transformers.models.llava_next.modeling_llava_next import (
        image_size_to_num_patches,
    )

    n_tiles = image_size_to_num_patches(
        (oh, ow), [list(p) for p in cfg.grid_pinpoints], cfg.vision.image_size
    )
    pix_hf = torch.from_numpy(
        pixel_values[:n_tiles].transpose(0, 3, 1, 2)
    ).unsqueeze(0)
    with torch.no_grad():
        ref = hf.model(
            input_ids=torch.from_numpy(ids_hf[None]),
            attention_mask=torch.from_numpy(mask.astype(np.int64)),
            pixel_values=pix_hf,
            image_sizes=torch.tensor([[oh, ow]]),
        ).last_hidden_state.numpy()

    np.testing.assert_allclose(
        np.asarray(out.last_hidden_state)[0], ref[0], rtol=5e-4, atol=5e-4
    )


def test_llava_reward_forward():
    from llava_reward_tpu.preprocess.collate import collate_samples, to_reward_batch
    from llava_reward_tpu.reward import init_head_params, reward_forward

    cfg = llava_tiny_config()
    rcfg = RewardConfig(is_general_preference=True, value_head_dim=2)
    rcfg.layer_id = cfg.text.num_layers
    params = {
        "backbone": llava_next.init_params(jax.random.PRNGKey(0), cfg),
        "head": init_head_params(jax.random.PRNGKey(1), cfg, rcfg),
    }

    class Tok:
        def __call__(self, text):
            ids = []
            for t in text.split():
                ids.append(cfg.text.image_token_id if t == "<image>" else hash(t) % 400 + 3)
            return {"input_ids": ids}

    proc = LlavaNextProcessor(
        Tok(), image_token_id=cfg.text.image_token_id,
        grid_pinpoints=cfg.grid_pinpoints,
    )
    from PIL import Image

    rng = np.random.default_rng(1)
    img = Image.fromarray((rng.random((300, 400, 3)) * 255).astype(np.uint8))
    s = proc("<image> describe", [img])
    rb = to_reward_batch(collate_samples([s], seq_len=len(s.input_ids) + 5, pad_token_id=0))
    out = reward_forward(params, cfg, rcfg, rb, training=False, attn_impl="xla")
    assert out.reward.shape == (1, 2)
    assert np.all(np.isfinite(np.asarray(out.reward)))
