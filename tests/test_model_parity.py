"""Parity of the JAX backbones against independent HF/torch implementations
on tiny random-init configs (fp32, CPU)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from llava_reward_tpu.core.config import (
    DecoderConfig,
    Phi3VConfig,
    VisionConfig,
    phi3v_tiny_config,
)
from llava_reward_tpu.io.hf_phi3v import params_from_hf_state_dict
from llava_reward_tpu.models import clip_vit, phi3, phi3v
from llava_reward_tpu.preprocess.phi3v_processor import build_img_gather_idx

CLIP_PREFIX = "model.vision_embed_tokens.img_processor.vision_model"


def _tiny_hf_clip(vision_cfg: VisionConfig, seed=0):
    from transformers import CLIPVisionConfig, CLIPVisionModel

    torch.manual_seed(seed)
    hf_cfg = CLIPVisionConfig(
        hidden_size=vision_cfg.hidden_size,
        intermediate_size=vision_cfg.intermediate_size,
        num_hidden_layers=vision_cfg.num_layers,
        num_attention_heads=vision_cfg.num_heads,
        image_size=vision_cfg.image_size,
        patch_size=vision_cfg.patch_size,
        hidden_act="quick_gelu",
        layer_norm_eps=vision_cfg.layer_norm_eps,
        attention_dropout=0.0,
    )
    return CLIPVisionModel(hf_cfg).eval()


def _clip_sd_with_prefix(model):
    sd = {}
    for k, v in model.state_dict().items():
        k = k.replace("vision_model.", "")
        sd[f"{CLIP_PREFIX}.{k}"] = v.detach().numpy()
    return sd


def test_clip_tower_parity():
    cfg = phi3v_tiny_config(vision_layers=3, vision_hidden=32)
    vc = cfg.vision
    hf = _tiny_hf_clip(vc)
    sd = _clip_sd_with_prefix(hf)

    # minimal decoder keys so the full converter runs
    dcfg = cfg.decoder
    for i in range(dcfg.num_layers):
        sd[f"model.layers.{i}.input_layernorm.weight"] = np.ones(dcfg.hidden_size, np.float32)
        sd[f"model.layers.{i}.self_attn.qkv_proj.weight"] = np.zeros(
            (dcfg.q_size + 2 * dcfg.kv_size, dcfg.hidden_size), np.float32
        )
        sd[f"model.layers.{i}.self_attn.o_proj.weight"] = np.zeros(
            (dcfg.hidden_size, dcfg.q_size), np.float32
        )
        sd[f"model.layers.{i}.post_attention_layernorm.weight"] = np.ones(
            dcfg.hidden_size, np.float32
        )
        sd[f"model.layers.{i}.mlp.gate_up_proj.weight"] = np.zeros(
            (2 * dcfg.intermediate_size, dcfg.hidden_size), np.float32
        )
        sd[f"model.layers.{i}.mlp.down_proj.weight"] = np.zeros(
            (dcfg.hidden_size, dcfg.intermediate_size), np.float32
        )
    sd["model.embed_tokens.weight"] = np.zeros(
        (dcfg.vocab_size, dcfg.hidden_size), np.float32
    )
    sd["model.norm.weight"] = np.ones(dcfg.hidden_size, np.float32)
    H = cfg.decoder.hidden_size
    D = cfg.merged_feature_dim
    sd["model.vision_embed_tokens.glb_GN"] = np.zeros((1, 1, D), np.float32)
    sd["model.vision_embed_tokens.sub_GN"] = np.zeros((1, 1, 1, D), np.float32)
    sd["model.vision_embed_tokens.img_projection.0.weight"] = np.zeros((H, D), np.float32)
    sd["model.vision_embed_tokens.img_projection.0.bias"] = np.zeros((H,), np.float32)
    sd["model.vision_embed_tokens.img_projection.2.weight"] = np.zeros((H, H), np.float32)
    sd["model.vision_embed_tokens.img_projection.2.bias"] = np.zeros((H,), np.float32)

    params = params_from_hf_state_dict(sd, cfg)

    rng = np.random.default_rng(1)
    pix = rng.standard_normal((2, vc.image_size, vc.image_size, 3)).astype(np.float32)

    ours = np.asarray(
        clip_vit.extract_patch_features(
            params["vision"]["clip"], vc, jnp.asarray(pix), attn_impl="xla"
        )
    )

    with torch.no_grad():
        out = hf(
            torch.from_numpy(pix.transpose(0, 3, 1, 2)), output_hidden_states=True
        )
    ref = out.hidden_states[-2][:, 1:].numpy()  # penultimate, CLS dropped

    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_hd_merge_and_gather_ordering():
    """Our dense bank + gather must reproduce hd_feature_transform's token
    ordering (modeling_phi3_v.py:254-362), checked against a direct torch
    implementation of the spec."""
    rng = np.random.default_rng(2)
    num_crops = 6
    G = 4  # merge grid for this test (grid=8 patches per side)
    grid = 2 * G
    C = 16
    h_crop, w_crop = 2, 3

    # per-crop features: (num_crops+1, grid*grid, C); crop 0 = global
    feats = rng.standard_normal((num_crops + 1, grid * grid, C)).astype(np.float32)
    sub_gn = rng.standard_normal((4 * C,)).astype(np.float32)
    glb_gn = rng.standard_normal((4 * C,)).astype(np.float32)

    # --- torch reference of the spec
    def merge(x, hc, wc):  # x: (N, grid^2, C) -> (1, hc*G, wc*G, 4C)
        t = torch.from_numpy(x)
        N = t.shape[0]
        t = t.reshape(N, grid, grid, C)
        t = t.reshape(N, G, 2, G, 2, C).permute(0, 1, 3, 2, 4, 5).reshape(N, -1, 4 * C)
        t = t.reshape(1, hc, wc, G, G, 4 * C).permute(0, 1, 3, 2, 4, 5)
        return t.reshape(1, hc * G, wc * G, 4 * C)

    def add_newline(x):  # (1, h, w, D) -> (1, h*(w+1), D)
        n, h, w, d = x.shape
        nl = torch.from_numpy(sub_gn).expand(n, h, 1, d)
        return torch.cat([x, nl], dim=2).reshape(n, -1, d)

    glb = merge(feats[0:1], 1, 1)
    glb_nl = add_newline(glb)[0]
    sub = merge(feats[1 : 1 + h_crop * w_crop], h_crop, w_crop)
    sub_nl = add_newline(sub)[0]
    ref = torch.cat([sub_nl, torch.from_numpy(glb_gn)[None], glb_nl]).numpy()

    # --- ours: merge each crop independently, build bank (sentinels first), gather
    merged = np.asarray(phi3v.merge_2x2(jnp.asarray(feats), grid))  # (N, G*G, 4C)
    bank = np.concatenate(
        [sub_gn[None], glb_gn[None], merged.reshape(-1, 4 * C)], axis=0
    )
    n_tok = h_crop * G * (w_crop * G + 1) + 1 + G * (G + 1)
    idx = build_img_gather_idx(
        h_crop, w_crop, num_crops, budget=n_tok + 5, merge_grid=G
    )
    ours = bank[idx[:n_tok]]

    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def _tiny_hf_phi3(cfg: DecoderConfig, seed=0):
    from transformers import Phi3Config
    from transformers.models.phi3.modeling_phi3 import Phi3ForCausalLM

    torch.manual_seed(seed)
    hf_cfg = Phi3Config(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta,
        max_position_embeddings=cfg.max_position_embeddings,
        original_max_position_embeddings=cfg.original_max_position_embeddings,
        sliding_window=None,
        attention_dropout=0.0,
        pad_token_id=cfg.pad_token_id,
    )
    return Phi3ForCausalLM(hf_cfg).eval()


def test_phi3_decoder_parity():
    cfg = phi3v_tiny_config(num_layers=3, hidden_size=64, num_heads=4).decoder
    hf = _tiny_hf_phi3(cfg)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    from llava_reward_tpu.io.hf_phi3v import params_from_hf_state_dict

    # wrap into full phi3v tree shape using only decoder keys
    def stack(fmt, t=lambda x: x):
        return np.stack([t(sd[fmt.format(i=i)]) for i in range(cfg.num_layers)])

    T = lambda x: np.ascontiguousarray(x.T)
    params = {
        "embed_tokens": sd["model.embed_tokens.weight"],
        "layers": {
            "input_layernorm": stack("model.layers.{i}.input_layernorm.weight"),
            "qkv_proj": stack("model.layers.{i}.self_attn.qkv_proj.weight", T),
            "o_proj": stack("model.layers.{i}.self_attn.o_proj.weight", T),
            "post_attention_layernorm": stack(
                "model.layers.{i}.post_attention_layernorm.weight"
            ),
            "gate_up_proj": stack("model.layers.{i}.mlp.gate_up_proj.weight", T),
            "down_proj": stack("model.layers.{i}.mlp.down_proj.weight", T),
        },
        "final_layernorm": sd["model.norm.weight"],
    }

    rng = np.random.default_rng(3)
    B, S = 2, 12
    ids = rng.integers(0, cfg.vocab_size, size=(B, S)).astype(np.int32)
    mask = np.ones((B, S), dtype=np.int32)
    mask[0, :4] = 0  # left padding
    pos = np.cumsum(mask, axis=-1) - 1
    pos = np.where(mask == 0, 1, pos)

    embeds = params["embed_tokens"][ids]
    out = phi3.forward(
        params, cfg, jnp.asarray(embeds), jnp.asarray(mask), jnp.asarray(pos),
        attn_impl="xla",
    )
    ours = np.asarray(out.last_hidden_state)

    with torch.no_grad():
        ref = hf.model(
            input_ids=torch.from_numpy(ids.astype(np.int64)),
            attention_mask=torch.from_numpy(mask.astype(np.int64)),
            position_ids=torch.from_numpy(pos.astype(np.int64)),
        ).last_hidden_state.numpy()

    valid = mask.astype(bool)
    np.testing.assert_allclose(ours[valid], ref[valid], rtol=2e-4, atol=2e-4)


def test_phi3_collect_layer():
    cfg = phi3v_tiny_config(num_layers=4).decoder
    key = jax.random.PRNGKey(0)
    params = phi3.init_params(key, cfg)
    rng = np.random.default_rng(4)
    B, S = 1, 6
    ids = rng.integers(0, cfg.vocab_size, size=(B, S)).astype(np.int32)
    mask = np.ones((B, S), np.int32)
    pos = np.arange(S, dtype=np.int32)[None]
    embeds = np.asarray(params["embed_tokens"])[ids]

    # collecting layer 4 of 4 should equal the pre-norm input to the final
    # norm: rms_norm(collected) == last_hidden_state when collect==num_layers
    out_last = phi3.forward(
        params, cfg, jnp.asarray(embeds), jnp.asarray(mask), jnp.asarray(pos),
        attn_impl="xla", collect_layer_id=None,
    )
    out_c2 = phi3.forward(
        params, cfg, jnp.asarray(embeds), jnp.asarray(mask), jnp.asarray(pos),
        attn_impl="xla", collect_layer_id=2,
    )
    assert out_c2.collected_hidden_state is not None
    assert out_c2.collected_hidden_state.shape == out_last.last_hidden_state.shape
    # layer-2 output must differ from final
    assert not np.allclose(
        np.asarray(out_c2.collected_hidden_state),
        np.asarray(out_last.last_hidden_state),
    )
    # collect_layer_id=0 returns the embeddings
    out_c0 = phi3.forward(
        params, cfg, jnp.asarray(embeds), jnp.asarray(mask), jnp.asarray(pos),
        attn_impl="xla", collect_layer_id=0,
    )
    np.testing.assert_allclose(
        np.asarray(out_c0.collected_hidden_state), embeds, rtol=1e-6, atol=1e-6
    )
