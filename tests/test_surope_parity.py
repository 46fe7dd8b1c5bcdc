"""su-scaled RoPE parity vs HF Phi3 'longrope' + bf16 forward smoke."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from llava_reward_tpu.core.config import (
    DecoderConfig,
    RewardConfig,
    RopeScalingConfig,
    phi35_vision_config,
    phi3v_tiny_config,
)
from llava_reward_tpu.models import phi3, phi3v
from llava_reward_tpu.reward import RewardBatch, init_head_params, reward_forward


def test_su_rope_decoder_parity_vs_hf_longrope():
    """Tiny Phi3 with longrope scaling: our su-rope must match HF."""
    from transformers import Phi3Config
    from transformers.models.phi3.modeling_phi3 import Phi3ForCausalLM

    hidden, heads, layers = 64, 4, 2
    half = (hidden // heads) // 2
    short = [1.0 + 0.05 * i for i in range(half)]
    long = [2.0 + 0.1 * i for i in range(half)]

    torch.manual_seed(0)
    hf_cfg = Phi3Config(
        vocab_size=128, hidden_size=hidden, intermediate_size=128,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=heads, rms_norm_eps=1e-5, rope_theta=10000.0,
        max_position_embeddings=131072, original_max_position_embeddings=4096,
        rope_scaling={"type": "longrope", "short_factor": short, "long_factor": long},
        attention_dropout=0.0, sliding_window=None, pad_token_id=0,
    )
    hf = Phi3ForCausalLM(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    cfg = DecoderConfig(
        vocab_size=128, hidden_size=hidden, intermediate_size=128,
        num_layers=layers, num_heads=heads, num_kv_heads=heads,
        max_position_embeddings=131072, original_max_position_embeddings=4096,
        rope_scaling=RopeScalingConfig("su", tuple(short), tuple(long)),
        pad_token_id=0,
    )

    def stack(fmt, t=lambda x: x):
        return np.stack([t(sd[fmt.format(i=i)]) for i in range(layers)])

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

    rng = np.random.default_rng(0)
    B, S = 1, 16
    ids = rng.integers(1, 128, (B, S)).astype(np.int32)
    mask = np.ones((B, S), np.int32)
    pos = np.arange(S, dtype=np.int32)[None]
    embeds = params["embed_tokens"][ids]
    ours = phi3.forward(
        params, cfg, jnp.asarray(embeds), jnp.asarray(mask), jnp.asarray(pos),
        attn_impl="xla",
    ).last_hidden_state
    with torch.no_grad():
        ref = hf.model(
            input_ids=torch.from_numpy(ids.astype(np.int64)),
            attention_mask=torch.from_numpy(mask.astype(np.int64)),
        ).last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=3e-4, atol=3e-4)


def test_full_config_rope_factors_valid():
    cfg = phi35_vision_config().decoder
    assert len(cfg.rope_scaling.short_factor) == cfg.head_dim // 2 == 48
    assert len(cfg.rope_scaling.long_factor) == 48


def test_bf16_forward_smoke(rng):
    cfg = phi3v_tiny_config(num_layers=2, vision_layers=1)
    rcfg = RewardConfig(is_general_preference=True, value_head_dim=2)
    rcfg.layer_id = cfg.decoder.num_layers
    params = {
        "backbone": phi3v.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16),
        "head": init_head_params(jax.random.PRNGKey(1), cfg, rcfg, dtype=jnp.bfloat16),
    }
    B, S = 2, 12
    batch = RewardBatch(
        input_ids=jnp.asarray(rng.integers(2, 100, (B, S)).astype(np.int32)),
        attention_mask=jnp.asarray(np.ones((B, S), np.int32)),
        pixel_values=None, img_gather_idx=None, splice_idx=None,
        num_img_tokens=None,
    )
    r = reward_forward(params, cfg, rcfg, batch, training=False, attn_impl="xla").reward
    assert r.dtype == jnp.bfloat16
    assert np.all(np.isfinite(np.asarray(r, dtype=np.float32)))
