"""Checkpoint-contract round-trips: reward artifact, HF state dict, resume."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llava_reward_tpu.core.config import RewardConfig, phi3v_tiny_config
from llava_reward_tpu.io.artifact import (
    load_head_params,
    load_projector_params,
    load_reward_config,
    save_reward_artifact,
)
from llava_reward_tpu.io.hf_phi3v import (
    hf_state_dict_from_params,
    params_from_hf_state_dict,
)
from llava_reward_tpu.models import phi3v
from llava_reward_tpu.reward import init_head_params


def test_reward_artifact_roundtrip(tmp_path):
    cfg = phi3v_tiny_config()
    rcfg = RewardConfig(
        is_general_preference=True, value_head_dim=4,
        add_cross_attention=True, add_prompt_head=True,
        general_preference_tau=0.25,
    )
    head = init_head_params(jax.random.PRNGKey(0), cfg, rcfg)
    proj = phi3v.init_params(jax.random.PRNGKey(1), cfg)["vision"]["img_projection"]
    import torch

    save_reward_artifact(
        str(tmp_path), rcfg, jax.device_get(head),
        projector_params=jax.device_get(proj), torch_dtype=torch.float32,
    )

    rcfg2 = load_reward_config(str(tmp_path))
    assert rcfg2.to_contract_dict() == rcfg.to_contract_dict()

    head2 = load_head_params(str(tmp_path), rcfg2)
    np.testing.assert_allclose(
        np.asarray(head["value_head"]["kernel"]), head2["value_head"]["kernel"],
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(head["skipca"]["W_q"]["kernel"]), head2["skipca"]["W_q"]["kernel"],
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(head["prompt_head"]["kernel"]), head2["prompt_head"]["kernel"],
        rtol=1e-6,
    )
    proj2 = load_projector_params(str(tmp_path))
    np.testing.assert_allclose(
        np.asarray(proj["fc1"]["kernel"]), proj2["fc1"]["kernel"], rtol=1e-6
    )


def test_artifact_readable_by_torch_conventions(tmp_path):
    """The artifact must use the reference's key names so the REFERENCE
    loader could consume it (deepspeed.py:343-357 keyword filter)."""
    import torch

    cfg = phi3v_tiny_config()
    rcfg = RewardConfig(is_general_preference=False, add_cross_attention=True)
    head = jax.device_get(init_head_params(jax.random.PRNGKey(0), cfg, rcfg))
    save_reward_artifact(str(tmp_path), rcfg, head, torch_dtype=torch.float32)
    sd = torch.load(
        os.path.join(str(tmp_path), "pytorch_model.bin"), weights_only=True
    )
    keys = set(sd.keys())
    assert "value_head.weight" in keys
    assert {"W_q.weight", "W_k.weight", "W_v.weight", "ca_layernorm.weight"} <= keys
    # torch Linear orientation: (out, in) == (1, hidden)
    assert sd["value_head.weight"].shape == (1, cfg.decoder.hidden_size)


def test_hf_state_dict_roundtrip():
    cfg = phi3v_tiny_config(num_layers=2, vision_layers=2)
    params = jax.device_get(phi3v.init_params(jax.random.PRNGKey(0), cfg))
    sd = hf_state_dict_from_params(params, cfg)
    back = params_from_hf_state_dict(sd, cfg)

    flat1, _ = jax.tree_util.tree_flatten_with_path(params)
    flat2 = dict(jax.tree_util.tree_flatten_with_path(back)[0])
    flat2 = {jax.tree_util.keystr(k): v for k, v in flat2.items()}
    for path, leaf in flat1:
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(leaf), flat2[key], rtol=1e-6, atol=1e-7, err_msg=key
        )


def test_adaptor_end_to_end(tmp_path):
    """Full load_reward_adaptor path against a synthetic base checkpoint +
    artifact, with a LoRA adapter whose effect must show up in scores."""
    import json

    import torch

    from llava_reward_tpu.evalx.adaptor import load_reward_adaptor
    from llava_reward_tpu.io.torch_io import save_torch_state_dict
    from llava_reward_tpu.lora.lora import (
        init_lora,
        peft_adapter_config,
        stacked_to_peft_state,
    )

    cfg = phi3v_tiny_config(num_layers=2, vision_layers=2)
    params = jax.device_get(phi3v.init_params(jax.random.PRNGKey(0), cfg))
    base_dir = tmp_path / "base"
    os.makedirs(base_dir)
    save_torch_state_dict(
        hf_state_dict_from_params(params, cfg),
        str(base_dir / "pytorch_model.bin"),
        torch.float32,
    )
    with open(base_dir / "config.json", "w") as f:
        json.dump(
            {
                "vocab_size": cfg.decoder.vocab_size,
                "hidden_size": cfg.decoder.hidden_size,
                "intermediate_size": cfg.decoder.intermediate_size,
                "num_hidden_layers": cfg.decoder.num_layers,
                "num_attention_heads": cfg.decoder.num_heads,
                "num_key_value_heads": cfg.decoder.num_kv_heads,
                "pad_token_id": cfg.decoder.pad_token_id,
            },
            f,
        )

    rcfg = RewardConfig(is_general_preference=True, value_head_dim=2)
    head = jax.device_get(init_head_params(jax.random.PRNGKey(1), cfg, rcfg))
    lora = init_lora(jax.random.PRNGKey(2), cfg.decoder, rank=4, alpha=8)
    lora = jax.tree_util.tree_map(
        lambda x: x + 0.02 if x.ndim == 3 else x, lora
    )  # non-zero B
    pm_dir = tmp_path / "pm"
    save_reward_artifact(
        str(pm_dir), rcfg, head,
        lora_state=stacked_to_peft_state(jax.device_get(lora), cfg.decoder),
        lora_config=peft_adapter_config(4, 8, 0.05),
        torch_dtype=torch.float32,
    )

    adaptor = load_reward_adaptor(str(base_dir), str(pm_dir))
    assert adaptor.cfg.decoder.num_layers == 2
    assert adaptor.rcfg.value_head_dim == 2
    # params must come back device-committed: numpy leaves fed to a jitted
    # score fn are re-uploaded on EVERY call (per-batch full-model transfer
    # through the ~30 MB/s tunnel in production eval)
    for leaf in jax.tree_util.tree_leaves(adaptor.params):
        assert isinstance(leaf, jax.Array), type(leaf)
    # vision config defaulted to full-size; patch tiny for the forward test
    adaptor = type(adaptor)(
        cfg=cfg, rcfg=adaptor.rcfg,
        params=adaptor.params, model_type="phi3v",
    )
    adaptor.rcfg.layer_id = cfg.decoder.num_layers

    from llava_reward_tpu.reward.model import RewardBatch

    rng = np.random.default_rng(0)
    B, S = 2, 16
    batch = RewardBatch(
        input_ids=jnp.asarray(rng.integers(2, 100, (B, S)).astype(np.int32)),
        attention_mask=jnp.asarray(np.ones((B, S), np.int32)),
        pixel_values=None, img_gather_idx=None, splice_idx=None,
        num_img_tokens=None,
    )
    score = adaptor.make_score_fn(attn_impl="xla")
    r = np.asarray(score(adaptor.params, batch))
    assert r.shape == (B, 2) and np.all(np.isfinite(r))

    # the merged LoRA must change scores vs the raw base
    raw_params = {"backbone": jax.tree_util.tree_map(jnp.asarray, params),
                  "head": adaptor.params["head"]}
    r_raw = np.asarray(score(raw_params, batch))
    assert not np.allclose(r, r_raw)
