"""Tensor-parallel mesh numerics + registry-dispatched eval harness."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llava_reward_tpu.core.config import RewardConfig, phi3v_tiny_config, qwen_tiny_config
from llava_reward_tpu.models import phi3v, qwen25_vl
from llava_reward_tpu.parallel.sharding import create_mesh, shard_batch, shard_params
from llava_reward_tpu.reward import init_head_params, reward_forward
from llava_reward_tpu.reward.model import RewardBatch


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_tp_mesh_matches_single_device():
    """(dp=1, fsdp=2, tp=4): XLA inserts the tp collectives from the sharding
    rules; outputs must match the unsharded forward."""
    cfg = phi3v_tiny_config(num_crops=4, num_layers=2, vision_layers=1,
                            hidden_size=64, num_heads=4)
    rcfg = RewardConfig(is_general_preference=True, value_head_dim=2)
    rcfg.layer_id = cfg.decoder.num_layers
    params = {
        "backbone": phi3v.init_params(jax.random.PRNGKey(0), cfg),
        "head": init_head_params(jax.random.PRNGKey(1), cfg, rcfg),
    }
    rng = np.random.default_rng(0)
    B, S = 8, 32
    batch = RewardBatch(
        input_ids=jnp.asarray(rng.integers(2, 100, (B, S)).astype(np.int32)),
        attention_mask=jnp.asarray(np.ones((B, S), np.int32)),
        pixel_values=None, img_gather_idx=None, splice_idx=None,
        num_img_tokens=None,
    )

    def fwd(p, b):
        return reward_forward(p, cfg, rcfg, b, training=False, attn_impl="xla").reward

    ref = np.asarray(jax.jit(fwd)(params, batch))

    mesh = create_mesh(dp=1, fsdp=2, tp=4)
    with mesh:
        p_s = shard_params(params, mesh)
        b_s = shard_batch(batch, mesh)
        out = np.asarray(jax.jit(fwd)(p_s, b_s))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_batch_inference_qwen_family(rng):
    """Registry dispatch + M-RoPE-aware pair stacking in the harness."""
    from llava_reward_tpu.evalx.adaptor import RewardAdaptor
    from llava_reward_tpu.evalx.batch_inference import batch_rm_inference
    from llava_reward_tpu.preprocess.qwen_vision import Qwen25VLProcessor

    cfg = qwen_tiny_config(num_layers=2, vision_depth=2)
    rcfg = RewardConfig(is_general_preference=True, value_head_dim=2)
    rcfg.layer_id = cfg.text.num_layers
    params = {
        "backbone": qwen25_vl.init_params(jax.random.PRNGKey(0), cfg),
        "head": init_head_params(jax.random.PRNGKey(1), cfg, rcfg),
    }
    adaptor = RewardAdaptor(cfg=cfg, rcfg=rcfg, params=params, model_type="qwen")

    class Tok:
        def __call__(self, text):
            out = []
            for t in text.split():
                out.append(
                    cfg.text.image_token_id if t == "<img>" else hash(t) % 300 + 3
                )
            return {"input_ids": out}

        def apply_chat_template(self, msgs, tokenize=False, add_generation_prompt=True):
            def flat(c):
                if isinstance(c, str):
                    return c
                return " ".join(
                    "<img>" if p.get("type") == "image" else p.get("text", "")
                    for p in c
                )

            return "x" * 58 + " ".join(flat(m["content"]) for m in msgs) + "x" * 23

    tok = Tok()
    proc = Qwen25VLProcessor(
        tok, min_pixels=cfg.min_pixels, max_pixels=cfg.max_pixels,
        image_token_id=cfg.text.image_token_id,
    )

    import os, tempfile

    from PIL import Image

    tmp = tempfile.mkdtemp()
    rows = []
    for i in range(3):
        for name in ("a", "b"):
            arr = (rng.random((64, 80, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(tmp, f"{i}{name}.png"))
        rows.append(
            {
                "prompt": f"prompt number {i}",
                "chosen_path": f"{i}a.png",
                "reject_path": f"{i}b.png",
                "c_rate": 1.0,
                "r_rate": 0.0,
            }
        )
    metrics = batch_rm_inference(
        adaptor, rows, tok, proc,
        batch_size=2, seq_len=96, image_root=tmp, attn_impl="xla",
        num_workers=2, progress=False,
    )
    assert metrics["num_pairs"] == 3
    assert 0.0 <= metrics["accuracy"] <= 1.0
