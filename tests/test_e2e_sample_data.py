"""End-to-end batch scoring on the reference's bundled sample data
(data/sample_test — the reference's own smoke check, SURVEY.md §4),
with tiny random weights."""

import json
import os

import numpy as np
import pytest

import jax

REF = "/root/reference"
SAMPLE = os.path.join(REF, "data/sample_test/pairwise_sample.json")
SAMPLE_CLS = os.path.join(REF, "data/sample_test/non_pairwise_sample.json")

pytestmark = pytest.mark.skipif(
    not os.path.exists(SAMPLE), reason="reference sample data unavailable"
)


class FakeTok:
    eos_token = "</s>"
    pad_token_id = 0

    def __call__(self, text):
        return {"input_ids": [hash(t) % 400 + 3 for t in text.split()]}

    def apply_chat_template(self, msgs, tokenize=False, add_generation_prompt=True):
        return "".join(m["content"] for m in msgs) + " " + "x" * 22


def _tiny_adaptor():
    from llava_reward_tpu.core.config import RewardConfig, phi3v_tiny_config
    from llava_reward_tpu.evalx.adaptor import RewardAdaptor
    from llava_reward_tpu.models import phi3v
    from llava_reward_tpu.reward import init_head_params

    cfg = phi3v_tiny_config(num_crops=4)
    rcfg = RewardConfig(is_general_preference=True, value_head_dim=2)
    rcfg.layer_id = cfg.decoder.num_layers
    params = {
        "backbone": phi3v.init_params(jax.random.PRNGKey(0), cfg),
        "head": init_head_params(jax.random.PRNGKey(1), cfg, rcfg),
    }
    return RewardAdaptor(cfg=cfg, rcfg=rcfg, params=params, model_type="phi3v")


def test_pairwise_sample_scoring():
    from llava_reward_tpu.evalx.batch_inference import batch_rm_inference
    from llava_reward_tpu.preprocess.phi3v_processor import Phi3VProcessor

    adaptor = _tiny_adaptor()
    with open(SAMPLE) as f:
        rows = json.load(f)
    tok = FakeTok()
    proc = Phi3VProcessor(tok, num_crops=4)
    metrics = batch_rm_inference(
        adaptor, rows, tok, proc,
        batch_size=2, seq_len=896, image_root=REF, attn_impl="xla",
        num_workers=2, progress=False,
    )
    assert metrics["num_pairs"] == len(rows)
    assert 0.0 <= metrics["accuracy"] <= 1.0
    assert "mean_forward_s" in metrics


def test_pointwise_sample_scoring():
    from llava_reward_tpu.core.config import RewardConfig, phi3v_tiny_config
    from llava_reward_tpu.evalx.adaptor import RewardAdaptor
    from llava_reward_tpu.evalx.batch_inference import batch_rm_inference
    from llava_reward_tpu.models import phi3v
    from llava_reward_tpu.preprocess.phi3v_processor import Phi3VProcessor
    from llava_reward_tpu.reward import init_head_params

    cfg = phi3v_tiny_config(num_crops=4)
    rcfg = RewardConfig(is_general_preference=False)
    rcfg.layer_id = cfg.decoder.num_layers
    params = {
        "backbone": phi3v.init_params(jax.random.PRNGKey(0), cfg),
        "head": init_head_params(jax.random.PRNGKey(1), cfg, rcfg),
    }
    adaptor = RewardAdaptor(cfg=cfg, rcfg=rcfg, params=params, model_type="phi3v")
    with open(SAMPLE_CLS) as f:
        rows = json.load(f)
    tok = FakeTok()
    proc = Phi3VProcessor(tok, num_crops=4)
    metrics = batch_rm_inference(
        adaptor, rows, tok, proc,
        batch_size=2, seq_len=896, image_root=REF, attn_impl="xla",
        num_workers=2, progress=False,
    )
    assert metrics["num_samples"] == len(rows)
    assert {"accuracy", "f1", "recall"} <= set(metrics)


def test_score_user_input():
    from llava_reward_tpu.evalx.batch_inference import score_user_input
    from llava_reward_tpu.preprocess.phi3v_processor import Phi3VProcessor

    adaptor = _tiny_adaptor()
    tok = FakeTok()
    proc = Phi3VProcessor(tok, num_crops=4)
    imgs = [
        os.path.join(REF, "data/sample_test/sample_img/0_c.jpg"),
        os.path.join(REF, "data/sample_test/sample_img/0_r.jpg"),
    ]
    r = score_user_input(
        adaptor, tok, proc, "a curious cat", imgs, seq_len=896, attn_impl="xla"
    )
    assert r.shape == (2, 2)
    assert np.all(np.isfinite(r))


def test_mesh_from_args():
    from types import SimpleNamespace

    from llava_reward_tpu.core.mesh import mesh_from_args

    m = mesh_from_args(
        SimpleNamespace(zero_stage=2, zpg=1, mesh_dp=2, mesh_fsdp=4, mesh_tp=1)
    )
    assert dict(m.shape) == {"dp": 2, "fsdp": 4, "tp": 1}
    m0 = mesh_from_args(
        SimpleNamespace(zero_stage=0, zpg=1, mesh_dp=1, mesh_fsdp=-1, mesh_tp=1)
    )
    assert m0.shape["fsdp"] == 1
