"""Pointwise (CLS) pipeline on UnsafeBench/SMID-schema data.

The reference ships UnsafeBench pointwise train JSONs and the SMID test set
(/root/reference/data/ — SURVEY §2 #22) whose images live on the authors'
machine; data/gen_safety_fixtures.py reproduces the exact schemas with
synthetic images. These tests run the full CLS train path (the reference's
cls_fit, rm_trainer_general_preference.py:240-345) and the pointwise eval
harness (batch_inference_rm_phi.py:123-152) over that data."""

import json
import os
import sys

import numpy as np
import pytest

import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "data"))
from gen_safety_fixtures import generate  # noqa: E402


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    out = tmp_path_factory.mktemp("safety")
    generate(str(out), n_train=16, n_test=8, seed=0)
    return out


def test_schema_matches_reference(fixtures):
    with open(fixtures / "Unsafebench_train.json") as f:
        train = json.load(f)
    assert set(train[0]) == {
        "safety_label", "category", "source", "path", "label", "prompt"
    }
    assert train[0]["safety_label"] in ("Safe", "Unsafe")
    with open(fixtures / "smid_test.json") as f:
        test = json.load(f)
    assert set(test[0]) == {"path", "label", "prompt"}
    assert test[0]["prompt"] == ""  # SMID rows carry empty prompts


def test_shipped_reference_layout_files():
    """The repo SHIPS generated datasets at the reference's data paths
    (/root/reference/data/ layout): data/Unsafebench/Unsafebench_train.json,
    Unsafebench_cap_train.json (every prompt captioned; the plain variant
    leaves ~28% empty like the reference) and data/smid_test.json, with
    every referenced image present under data/."""
    root = os.path.join(os.path.dirname(__file__), "..", "data")
    with open(os.path.join(root, "Unsafebench", "Unsafebench_train.json")) as f:
        train = json.load(f)
    with open(
        os.path.join(root, "Unsafebench", "Unsafebench_cap_train.json")
    ) as f:
        cap = json.load(f)
    with open(os.path.join(root, "smid_test.json")) as f:
        smid = json.load(f)
    assert len(train) == len(cap) >= 256
    assert all(r["prompt"] for r in cap)
    assert 0 < sum(1 for r in train if not r["prompt"]) < len(train)
    # rows are otherwise identical between the two variants
    assert [dict(r, prompt="") for r in train] == [
        dict(r, prompt="") for r in cap
    ]
    for rows in (train, cap, smid):
        for r in rows[:8] + rows[-8:]:
            assert os.path.exists(os.path.join(root, r["path"])), r["path"]
    assert all(r["prompt"] == "" for r in smid)


def test_cls_train_cli_on_unsafebench_schema(fixtures, tmp_path):
    """The train CLI sniffs the pointwise format and runs the CLS objective
    end-to-end (smoke mode, tiny random config), ignoring the UnsafeBench
    extra keys; the artifact lands on disk."""
    import train_llava_reward
    from llava_reward_tpu.core.args import build_train_parser

    save = tmp_path / "ckpt"
    args = build_train_parser().parse_args([
        "--model_type", "phi3v",
        "--dataset", str(fixtures / "Unsafebench_train.json"),
        "--image_root", str(fixtures),
        "--max_epochs", "1",
        "--micro_train_batch_size", "1",
        "--max_len", "256",
        # default seq_len (2944, sized for 16 HD crops) makes the CPU train
        # step minutes-long; the tiny config uses 4 crops (~900 img tokens)
        "--seq_len", "1024",
        "--max_samples", "16",
        "--save_path", str(save),
        "--train_split_ratio", "0.75",
    ])
    train_llava_reward.train(args)
    assert os.path.exists(save / "epoch_0" / "pytorch_model.bin")
    with open(save / "epoch_0" / "reward_config.yaml") as f:
        assert "is_general_preference" in f.read()


def test_pointwise_eval_on_smid_schema(fixtures):
    """Pointwise eval harness over SMID-format rows (empty prompts):
    accuracy/F1/recall come back finite (batch_inference_rm_phi.py:146-152)."""
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

    class Tok:
        eos_token = "</s>"

        def __call__(self, text):
            return {"input_ids": [hash(t) % 400 + 3 for t in text.split()] or [3]}

        def apply_chat_template(self, msgs, tokenize=False, add_generation_prompt=True):
            return "".join(m["content"] for m in msgs) + " " + "x" * 22

    tok = Tok()
    with open(fixtures / "smid_test.json") as f:
        rows = json.load(f)
    metrics = batch_rm_inference(
        adaptor, rows, tok, Phi3VProcessor(tok, num_crops=4),
        batch_size=4, seq_len=896, image_root=str(fixtures), attn_impl="xla",
        num_workers=2, progress=False,
    )
    for key in ("accuracy", "f1", "recall"):
        assert key in metrics and np.isfinite(metrics[key]), (key, metrics)
