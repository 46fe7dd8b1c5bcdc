"""Two-process jax.distributed test (VERDICT r1 item 6).

Spawns 2 REAL processes (4 CPU devices each -> 8 global), runs one FSDP
train step with per-host GroupSampler data sharding (tests/mp_worker.py),
and asserts: both processes agree, the 8 local row sets partition the
dataset, and the loss equals a single-process 8-virtual-device run on the
same rows. Covers what the reference only exercises via real deepspeed
launches (llava_reward/utils/deepspeed.py:97-111)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def mp_results():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, cwd=REPO,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("mp worker timed out")
        assert p.returncode == 0, err.decode()[-2000:]
        line = [l for l in out.decode().splitlines() if l.startswith("{")][-1]
        outs.append(json.loads(line))
    return outs


def test_two_process_losses_agree(mp_results):
    r0, r1 = mp_results
    assert r0["loss"] == pytest.approx(r1["loss"], rel=1e-6)
    assert r0["grad_norm"] == pytest.approx(r1["grad_norm"], rel=1e-6)
    # per-host row sets partition the dataset (GroupSampler round-robin)
    assert sorted(r0["local_rows"] + r1["local_rows"]) == list(range(8))
    assert set(r0["local_rows"]).isdisjoint(r1["local_rows"])


TRAIN_WORKER = os.path.join(REPO, "tests", "mp_train_worker.py")


@pytest.fixture(scope="module")
def mp_train_results(tmp_path_factory):
    """Drive the PRODUCTION train() under 2 processes (VERDICT r4 item 3)."""
    sys.path.insert(0, os.path.join(REPO, "data"))
    from gen_safety_fixtures import generate

    datadir = tmp_path_factory.mktemp("mp_data")
    outdir = tmp_path_factory.mktemp("mp_out")
    generate(str(datadir), n_train=16, n_test=4, seed=0)
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, TRAIN_WORKER, str(pid), "2", str(port),
             str(datadir), str(outdir)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, cwd=REPO,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("mp train worker timed out")
        assert p.returncode == 0, err.decode()[-3000:]
        line = [l for l in out.decode().splitlines() if l.startswith("{")][-1]
        outs.append(json.loads(line))
    return outs, datadir


def test_train_cli_two_process_partition_and_parity(mp_train_results):
    """The train CLI under 2 processes: per-host data partition (no
    duplicated rows — the round-4 gap) and first-step loss parity with a
    single-process 8-device run of the same train() on the same data."""
    (r0, r1), datadir = mp_train_results
    # each host saw half the 12 train rows; together they partition them
    assert r0["local_batch"] == r1["local_batch"] == 4
    assert len(r0["local_rows"]) == len(r1["local_rows"]) == 6
    assert set(r0["local_rows"]).isdisjoint(r1["local_rows"])
    assert sorted(r0["local_rows"] + r1["local_rows"]) == list(range(12))
    assert r0["n_steps"] == r1["n_steps"] == 1
    assert r0["loss"] == pytest.approx(r1["loss"], rel=1e-6)

    # single-process parity: same dataset/seed, 8 virtual devices (conftest).
    # The 2-proc global batch is a row permutation of this one (rank
    # striding over the same permutation), so the mean loss must agree.
    import train_llava_reward
    from llava_reward_tpu.core.args import build_train_parser

    import tempfile

    with tempfile.TemporaryDirectory() as out:
        args = build_train_parser().parse_args([
            "--model_type", "phi3v",
            "--dataset", os.path.join(str(datadir), "Unsafebench_train.json"),
            "--image_root", str(datadir),
            "--max_epochs", "1",
            "--micro_train_batch_size", "1",
            "--seq_len", "1024",
            "--max_samples", "16",
            "--train_split_ratio", "0.75",
            "--logging_steps", "1",
            "--save_path", os.path.join(out, "ckpt"),
            "--ckpt_path", os.path.join(out, "resume"),
        ])
        trainer = train_llava_reward.train(args)
        single_loss = trainer.last_train_logs["preference_loss"]
    assert single_loss == pytest.approx(r0["loss"], rel=2e-5)


def test_matches_single_process(mp_results):
    """Same rows, single process, 8 virtual devices (conftest mesh)."""
    from llava_reward_tpu.core.config import RewardConfig, phi3v_tiny_config
    from llava_reward_tpu.lora.lora import init_lora
    from llava_reward_tpu.models import phi3v
    from llava_reward_tpu.parallel.sharding import (
        create_mesh, shard_batch, shard_params,
    )
    from llava_reward_tpu.reward import RewardBatch, init_head_params
    from llava_reward_tpu.train.optim import make_optimizer
    from llava_reward_tpu.train.train_step import (
        init_train_state, make_pairwise_loss_fn, make_train_step,
    )

    cfg = phi3v_tiny_config(num_crops=4, num_layers=2, vision_layers=1)
    rcfg = RewardConfig()
    rcfg.layer_id = cfg.decoder.num_layers
    frozen = {"backbone": phi3v.init_params(jax.random.PRNGKey(0), cfg)}
    trainable = {
        "head": init_head_params(jax.random.PRNGKey(1), cfg, rcfg),
        "lora": init_lora(jax.random.PRNGKey(2), cfg.decoder, 4, 8),
        "projector": None,
    }
    B, S = 8, 16
    rng = np.random.default_rng(7)  # same table as mp_worker
    ids_c = rng.integers(2, cfg.decoder.vocab_size - 2, (B, S)).astype(np.int32)
    ids_r = rng.integers(2, cfg.decoder.vocab_size - 2, (B, S)).astype(np.int32)

    def batch(ids):
        return RewardBatch(
            input_ids=jnp.asarray(ids),
            attention_mask=jnp.asarray(np.ones((B, S), np.int32)),
            pixel_values=None, img_gather_idx=None, splice_idx=None,
            num_img_tokens=None,
        )

    mesh = create_mesh(dp=2, fsdp=4, tp=1)
    tx = make_optimizer(1e-3, 10, warmup_ratio=0.0)
    loss_fn = make_pairwise_loss_fn(cfg, rcfg, attn_impl="xla", remat=False)
    step = jax.jit(make_train_step(loss_fn, tx))
    with mesh:
        st = init_train_state(shard_params(trainable, mesh), tx)
        st, metrics = step(
            st, shard_params(frozen, mesh),
            shard_batch(batch(ids_c), mesh), shard_batch(batch(ids_r), mesh),
        )
        loss = float(jax.device_get(metrics["preference_loss"]))

    # the 2-proc global batch is a row permutation of this one; the pairwise
    # loss is a mean over rows, so the values must agree
    assert loss == pytest.approx(mp_results[0]["loss"], rel=2e-5)
