"""Preemption end-to-end (VERDICT r2 item 8): SIGKILL a training run
mid-epoch, resume from the orbax engine checkpoint, and assert the resumed
loss trajectory matches an uninterrupted run on the same data order.

The reference relies on deepspeed's save_ckpt/load_ckpt for this
(llava_reward/utils/deepspeed.py:467-540, train_llava_reward.py:118-119 —
where resume only prints a message); here the orbax path is exercised by a
real kill."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "preempt_worker.py")


def _run(mode, workdir, tag, timeout=420):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, WORKER, mode, workdir, tag],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=timeout,
    )


def _losses(workdir, tag):
    path = os.path.join(workdir, f"losses_{tag}.jsonl")
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]


def test_sigkill_resume_matches_uninterrupted(tmp_path):
    base = str(tmp_path / "full")
    os.makedirs(base)
    r = _run("full", base, "full")
    assert r.returncode == 0, r.stderr[-2000:]
    full = _losses(base, "full")
    assert len(full) == 6

    pre = str(tmp_path / "pre")
    os.makedirs(pre)
    r = _run("kill", pre, "interrupted")
    # SIGKILL: negative returncode, no graceful exit
    assert r.returncode == -9, (r.returncode, r.stderr[-2000:])
    interrupted = _losses(pre, "interrupted")
    assert len(interrupted) == 3  # steps 1..3 ran, then the kill

    r = _run("resume", pre, "resumed")
    assert r.returncode == 0, r.stderr[-2000:]
    resumed = _losses(pre, "resumed")
    assert len(resumed) == 3  # steps 4..6

    traj = interrupted + resumed
    assert [t["step"] for t in traj] == [t["step"] for t in full]
    np.testing.assert_allclose(
        [t["loss"] for t in traj], [t["loss"] for t in full], rtol=1e-6
    )
