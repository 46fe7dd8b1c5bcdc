"""Preemption worker: tiny deterministic training run that can SIGKILL
itself mid-epoch and later resume from the orbax engine state.

Launched by test_preemption.py. Appends one JSON line per optimizer step
({"step": n, "loss": x}) to the loss log so a SIGKILL cannot lose history.

Modes (argv[1]): "full" (run all steps), "kill" (SIGKILL before batch K),
"resume" (load the engine ckpt, continue).
"""

import json
import os
import signal
import sys


N_STEPS = 6
KILL_AT = 3  # steps 0..2 complete, ckpt saved after each, then SIGKILL


def make_batches():
    import numpy as np

    from llava_reward_tpu.preprocess.collate import Batch

    B, S = 2, 12
    batches = []
    for i in range(N_STEPS):
        rng = np.random.default_rng(1000 + i)

        def mk():
            return Batch(
                input_ids=rng.integers(2, 100, (B, S)).astype(np.int32),
                attention_mask=np.ones((B, S), np.int32),
                splice_idx=np.full((B, S), -1, np.int32),
                pixel_values=None,
                img_gather_idx=None,
                num_img_tokens=np.zeros((B,), np.int32),
            )

        batches.append((mk(), mk(), np.ones(B, np.float32), np.zeros(B, np.float32)))
    return batches


class KillingLoader(list):
    """Yields batches; in 'kill' mode SIGKILLs the process before batch K —
    a real preemption (no atexit, no flushing)."""

    def __init__(self, batches, kill_at=None):
        super().__init__(batches)
        self.kill_at = kill_at

    def __iter__(self):
        for i, b in enumerate(list.__iter__(self)):
            if self.kill_at is not None and i == self.kill_at:
                os.kill(os.getpid(), signal.SIGKILL)
            yield b


def main():
    mode = sys.argv[1]
    workdir = sys.argv[2]
    loss_log = os.path.join(workdir, f"losses_{sys.argv[3]}.jsonl")
    ckpt = os.path.join(workdir, "engine")

    import jax

    jax.config.update("jax_platforms", "cpu")

    from llava_reward_tpu.core.config import RewardConfig, phi3v_tiny_config
    from llava_reward_tpu.models import phi3v
    from llava_reward_tpu.reward import init_head_params
    from llava_reward_tpu.train.optim import make_optimizer
    from llava_reward_tpu.train.train_step import make_pairwise_loss_fn
    from llava_reward_tpu.train.trainer import RewardTrainer

    cfg = phi3v_tiny_config(num_layers=2, vision_layers=1)
    rcfg = RewardConfig(is_general_preference=True, value_head_dim=2)
    rcfg.layer_id = cfg.decoder.num_layers
    frozen = {"backbone": phi3v.init_params(jax.random.PRNGKey(0), cfg)}
    trainable = {
        "head": init_head_params(jax.random.PRNGKey(1), cfg, rcfg),
        "lora": None,
        "projector": None,
        "vision_lora": None,
    }

    loader = KillingLoader(make_batches(), KILL_AT if mode == "kill" else None)
    trainer = RewardTrainer(
        cfg=cfg,
        rcfg=rcfg,
        frozen=frozen,
        trainable=trainable,
        tx=make_optimizer(1e-2, N_STEPS),
        loss_fn=make_pairwise_loss_fn(cfg, rcfg, attn_impl="xla", remat=False),
        train_loader=loader,
        save_path=os.path.join(workdir, "artifacts"),
        ckpt_path=ckpt,
        ckpt_steps=1,
    )
    if mode == "resume":
        trainer.load_train_ckpt(ckpt)

    orig_step = trainer.train_step

    def recording_step(state, frozen_, *a):
        state, m = orig_step(state, frozen_, *a)
        with open(loss_log, "a") as f:
            f.write(
                json.dumps(
                    {"step": int(state.step), "loss": float(m["preference_loss"])}
                )
                + "\n"
            )
            f.flush()
            os.fsync(f.fileno())
        return state, m

    trainer.train_step = recording_step
    trainer.fit()
    print(json.dumps({"done": True, "final_step": int(trainer.state.step)}))


if __name__ == "__main__":
    main()
