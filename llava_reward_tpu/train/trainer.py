"""Trainer: epochs/steps over the prefetch loader, jitted train step, EMA
loss, log/save cadence, per-epoch artifact export, eval loop, checkpoint GC.

Reference: GeneralPreferenceRewardTrainer (rm_trainer_general_preference.py)
— fit (:118-238), cls_fit (:240-345), evaluate (:381-445), checkpoint GC
(:370-378). Deviations by design:
- eval-during-training WORKS here (the reference's evaluate() unpacks the
  wrong tuple arity and crashes, SURVEY.md §7);
- --load_checkpoint actually resumes via orbax (the reference only prints a
  message, train_llava_reward.py:118-119);
- margin comes from c_rate - r_rate when --margin_loss (the reference reads
  an unbound variable, rm_trainer…py:143-144).
"""

from __future__ import annotations

import os
import shutil
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import Phi3VConfig, RewardConfig
from ..core.logging import init_logger
from ..io.artifact import save_reward_artifact
from ..lora.lora import peft_adapter_config, stacked_to_peft_state
from ..preprocess.collate import to_reward_batch
from ..reward.preference import preference_prob
from .train_step import TrainState, init_train_state, make_train_step

logger = init_logger(__name__)


class RewardTrainer:
    def __init__(
        self,
        *,
        cfg: Phi3VConfig,
        rcfg: RewardConfig,
        frozen: dict,
        trainable: dict,
        tx,
        loss_fn: Callable,
        train_loader,
        eval_loader=None,
        cls_based: bool = False,
        margin_loss: bool = False,
        max_epochs: int = 1,
        save_path: str = "./ckpt",
        save_steps: int = -1,
        eval_steps: int = -1,
        logging_steps: int = 1,
        max_ckpt_num: int = 3,
        lora_rank: int = 0,
        lora_alpha: float = 0.0,
        lora_dropout: float = 0.05,
        wandb_logger=None,
        mesh=None,
        shard_batch_fn: Optional[Callable] = None,
        save_best_model: bool = False,
        model_type: str = "phi3v",
        lora_targets: Optional[tuple] = None,
        ckpt_path: Optional[str] = None,
        ckpt_steps: int = -1,
    ):
        self.cfg, self.rcfg = cfg, rcfg
        self.frozen = frozen
        self.tx = tx
        self.state = init_train_state(trainable, tx)
        self.train_step = jax.jit(make_train_step(loss_fn, tx))
        self.train_loader = train_loader
        self.eval_loader = eval_loader
        self.cls_based = cls_based
        self.margin_loss = margin_loss
        self.max_epochs = max_epochs
        self.save_path = save_path
        self.save_steps = save_steps
        self.eval_steps = eval_steps
        self.logging_steps = logging_steps
        self.max_ckpt_num = max_ckpt_num
        self.lora_rank = lora_rank
        self.lora_alpha = lora_alpha
        self.lora_dropout = lora_dropout
        self.wandb = wandb_logger
        self.mesh = mesh
        self.shard_batch_fn = shard_batch_fn
        # --save_best_model: the reference's flag never fires
        # (save_logs_and_checkpoints returns None, rm_trainer…py:367-368);
        # here it tracks eval accuracy and keeps <save_path>/best.
        self.save_best_model = save_best_model
        self.best_eval_acc = float("-inf")
        self.model_type = model_type
        # preemption safety: engine-state (orbax) checkpoints every
        # ckpt_steps optimizer steps; fit() skips already-consumed batches
        # on resume so the loss trajectory continues where it stopped
        # (reference analog: deepspeed save_ckpt cadence, deepspeed.py:467)
        self.ckpt_path = ckpt_path
        self.ckpt_steps = ckpt_steps
        # the actual trained LoRA target list rides into adapter_config.json
        # so the reference's PEFT load_adapter wraps the right modules
        # (ADVICE r1: qwen/llava runs must not advertise phi3 targets)
        self.lora_targets = lora_targets
        # eval score fn is built ONCE and reused across evaluate() ticks —
        # a fresh jax.jit closure per call would retrace (and at full size,
        # recompile for minutes) on every eval cadence tick (VERDICT r4 #5)
        self._score_fn = None
        # last logged train metrics (the reference returns its logs_dict);
        # lets callers/tests read the loss without scraping log output
        self.last_train_logs: Dict[str, float] = {}
        if save_best_model and eval_loader is None and eval_steps == -1:
            logger.warning(
                "--save_best_model is inert: no eval loader and eval_steps=-1 "
                "means evaluate() never runs, so <save_path>/best never fires"
            )

    def _get_score_fn(self):
        if self._score_fn is None:
            from ..reward.model import reward_forward

            cfg, rcfg = self.cfg, self.rcfg
            self._score_fn = jax.jit(
                lambda p, l, vl, batch: reward_forward(
                    p, cfg, rcfg, batch, training=False, lora=l, vision_lora=vl
                ).reward
            )
        return self._score_fn

    # ------------------------------------------------------------ fit

    def fit(self):
        eval_steps = self.eval_steps
        if eval_steps == -1 and self.eval_loader is not None:
            eval_steps = len(self.train_loader)  # once per epoch (ref :121-122)
        save_steps = self.save_steps if self.save_steps != -1 else float("inf")

        global_step = 1
        loss_mean = 0.0
        # resume: state.step counts train_step calls already applied; the
        # samplers are deterministic per (seed, epoch), so skipping that
        # many batches replays the identical data order and the loss
        # trajectory continues exactly where the preempted run stopped
        skip = int(self.state.step)
        for epoch in range(self.max_epochs):
            sampler = getattr(self.train_loader, "sampler", None)
            if sampler is not None and hasattr(sampler, "set_epoch"):
                sampler.set_epoch(epoch)
            t_step = time.perf_counter()
            for batch in self.train_loader:
                if skip > 0:
                    skip -= 1
                    global_step += 1
                    continue
                if self.cls_based:
                    b, labels = batch
                    args = (to_reward_batch(b), jnp.asarray(labels))
                else:
                    chosen, rejected, c_rate, r_rate = batch
                    margin = (
                        jnp.asarray(c_rate - r_rate, jnp.float32)
                        if self.margin_loss
                        else None
                    )
                    args = (to_reward_batch(chosen), to_reward_batch(rejected), margin)
                if self.shard_batch_fn is not None:
                    args = tuple(
                        self.shard_batch_fn(a) if a is not None else None for a in args
                    )
                self.state, metrics = self.train_step(self.state, self.frozen, *args)
                loss = float(metrics["preference_loss"])
                loss_mean = loss_mean * 0.9 + 0.1 * loss  # EMA (ref :217)

                if global_step % self.logging_steps == 0:
                    dt = time.perf_counter() - t_step
                    t_step = time.perf_counter()
                    logs = {
                        "preference_loss": loss,
                        "prob": float(metrics["prob"]),
                        "loss_mean": loss_mean,
                        "grad_norm": float(metrics.get("grad_norm", 0.0)),
                        "step_time_s": dt / self.logging_steps,
                    }
                    self.last_train_logs = dict(logs, global_step=global_step)
                    logger.info(
                        "epoch %d step %d %s", epoch, global_step,
                        " ".join(f"{k}={v:.4f}" for k, v in logs.items()),
                    )
                    if self.wandb is not None:
                        self.wandb.log(
                            {f"train/{k}": v for k, v in logs.items()}
                            | {"train/global_step": global_step}
                        )
                if eval_steps and eval_steps > 0 and global_step % eval_steps == 0:
                    self.evaluate(global_step)
                if global_step % save_steps == 0:
                    tag = f"global_step{global_step}"
                    self.save_artifact(os.path.join(self.save_path, tag))
                    self.clean_old_checkpoints()
                if (
                    self.ckpt_path is not None
                    and self.ckpt_steps > 0
                    and global_step % self.ckpt_steps == 0
                ):
                    self.save_train_ckpt(self.ckpt_path)
                global_step += 1
            self.save_artifact(os.path.join(self.save_path, f"epoch_{epoch}"))
        if self.wandb is not None:
            self.wandb.finish()
        return self.state

    # ------------------------------------------------------------ eval

    def evaluate(self, global_step: int = 0) -> Dict[str, float]:
        if self.eval_loader is None:
            return {}
        from .train_step import PROJECTOR_PATHS, assemble_params

        params, lora, vision_lora = assemble_params(
            self.frozen, self.state.trainable, PROJECTOR_PATHS[self.model_type]
        )
        rcfg = self.rcfg
        score = self._get_score_fn()

        if self.cls_based:
            # pointwise (cls) eval: sigmoid(reward) vs binary labels, same
            # acc/F1/recall set the batch harness reports (evalx/metrics;
            # reference intent: rm_trainer_general_preference.py:240-345)
            rewards, labels = [], []
            for batch in self.eval_loader:
                b, y = batch
                r = score(params, lora, vision_lora, to_reward_batch(b))
                rewards.extend(np.asarray(r).reshape(-1).tolist())
                labels.extend(np.asarray(y).reshape(-1).tolist())
            if jax.process_count() > 1:
                from jax.experimental import multihost_utils

                rewards = np.asarray(
                    multihost_utils.process_allgather(np.asarray(rewards, np.float64))
                ).reshape(-1).tolist()
                labels = np.asarray(
                    multihost_utils.process_allgather(np.asarray(labels, np.int64))
                ).reshape(-1).tolist()
            from ..evalx.metrics import pointwise_metrics

            pm = pointwise_metrics(rewards, labels)
            acc = pm["accuracy"]
            metrics = {
                "eval_acc": acc,
                "eval_f1": pm["f1"],
                "eval_recall": pm["recall"],
                "eval_num_samples": pm["num_samples"],
            }
            return self._finish_eval(global_step, metrics, acc)
        probs = []
        for batch in self.eval_loader:
            chosen, rejected, c_rate, r_rate = batch
            cb, rb = to_reward_batch(chosen), to_reward_batch(rejected)
            c = score(params, lora, vision_lora, cb)
            r = score(params, lora, vision_lora, rb)
            p = preference_prob(
                c, r,
                is_general_preference=rcfg.is_general_preference,
                value_head_dim=rcfg.value_head_dim,
                tau=rcfg.general_preference_tau,
            )
            probs.extend(np.asarray(p).tolist())
        # multi-host: each process evaluates its data shard; gather all
        # probs before computing metrics (the reference all_reduces its
        # logs_dict, rm_trainer_general_preference.py:438-440)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            gathered = multihost_utils.process_allgather(
                np.asarray(probs, np.float64)
            )
            probs = np.asarray(gathered).reshape(-1).tolist()
        # full harness metric set (accuracy / tie-excluded / mean prob),
        # same function as eval_batch_inference (evalx/metrics.py)
        from ..evalx.metrics import pairwise_metrics

        pm = pairwise_metrics(probs)
        acc = pm["accuracy"]
        metrics = {
            "eval_acc": acc,
            "eval_acc_wo_tie": pm["accuracy_wo_tie"],
            "eval_mean_prob": pm["mean_prob"],
            "eval_num_pairs": pm["num_pairs"],
        }
        return self._finish_eval(global_step, metrics, acc)

    def _finish_eval(self, global_step, metrics, acc):
        logger.info("eval step %d %s", global_step, metrics)
        if self.save_best_model and acc > self.best_eval_acc:
            self.best_eval_acc = acc
            self.save_artifact(os.path.join(self.save_path, "best"))
            logger.info("new best eval_acc=%.4f -> saved %s/best", acc, self.save_path)
        if self.wandb is not None:
            self.wandb.log(
                {f"eval/{k}": v for k, v in metrics.items()}
                | {"eval/global_step": global_step}
            )
        return metrics

    # ------------------------------------------------------------ saving

    @staticmethod
    def _sync_hosts(tag: str):
        """Barrier so non-writer processes don't race past rank 0's file
        writes (e.g. into jax.distributed.shutdown); no-op single-process."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(tag)

    @staticmethod
    def _fetch_host(tree):
        """Host-fetch a param tree; multi-host-safe. Globally fsdp-sharded
        arrays span non-addressable devices and cannot be device_get --
        allgather them to fully-replicated numpy first (the analog of the
        reference's ZeRO-3 gather-before-save, deepspeed.py:333-359)."""
        if jax.process_count() == 1:
            return jax.device_get(tree)
        from jax.experimental import multihost_utils

        # tiled=True is required for global non-fully-addressable arrays
        # (and is a no-op reshape for already-replicated ones)
        return multihost_utils.process_allgather(tree, tiled=True)

    def save_artifact(self, path: str):
        """Write the reference-compatible artifact (deepspeed.py:333-417):
        pytorch_model.bin (heads + projector) + lora/ + reward_config.yaml.
        Multi-host: every process participates in the gather, rank 0 writes
        (the reference's rank-0 torch.save, deepspeed.py:414-417)."""
        trainable = self._fetch_host(self.state.trainable)
        # collectives must run on every process in the same order: prefetch
        # the frozen lm_head (full-FT export) BEFORE the rank gate
        frozen_bb = (
            self._fetch_host(self.frozen.get("backbone", {}))
            if trainable.get("backbone") is not None
            else None
        )
        if jax.process_index() != 0:
            self._sync_hosts("save_artifact")
            return
        head = trainable["head"]
        lora_state = None
        lora_config = None
        if trainable.get("lora") is not None and self.lora_rank > 0:
            dec_cfg = getattr(self.cfg, "decoder", None) or self.cfg.text
            lora_state = stacked_to_peft_state(trainable["lora"], dec_cfg)
            if self.lora_targets is not None:
                lora_config = peft_adapter_config(
                    self.lora_rank, self.lora_alpha, self.lora_dropout,
                    targets=tuple(self.lora_targets),
                )
            else:
                lora_config = peft_adapter_config(
                    self.lora_rank, self.lora_alpha, self.lora_dropout
                )
        if trainable.get("vision_lora") is not None:
            # unfrozen-vision CLIP adapters ride in the same PEFT file (the
            # reference's create_lora_config CLIP targets, utils.py:205-213)
            from ..lora.lora import vision_stacked_to_peft_state

            if lora_state is None:
                lora_state = {}
                lora_config = peft_adapter_config(
                    self.lora_rank, self.lora_alpha, self.lora_dropout,
                    targets=(),
                )
            lora_state.update(
                vision_stacked_to_peft_state(
                    trainable["vision_lora"], self.cfg.vision
                )
            )
            lora_config["target_modules"] = list(
                lora_config.get("target_modules", [])
            ) + ["q_proj", "k_proj", "v_proj", "out_proj", "fc1", "fc2"]
        save_reward_artifact(
            path,
            self.rcfg,
            head,
            projector_params=trainable.get("projector"),
            lora_state=lora_state,
            lora_config=lora_config,
            model_type=self.model_type,
        )
        if trainable.get("backbone") is not None:
            # full fine-tuning: also export the whole backbone as an HF-layout
            # checkpoint (save_model, deepspeed.py:277-332) alongside the
            # head artifact, so the _ft_phi-style loaders work from one dir
            from ..core.config import Phi3VConfig
            from ..io.torch_io import save_torch_state_dict

            if isinstance(self.cfg, Phi3VConfig):
                from ..io.hf_phi3v import hf_state_dict_from_params

                sd = hf_state_dict_from_params(trainable["backbone"], self.cfg)
                if "lm_head" in frozen_bb:
                    import numpy as _np

                    sd["lm_head.weight"] = _np.ascontiguousarray(
                        _np.asarray(frozen_bb["lm_head"]).T
                    )
                import torch

                save_torch_state_dict(
                    sd, os.path.join(path, "full_model", "pytorch_model.bin"),
                    torch.bfloat16,
                )
                # self-describing export (save_pretrained always writes
                # config.json): the eval adaptor reads decoder geometry from
                # it (vision geometry is weight-inferred), so a tiny-config
                # full-FT artifact round-trips through the eval CLI too
                import json as _json

                dc = self.cfg.decoder
                cfg_json = {
                    "model_type": "phi3_v",
                    "vocab_size": dc.vocab_size,
                    "hidden_size": dc.hidden_size,
                    "intermediate_size": dc.intermediate_size,
                    "num_hidden_layers": dc.num_layers,
                    "num_attention_heads": dc.num_heads,
                    "num_key_value_heads": dc.num_kv_heads,
                    "rms_norm_eps": dc.rms_norm_eps,
                    "rope_theta": dc.rope_theta,
                    "max_position_embeddings": dc.max_position_embeddings,
                    "original_max_position_embeddings":
                        dc.original_max_position_embeddings,
                    "sliding_window": dc.sliding_window,
                    "pad_token_id": dc.pad_token_id,
                    "eos_token_id": dc.eos_token_id,
                }
                if dc.rope_scaling is not None:
                    cfg_json["rope_scaling"] = {
                        "type": dc.rope_scaling.rope_type,
                        "short_factor": list(dc.rope_scaling.short_factor),
                        "long_factor": list(dc.rope_scaling.long_factor),
                    }
                with open(os.path.join(path, "full_model", "config.json"), "w") as f:
                    _json.dump(cfg_json, f, indent=2)
                logger.info("saved full fine-tuned backbone to %s/full_model", path)
            else:
                logger.warning(
                    "full-FT export only implemented for phi3v; backbone not saved"
                )
        logger.info("saved reward artifact to %s", path)
        self._sync_hosts("save_artifact")

    def clean_old_checkpoints(self, max_ckpt_mem_gb: float = None):
        if jax.process_index() != 0:
            return
        """Keep the newest max_ckpt_num step dirs (rm_trainer…py:370-378),
        plus the size-based rotation of save_ckpt (deepspeed.py:496-511)."""
        if not os.path.isdir(self.save_path):
            return

        def dir_size(d):
            total = 0
            for root, _, files in os.walk(d):
                for f in files:
                    total += os.path.getsize(os.path.join(root, f))
            return total

        dirs = [
            d for d in os.listdir(self.save_path) if d.startswith("global_step")
        ]
        dirs.sort(key=lambda d: os.path.getmtime(os.path.join(self.save_path, d)))
        while len(dirs) > self.max_ckpt_num:
            victim = dirs.pop(0)
            shutil.rmtree(os.path.join(self.save_path, victim), ignore_errors=True)
            logger.info("removed old checkpoint %s", victim)
        if max_ckpt_mem_gb:
            budget = max_ckpt_mem_gb * 1024 ** 3
            while len(dirs) > 1 and sum(
                dir_size(os.path.join(self.save_path, d)) for d in dirs
            ) > budget:
                victim = dirs.pop(0)
                shutil.rmtree(os.path.join(self.save_path, victim), ignore_errors=True)
                logger.info("removed checkpoint %s (size budget)", victim)

    # ------------------------------------------------------------ resume

    def save_train_ckpt(self, path: str):
        """Engine-state checkpoint (save_ckpt equivalent, deepspeed.py:467) —
        actually wired, via orbax. Multi-host: the global jax.Arrays are
        handed to orbax directly — every process writes its addressable
        shards and orbax coordinates the commit (no host gather needed)."""
        import orbax.checkpoint as ocp

        state = {"step": self.state.step, "trainable": self.state.trainable,
                 "opt_state": self.state.opt_state}
        if jax.process_count() == 1:
            state = jax.device_get(state)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(
            os.path.abspath(os.path.join(path, "train_state")), state,
            force=True,
        )
        ckptr.wait_until_finished()

    def load_train_ckpt(self, path: str):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        state = {"step": self.state.step, "trainable": self.state.trainable,
                 "opt_state": self.state.opt_state}
        if jax.process_count() == 1:
            target = jax.device_get(state)
        else:
            # abstract target carrying each array's sharding: orbax restores
            # straight to globally-sharded jax.Arrays, shard-local reads only
            target = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
                if isinstance(x, jax.Array)
                else x,
                state,
            )
        restored = ckptr.restore(
            os.path.abspath(os.path.join(path, "train_state")), target
        )
        self.state = TrainState(
            restored["step"], restored["trainable"], restored["opt_state"]
        )
        logger.info("resumed train state from %s (step %s)", path, restored["step"])
