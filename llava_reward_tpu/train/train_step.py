"""The pjit-compiled training step.

Reference hot loop (rm_trainer_general_preference.py:142-227): two forwards
(chosen, rejected) -> loss -> DeepSpeed backward/step. TPU-native redesign:
- ONE stacked forward for the pair (reward/model.py:paired_forward);
- differentiation wrt the TRAINABLE tree only (LoRA + heads [+ projector]),
  so the frozen 4B backbone never has grads or optimizer state — the
  ZeRO-3-for-mostly-frozen-models trade-off from SURVEY.md §7;
- grad accumulation via optax.MultiSteps (configured in optim.py);
- bf16 activations, fp32 loss when --compute_fp32_loss.

Loss selection mirrors the trainer's tree (rm_trainer…py:70-93):
  GPM dim-2 -> general_preference_loss; GPM dim-1 -> cls_loss;
  GPM high-dim + prompt_head -> MoE loss; GPM high-dim -> fixed-R loss;
  cls_based -> binary_cls_loss; else -> Bradley-Terry pairwise_loss.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..core.config import Phi3VConfig, RewardConfig
from ..reward import losses
from ..reward.heads import eos_index_from_mask, prompt_skew_block_matrices
from ..reward.model import RewardBatch, paired_forward, reward_forward


class TrainState(NamedTuple):
    step: jnp.ndarray
    trainable: Any  # {'head': ..., 'lora': ...|None, 'projector': ...|None}
    opt_state: Any


def select_loss_name(
    rcfg: RewardConfig, cls_based: bool, add_img_eos: bool = False
) -> str:
    """(rm_trainer…py:70-93). ``add_img_eos`` forces the dim-2 GPM product
    even for high-dim heads (ref :84-86)."""
    if rcfg.is_general_preference:
        if rcfg.value_head_dim == 2 and not rcfg.add_prompt_head and not add_img_eos:
            return "gpm"
        if rcfg.value_head_dim == 1:
            return "cls"
        assert rcfg.value_head_dim % 2 == 0, "GPM value head dim must be even"
        if rcfg.add_prompt_head:
            return "moe"
        if add_img_eos:
            return "gpm"
        return "high_dim_gpm"
    if cls_based:
        return "binary_cls"
    return "bt"


PROJECTOR_PATHS = {
    # where each family's forward reads the projector from the backbone tree
    # (reward_adaptor_loader.py re-keying: img_projection / merger /
    #  multi_modal_projector)
    "phi3v": ("vision", "img_projection"),
    "qwen": ("visual", "merger"),
    "llava": ("vision", "projector"),
}


def assemble_params(
    frozen: dict,
    trainable: dict,
    projector_path: Tuple[str, ...] = PROJECTOR_PATHS["phi3v"],
):
    """Merge the trainable leaves back into a full forward tree.
    Returns (params, lora, vision_lora).

    ``projector_path`` is the family-specific slot the forward reads the
    projector from (PROJECTOR_PATHS / core.registry.ModelFamily) — with
    --ft_projector the trained projector must land where that family's
    forward looks, not at phi3v's hardcoded slot (ADVICE r1).

    Full fine-tuning (the reference's lora_rank=0 mode, consumed by the
    _ft_phi eval harness): the ENTIRE backbone lives in ``trainable``
    ('backbone' key) and ``frozen`` holds only auxiliaries like lm_head."""
    backbone = trainable.get("backbone") or frozen["backbone"]
    if trainable.get("projector") is not None:
        backbone = dict(backbone)
        node = backbone
        for key in projector_path[:-1]:
            node[key] = dict(node[key])
            node = node[key]
        node[projector_path[-1]] = trainable["projector"]
    params = {"backbone": backbone, "head": trainable["head"]}
    return params, trainable.get("lora"), trainable.get("vision_lora")


def make_pairwise_loss_fn(
    cfg: Phi3VConfig,
    rcfg: RewardConfig,
    *,
    cls_based: bool = False,
    compute_fp32_loss: bool = False,
    attn_impl: str = "auto",
    remat: bool = True,
    add_pretrain_loss: bool = False,
    ptx_loss_coef: float = 0.1,
    reward_scaler_beta: float = 2.0,
    add_img_eos: bool = False,
    projector_path: Tuple[str, ...] = PROJECTOR_PATHS["phi3v"],
) -> Callable:
    """``add_pretrain_loss`` mixes the SFTSum ptx regulariser over the chosen
    sequence's LM logits (rm_trainer…py:178-208): loss = (1 - coef) *
    preference + coef * ptx. Requires 'lm_head' in the frozen backbone tree.
    The reference runs a THIRD full forward for ptx; here the logits come
    from the same stacked forward's chosen hidden states (one matmul more,
    one 4B-model forward less)."""
    loss_name = select_loss_name(rcfg, cls_based, add_img_eos)
    tau = rcfg.general_preference_tau

    def loss_fn(
        trainable: dict,
        frozen: dict,
        chosen: RewardBatch,
        rejected: RewardBatch,
        margin: Optional[jnp.ndarray] = None,
    ):
        params, lora, vision_lora = assemble_params(frozen, trainable, projector_path)
        prompt_end = None
        if loss_name == "moe":
            # prompt-conditioned R gathers the hidden state at the prompt's
            # last token; the reference's index arithmetic is broken
            # (unbound chosen_response_len, rm_trainer…py:170) — we use the
            # EOS position, which for reward inputs IS the prompt end.
            prompt_end = eos_index_from_mask(chosen.attention_mask)
        c_r, r_r, prompt_hidden, chosen_last_hidden = paired_forward(
            params, cfg, rcfg, chosen, rejected,
            training=True, attn_impl=attn_impl, remat=remat, lora=lora,
            vision_lora=vision_lora, prompt_end_index=prompt_end,
        )
        if compute_fp32_loss:
            c_r = c_r.astype(jnp.float32)
            r_r = r_r.astype(jnp.float32)

        if loss_name == "gpm":
            loss, prob = losses.general_preference_loss(c_r, r_r, margin, tau=tau)
        elif loss_name == "cls":
            loss, prob = losses.cls_loss(c_r, r_r, margin)
        elif loss_name == "high_dim_gpm":
            loss, prob = losses.high_dim_general_preference_loss(
                c_r, r_r, margin, tau=tau, value_head_dim=rcfg.value_head_dim
            )
        elif loss_name == "moe":
            R = prompt_skew_block_matrices(
                trainable["head"]["prompt_head"],
                prompt_hidden.astype(jnp.float32),
                rcfg.value_head_dim,
            )
            loss, prob = losses.high_dim_general_preference_moe_loss(
                c_r, r_r, R, margin, softmax_tau=tau
            )
        else:  # bt
            loss, prob = losses.pairwise_loss(c_r, r_r, margin, tau=tau)

        metrics = {"preference_loss": loss, "prob": prob}

        if add_pretrain_loss:
            lm_head = (trainable.get("backbone") or frozen["backbone"]).get("lm_head")
            if lm_head is None:
                raise ValueError("--add_pretrain_loss needs lm_head weights")
            logits = chosen_last_hidden @ lm_head  # (B, S, V)
            # mask out image positions like the reference's
            # c_mask & (chosen_ids != -1) (rm_trainer…py:191-197)
            m = chosen.attention_mask
            if chosen.splice_idx is not None:
                m = m * (chosen.splice_idx < 0).astype(m.dtype)
            ptx = losses.sft_sum_loss(
                logits.astype(jnp.float32),
                chosen.input_ids,
                m,
                beta=reward_scaler_beta,
            )
            metrics["ptx_loss"] = ptx
            loss = (1 - ptx_loss_coef) * loss + ptx_loss_coef * ptx
            metrics["loss"] = loss

        return loss, metrics

    return loss_fn


def make_cls_loss_fn(
    cfg: Phi3VConfig,
    rcfg: RewardConfig,
    *,
    compute_fp32_loss: bool = False,
    attn_impl: str = "auto",
    remat: bool = True,
    projector_path: Tuple[str, ...] = PROJECTOR_PATHS["phi3v"],
) -> Callable:
    """Pointwise classification objective (cls_fit, rm_trainer…py:240-345)."""

    def loss_fn(trainable, frozen, batch: RewardBatch, labels: jnp.ndarray):
        params, lora, vision_lora = assemble_params(frozen, trainable, projector_path)
        out = reward_forward(
            params, cfg, rcfg, batch,
            training=True, attn_impl=attn_impl, remat=remat, lora=lora,
            vision_lora=vision_lora,
        )
        r = out.reward[..., 0]
        if compute_fp32_loss:
            r = r.astype(jnp.float32)
        loss, prob = losses.binary_cls_loss(r, labels)
        return loss, {"preference_loss": loss, "prob": prob}

    return loss_fn


def make_train_step(loss_fn: Callable, tx: optax.GradientTransformation):
    """Returns train_step(state, frozen, *loss_args) -> (state, metrics).

    jit/pjit this with the mesh shardings from parallel/sharding.py; XLA
    emits the reduce-scatter/all-gather that ZeRO does by hand.
    """

    def train_step(state: TrainState, frozen: dict, *loss_args):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.trainable, frozen, *loss_args
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.trainable)
        new_trainable = optax.apply_updates(state.trainable, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            TrainState(state.step + 1, new_trainable, new_opt_state),
            metrics,
        )

    return train_step


def init_train_state(trainable: dict, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(jnp.zeros((), jnp.int32), trainable, tx.init(trainable))
