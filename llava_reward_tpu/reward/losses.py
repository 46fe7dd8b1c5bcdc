"""The full loss zoo — JAX ports of all 22 loss classes in the reference
(llava_reward/models/loss.py:1-535), as pure functions returning
(loss_mean, prob_mean).

Trainer-wired losses (rm_trainer_general_preference.py:70-93):
  pairwise_loss (BT), general_preference_loss (GPM dim-2),
  high_dim_general_preference_loss (fixed skew R),
  high_dim_general_preference_moe_loss (data-dependent R via prompt_head),
  cls_loss (paired BCE), binary_cls_loss (pointwise BCE), sft_sum_loss (ptx).
The rest are defined-but-unwired in the reference; kept for completeness.

Learnable-tau losses take their parameter as an explicit argument (pure
functional style) — init values match the reference's nn.Parameter defaults.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .heads import fixed_skew_block_matrix

Array = jnp.ndarray
LossOut = Tuple[Array, Array]


def _logsigmoid(x: Array) -> Array:
    return jax.nn.log_sigmoid(x)


def _sig(x: Array) -> Array:
    return jax.nn.sigmoid(x)


# ---------------------------------------------------------------- pairwise BT

def pairwise_loss(
    chosen_reward: Array, reject_reward: Array, margin: Optional[Array] = None,
    tau: float = 0.1,
) -> LossOut:
    """PairWiseLoss (loss.py:112-129): -log sigma((rc - rr [- m]) / tau)."""
    d = chosen_reward - reject_reward
    if margin is not None:
        d = d - margin
    return (-_logsigmoid(d / tau)).mean(), _sig(d / tau).mean()


def focal_pairwise_loss(
    chosen_reward: Array, reject_reward: Array, margin: Optional[Array] = None,
    gamma: float = 0.5, tau: float = 0.1,
) -> LossOut:
    """FocalPairWiseLoss (loss.py:167-184)."""
    d = chosen_reward - reject_reward
    if margin is not None:
        d = d - margin
    p = _sig(d / tau)
    return (-_logsigmoid(d / tau) * (1 - p) ** gamma).mean(), p.mean()


def pairwise_regression_loss(
    chosen_reward: Array, reject_reward: Array, margin: Optional[Array] = None,
    tau: float = 0.1, target_margin: float = 10.0,
) -> LossOut:
    """PairWiseRegressionLoss (loss.py:185-207)."""
    result = chosen_reward - reject_reward
    if margin is not None:
        loss = 0.5 * (result / tau - 5.0 * _sig(margin)) ** 2
        prob = _sig((result - margin) / tau)
    else:
        loss = 0.5 * (result / tau - target_margin) ** 2
        prob = _sig(result / tau)
    return loss.mean(), prob.mean()


def _real_tau_neg(tau_param: Array) -> Array:
    """max(-logsigmoid(-tau), 1e-2) (loss.py:215)."""
    return jnp.maximum(-_logsigmoid(-tau_param), 1e-2)


def pairwise_learnable_tau_loss(
    chosen_reward: Array, reject_reward: Array, tau_param: Array,
    margin: Optional[Array] = None,
) -> LossOut:
    """PairWiseLearnableTauLoss (loss.py:208-228); init tau_param = -2.25."""
    real_tau = _real_tau_neg(tau_param)
    d = chosen_reward - reject_reward
    if margin is not None:
        d = d - margin
    return (-_logsigmoid(d / real_tau)).mean(), _sig(d / real_tau).mean()


def pairwise_learnable_tau_regression_loss(
    chosen_reward: Array, reject_reward: Array, tau_param: Array,
    margin: Optional[Array] = None, target_margin: float = 10.0,
) -> LossOut:
    """PairWiseLearnableTauRegressionLoss (loss.py:229-250); init tau = 2.25.
    Note the reference uses -logsigmoid(+tau) here."""
    real_tau = jnp.maximum(-_logsigmoid(tau_param), 1e-2)
    d = chosen_reward - reject_reward
    if margin is not None:
        scaled = (d - margin) / real_tau
        loss = 0.5 * scaled ** 2
    else:
        scaled = d / real_tau
        loss = 0.5 * (scaled - target_margin) ** 2
    return loss.mean(), _sig(scaled).mean()


# ---------------------------------------------------------------- cls

def cls_loss(
    chosen_reward: Array, reject_reward: Array, margin: Optional[Array] = None
) -> LossOut:
    """Cls_loss (loss.py:131-149): BCE(chosen,1) + BCE(reject,0)."""
    del margin
    chosen_l = -_logsigmoid(chosen_reward)  # BCEWithLogits vs label 1
    reject_l = -_logsigmoid(-reject_reward)  # vs label 0
    loss = chosen_l.mean() + reject_l.mean()
    prob = _sig(chosen_reward - reject_reward)
    return loss, prob.mean()


def binary_cls_loss(rewards: Array, labels: Array) -> LossOut:
    """Binary_Cls_loss (loss.py:150-165): pointwise BCEWithLogits."""
    labels = labels.astype(rewards.dtype)
    loss = jnp.maximum(rewards, 0) - rewards * labels + jnp.log1p(jnp.exp(-jnp.abs(rewards)))
    return loss.mean(), _sig(rewards).mean()


# ---------------------------------------------------------------- GPM

def _gpm2_product(chosen_reward: Array, reject_reward: Array) -> Array:
    return (
        chosen_reward[:, 0] * reject_reward[:, 1]
        - chosen_reward[:, 1] * reject_reward[:, 0]
    )


def general_preference_loss(
    chosen_reward: Array, reject_reward: Array, margin: Optional[Array] = None,
    tau: float = 1.0,
) -> LossOut:
    """GeneralPreferenceLoss, dim-2 (loss.py:251-270)."""
    result = _gpm2_product(chosen_reward, reject_reward)
    if margin is not None:
        result = result - margin
    return (-_logsigmoid(result / tau)).mean(), _sig(result / tau).mean()


def general_preference_loss_no_r(
    chosen_reward: Array, reject_reward: Array, margin: Optional[Array] = None,
    tau: float = 1.0,
) -> LossOut:
    """GeneralPreferenceLoss_no_R (loss.py:272-291): plain inner product."""
    result = (
        chosen_reward[:, 0] * reject_reward[:, 0]
        + chosen_reward[:, 1] * reject_reward[:, 1]
    )
    if margin is not None:
        result = result - margin
    return (-_logsigmoid(result / tau)).mean(), _sig(result / tau).mean()


def general_preference_regression_loss(
    chosen_reward: Array, reject_reward: Array, margin: Optional[Array] = None,
    tau: float = 1.0, target_margin: float = 10.0,
) -> LossOut:
    """GeneralPreferenceRegressionLoss (loss.py:292-313)."""
    result = _gpm2_product(chosen_reward, reject_reward)
    if margin is not None:
        loss = 0.5 * (result / tau - 5.0 * _sig(margin)) ** 2
        prob = _sig((result - margin) / tau)
    else:
        loss = 0.5 * (result / tau - target_margin) ** 2
        prob = _sig(result / tau)
    return loss.mean(), prob.mean()


def general_preference_learnable_tau_loss(
    chosen_reward: Array, reject_reward: Array, tau_param: Array,
    margin: Optional[Array] = None,
) -> LossOut:
    """GeneralPreferenceLearnableTauLoss (loss.py:314-334); init -2.25."""
    real_tau = _real_tau_neg(tau_param)
    result = _gpm2_product(chosen_reward, reject_reward)
    if margin is not None:
        result = result - margin
    return (-_logsigmoid(result / real_tau)).mean(), _sig(result / real_tau).mean()


def general_preference_learnable_tau_regression_loss(
    chosen_reward: Array, reject_reward: Array, tau_param: Array,
    margin: Optional[Array] = None, target_margin: float = 10.0,
) -> LossOut:
    """GeneralPreferenceLearnableTauRegressionLoss (loss.py:335-356)."""
    real_tau = _real_tau_neg(tau_param)
    result = _gpm2_product(chosen_reward, reject_reward)
    if margin is not None:
        scaled = (result - margin) / real_tau
        loss = 0.5 * scaled ** 2
    else:
        scaled = result / real_tau
        loss = 0.5 * (scaled - target_margin) ** 2
    return loss.mean(), _sig(scaled).mean()


def _skew_bilinear(chosen_reward: Array, reject_reward: Array, R: Array) -> Array:
    """result_b = (c_b R^T) . r_b ; R either (d, d) or (B, d, d)."""
    if R.ndim == 2:
        transformed = chosen_reward @ R.T
    else:
        transformed = jnp.einsum("bd,bed->be", chosen_reward, R)
    return jnp.sum(transformed * reject_reward, axis=-1)


def high_dim_general_preference_loss(
    chosen_reward: Array, reject_reward: Array, margin: Optional[Array] = None,
    tau: float = 0.1, value_head_dim: int = 4,
) -> LossOut:
    """HighDimGeneralPreferenceLoss (loss.py:357-392): fixed skew-block R."""
    R = fixed_skew_block_matrix(value_head_dim, chosen_reward.dtype)
    result = _skew_bilinear(chosen_reward, reject_reward, R)
    if margin is not None:
        result = result - margin
    return (-_logsigmoid(result / tau)).mean(), _sig(result / tau).mean()


def high_dim_general_preference_regression_loss(
    chosen_reward: Array, reject_reward: Array, margin: Optional[Array] = None,
    tau: float = 0.1, target_margin: float = 10.0, value_head_dim: int = 4,
) -> LossOut:
    """HighDimGeneralPreferenceRegressionLoss (loss.py:393-428)."""
    R = fixed_skew_block_matrix(value_head_dim, chosen_reward.dtype)
    result = _skew_bilinear(chosen_reward, reject_reward, R)
    if margin is not None:
        loss = 0.5 * ((result - margin) / tau) ** 2
        prob = _sig((result - margin) / tau)
    else:
        loss = 0.5 * (result / tau - target_margin) ** 2
        prob = _sig(result / tau)
    return loss.mean(), prob.mean()


def high_dim_general_preference_learnable_tau_loss(
    chosen_reward: Array, reject_reward: Array, taus: Array,
    margin: Optional[Array] = None, scale: float = 1.0, value_head_dim: int = 4,
) -> LossOut:
    """HighDimGeneralPreferenceLearnableTauLoss (loss.py:429-474):
    per-pair learnable tau scales the skew blocks; init taus = full(2.25)."""
    tv = 1.0 / jnp.maximum(-_logsigmoid(taus), 1e-2)  # (d/2,)
    block = jnp.array([[0.0, -1.0], [1.0, 0.0]], dtype=chosen_reward.dtype)
    R = jnp.kron(jnp.diag(tv.astype(chosen_reward.dtype)), block)
    result = _skew_bilinear(chosen_reward, reject_reward, R)
    if margin is not None:
        result = result - margin
    return (-_logsigmoid(result / scale)).mean(), _sig(result / scale).mean()


def high_dim_general_preference_moe_loss(
    chosen_reward: Array, reject_reward: Array, R_matrices: Array,
    margin: Optional[Array] = None, softmax_tau: float = 1.0,
) -> LossOut:
    """HighDimGeneralPreferenceMoELoss (loss.py:475-504). The data-dependent
    R (B, d, d) comes from heads.prompt_skew_block_matrices; the reference
    computes c R^T r via bmm with R.transpose(1,2)."""
    result = _skew_bilinear(chosen_reward, reject_reward, R_matrices)
    if margin is not None:
        result = result - margin
    return (
        (-_logsigmoid(result / softmax_tau)).mean(),
        _sig(result / softmax_tau).mean(),
    )


def high_dim_general_preference_regression_moe_loss(
    chosen_reward: Array, reject_reward: Array, R_matrices: Array,
    margin: Optional[Array] = None, target_margin: float = 10.0,
    softmax_tau: float = 1.0,
) -> LossOut:
    """HighDimGeneralPreferenceRegressionMoELoss (loss.py:505-535)."""
    result = _skew_bilinear(chosen_reward, reject_reward, R_matrices)
    if margin is not None:
        loss = 0.5 * ((result - margin) / softmax_tau) ** 2
        prob = _sig((result - margin) / softmax_tau)
    else:
        loss = 0.5 * (result / softmax_tau - target_margin) ** 2
        prob = _sig(result / softmax_tau)
    return loss.mean(), prob.mean()


# ---------------------------------------------------------------- LM / SFT

def _token_logprobs(logits: Array, labels: Array) -> Array:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]


def sft_vanilla_loss(logits: Array, labels: Array, mask: Array) -> Array:
    """SFTVanillaLoss (loss.py:5-25): mean per-token NLL over valid tokens."""
    lp = _token_logprobs(logits[:, :-1, :], labels[:, 1:])
    m = mask[:, 1:].astype(lp.dtype)
    valid = jnp.sum(lp * m, axis=1) / jnp.sum(m, axis=1)
    return -valid.mean()


def sft_mean_loss(logits: Array, labels: Array, mask: Array, beta: float = 2.0) -> Array:
    """SFTMeanLoss (loss.py:26-47)."""
    lp = _token_logprobs(logits[:, :-1, :], labels[:, 1:])
    m = mask[:, 1:].astype(lp.dtype)
    valid = jnp.sum(lp * m, axis=1) / jnp.sum(m, axis=1)
    return -_logsigmoid(beta * valid).mean()


def sft_sum_loss(logits: Array, labels: Array, mask: Array, beta: float = 0.1) -> Array:
    """SFTSumLoss (loss.py:48-67) — the wired ptx regulariser."""
    lp = _token_logprobs(logits[:, :-1, :], labels[:, 1:])
    m = mask[:, 1:].astype(lp.dtype)
    valid = jnp.sum(lp * m, axis=1)
    return -_logsigmoid(beta * valid).mean()


def dpo_ref_free_loss(
    chosen_logits: Array, chosen_labels: Array, chosen_mask: Array,
    rejected_logits: Array, rejected_labels: Array, rejected_mask: Array,
    beta: float = 2.0, margin: float = 1.0,
) -> Array:
    """DPORefFreeLoss (loss.py:68-101)."""
    clp = _token_logprobs(chosen_logits[:, :-1, :], chosen_labels[:, 1:])
    rlp = _token_logprobs(rejected_logits[:, :-1, :], rejected_labels[:, 1:])
    cm = chosen_mask[:, 1:].astype(clp.dtype)
    rm = rejected_mask[:, 1:].astype(rlp.dtype)
    cv = jnp.sum(clp * cm, axis=1) / jnp.sum(cm, axis=1)
    rv = jnp.sum(rlp * rm, axis=1) / jnp.sum(rm, axis=1)
    return -_logsigmoid(beta * (cv - rv) - margin).mean()


def gpt_lm_loss(logits: Array, labels: Array, ignore_index: int = -100) -> Array:
    """GPTLMLoss (loss.py:102-111): shifted CE with ignore_index."""
    shift_logits = logits[:, :-1, :]
    shift_labels = labels[:, 1:]
    valid = shift_labels != ignore_index
    safe = jnp.where(valid, shift_labels, 0)
    lp = _token_logprobs(shift_logits, safe)
    n = jnp.maximum(jnp.sum(valid), 1)
    return -jnp.sum(jnp.where(valid, lp, 0.0)) / n
