"""Loss zoo vs direct torch implementations of the reference formulas."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from llava_reward_tpu.reward import losses
from llava_reward_tpu.reward.heads import (
    fixed_skew_block_matrix,
    prompt_skew_block_matrices,
)


def _np(x):
    return np.asarray(x)


def test_pairwise_loss(rng):
    c = rng.standard_normal(8).astype(np.float32)
    r = rng.standard_normal(8).astype(np.float32)
    tau = 0.1
    loss, prob = losses.pairwise_loss(jnp.asarray(c), jnp.asarray(r), tau=tau)
    tc, tr = torch.from_numpy(c), torch.from_numpy(r)
    ref_l = (-F.logsigmoid((tc - tr) / tau)).mean()
    ref_p = torch.sigmoid((tc - tr) / tau).mean()
    np.testing.assert_allclose(_np(loss), ref_l.numpy(), rtol=1e-5)
    np.testing.assert_allclose(_np(prob), ref_p.numpy(), rtol=1e-5)


def test_pairwise_loss_margin(rng):
    c = rng.standard_normal(8).astype(np.float32)
    r = rng.standard_normal(8).astype(np.float32)
    m = rng.standard_normal(8).astype(np.float32)
    loss, _ = losses.pairwise_loss(
        jnp.asarray(c), jnp.asarray(r), margin=jnp.asarray(m), tau=0.1
    )
    ref = (-F.logsigmoid((torch.from_numpy(c) - torch.from_numpy(r) - torch.from_numpy(m)) / 0.1)).mean()
    np.testing.assert_allclose(_np(loss), ref.numpy(), rtol=1e-5)


def test_cls_loss(rng):
    c = rng.standard_normal((6, 1)).astype(np.float32)
    r = rng.standard_normal((6, 1)).astype(np.float32)
    loss, prob = losses.cls_loss(jnp.asarray(c), jnp.asarray(r))
    bce = torch.nn.BCEWithLogitsLoss()
    tc, tr = torch.from_numpy(c), torch.from_numpy(r)
    ref = bce(tc, torch.ones_like(tc)) + bce(tr, torch.zeros_like(tr))
    np.testing.assert_allclose(_np(loss), ref.numpy(), rtol=1e-5)


def test_binary_cls_loss(rng):
    x = rng.standard_normal(10).astype(np.float32)
    y = rng.integers(0, 2, 10).astype(np.float32)
    loss, _ = losses.binary_cls_loss(jnp.asarray(x), jnp.asarray(y))
    ref = torch.nn.BCEWithLogitsLoss()(torch.from_numpy(x), torch.from_numpy(y))
    np.testing.assert_allclose(_np(loss), ref.numpy(), rtol=1e-5)


def test_general_preference_loss(rng):
    c = rng.standard_normal((5, 2)).astype(np.float32)
    r = rng.standard_normal((5, 2)).astype(np.float32)
    tau = 0.1
    loss, prob = losses.general_preference_loss(jnp.asarray(c), jnp.asarray(r), tau=tau)
    tc, tr = torch.from_numpy(c), torch.from_numpy(r)
    result = tc[:, 0] * tr[:, 1] - tc[:, 1] * tr[:, 0]
    np.testing.assert_allclose(
        _np(loss), (-F.logsigmoid(result / tau)).mean().numpy(), rtol=1e-5
    )


def test_high_dim_gpm_loss_matches_bmm(rng):
    d = 6
    c = rng.standard_normal((4, d)).astype(np.float32)
    r = rng.standard_normal((4, d)).astype(np.float32)
    tau = 0.1
    loss, _ = losses.high_dim_general_preference_loss(
        jnp.asarray(c), jnp.asarray(r), tau=tau, value_head_dim=d
    )
    # torch reference (loss.py:364-392)
    R = torch.zeros(d, d)
    for i in range(0, d, 2):
        R[i, i + 1] = -1
        R[i + 1, i] = 1
    tc, tr = torch.from_numpy(c), torch.from_numpy(r)
    transformed = tc @ R.T
    result = torch.bmm(transformed.view(4, 1, d), tr.view(4, d, 1)).view(4)
    ref = (-F.logsigmoid(result / tau)).mean()
    np.testing.assert_allclose(_np(loss), ref.numpy(), rtol=1e-5)


def test_fixed_skew_matrix():
    R = _np(fixed_skew_block_matrix(4))
    expected = np.zeros((4, 4), np.float32)
    expected[0, 1] = -1; expected[1, 0] = 1
    expected[2, 3] = -1; expected[3, 2] = 1
    np.testing.assert_array_equal(R, expected)


def test_prompt_skew_matrices(rng):
    d, H = 4, 16
    hidden = rng.standard_normal((3, H)).astype(np.float32)
    kernel = rng.standard_normal((H, d // 2)).astype(np.float32)
    R = _np(
        prompt_skew_block_matrices({"kernel": jnp.asarray(kernel)}, jnp.asarray(hidden), d)
    )
    # torch reference (rw_model_general_preference.py:450-482)
    v = torch.softmax(torch.from_numpy(hidden) @ torch.from_numpy(kernel), dim=-1)
    ref = torch.zeros(3, d, d)
    for i in range(0, d, 2):
        ref[:, i, i + 1] = -v[:, i // 2]
        ref[:, i + 1, i] = v[:, i // 2]
    np.testing.assert_allclose(R, ref.numpy(), rtol=1e-5, atol=1e-6)
    # skew-symmetry
    np.testing.assert_allclose(R, -R.transpose(0, 2, 1), atol=1e-6)


def test_moe_loss(rng):
    d = 4
    c = rng.standard_normal((3, d)).astype(np.float32)
    r = rng.standard_normal((3, d)).astype(np.float32)
    R = rng.standard_normal((3, d, d)).astype(np.float32)
    loss, _ = losses.high_dim_general_preference_moe_loss(
        jnp.asarray(c), jnp.asarray(r), jnp.asarray(R), softmax_tau=1.0
    )
    tc, tr, tR = map(torch.from_numpy, (c, r, R))
    transformed = torch.bmm(tc.view(3, 1, d), tR.transpose(1, 2))
    result = torch.bmm(transformed, tr.view(3, d, 1)).view(3)
    ref = (-F.logsigmoid(result)).mean()
    np.testing.assert_allclose(_np(loss), ref.numpy(), rtol=1e-5)


def test_sft_losses(rng):
    B, S, V = 2, 7, 11
    logits = rng.standard_normal((B, S, V)).astype(np.float32)
    labels = rng.integers(0, V, (B, S)).astype(np.int32)
    mask = np.ones((B, S), np.int32)
    mask[0, :2] = 0

    tl, tlab = torch.from_numpy(logits), torch.from_numpy(labels.astype(np.int64))
    tm = torch.from_numpy(mask).bool()

    lp = torch.log_softmax(tl[:, :-1], dim=-1)
    chosen = torch.gather(lp, 2, tlab[:, 1:].unsqueeze(-1)).squeeze(-1)
    chosen = chosen * tm[:, 1:]
    v_mean = chosen.sum(1) / tm[:, 1:].sum(1)
    v_sum = chosen.sum(1)

    np.testing.assert_allclose(
        _np(losses.sft_vanilla_loss(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask))),
        (-v_mean.mean()).numpy(), rtol=1e-5,
    )
    np.testing.assert_allclose(
        _np(losses.sft_sum_loss(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask), beta=0.1)),
        (-F.logsigmoid(0.1 * v_sum).mean()).numpy(), rtol=1e-5,
    )
    np.testing.assert_allclose(
        _np(losses.sft_mean_loss(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask), beta=2.0)),
        (-F.logsigmoid(2.0 * v_mean).mean()).numpy(), rtol=1e-5,
    )


def test_gpt_lm_loss(rng):
    B, S, V = 2, 6, 9
    logits = rng.standard_normal((B, S, V)).astype(np.float32)
    labels = rng.integers(0, V, (B, S)).astype(np.int32)
    labels[0, 1] = -100
    ours = losses.gpt_lm_loss(jnp.asarray(logits), jnp.asarray(labels))
    ref = torch.nn.CrossEntropyLoss(ignore_index=-100)(
        torch.from_numpy(logits[:, :-1]).reshape(-1, V),
        torch.from_numpy(labels.astype(np.int64)[:, 1:]).reshape(-1),
    )
    np.testing.assert_allclose(_np(ours), ref.numpy(), rtol=1e-5)


def test_learnable_tau_losses(rng):
    c = rng.standard_normal(5).astype(np.float32)
    r = rng.standard_normal(5).astype(np.float32)
    tau_p = np.float32(-2.25)
    loss, _ = losses.pairwise_learnable_tau_loss(
        jnp.asarray(c), jnp.asarray(r), jnp.asarray(tau_p)
    )
    real_tau = max(-F.logsigmoid(-torch.tensor(tau_p)).item(), 1e-2)
    ref = (-F.logsigmoid((torch.from_numpy(c) - torch.from_numpy(r)) / real_tau)).mean()
    np.testing.assert_allclose(_np(loss), ref.numpy(), rtol=1e-5)


def test_preference_prob():
    from llava_reward_tpu.reward.preference import preference_prob

    c = np.array([[1.0, 2.0]], np.float32)
    r = np.array([[0.5, -1.0]], np.float32)
    p = preference_prob(
        jnp.asarray(c), jnp.asarray(r),
        is_general_preference=True, value_head_dim=2, tau=0.1,
    )
    expected = 1 / (1 + np.exp(-((1.0 * -1.0 - 2.0 * 0.5) / 0.1)))
    np.testing.assert_allclose(_np(p), [expected], rtol=1e-5)
    # BT
    p2 = preference_prob(
        jnp.asarray(c[:, :1]), jnp.asarray(r[:, :1]),
        is_general_preference=False, value_head_dim=1, tau=0.1,
    )
    np.testing.assert_allclose(_np(p2), [1 / (1 + np.exp(-5.0))], rtol=1e-5)
