"""Eval metrics matching the batch harnesses
(eval/batch_inference_rm_phi.py:103-152)."""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np


def pairwise_metrics(probs: Sequence[float]) -> Dict[str, float]:
    """'final proportion' = fraction of pairs with P(chosen>rejected) > 0.5,
    plus the tie-excluded variant and mean probability (:112-121)."""
    p = np.asarray(probs, np.float64)
    n = len(p)
    correct = float((p > 0.5).sum())
    ties = float((p == 0.5).sum())
    return {
        "accuracy": correct / n if n else 0.0,
        "accuracy_wo_tie": correct / (n - ties) if n - ties else 0.0,
        "mean_prob": float(p.mean()) if n else 0.0,
        "num_pairs": float(n),
    }


def pointwise_metrics(rewards: Sequence[float], labels: Sequence[int]) -> Dict[str, float]:
    """sigmoid(reward) > 0.5 -> accuracy / binary F1 / recall (:146-152)."""
    r = np.asarray(rewards, np.float64)
    y = np.asarray(labels, np.int64)
    pred = (1.0 / (1.0 + np.exp(-r)) > 0.5).astype(np.int64)
    tp = float(((pred == 1) & (y == 1)).sum())
    fp = float(((pred == 1) & (y == 0)).sum())
    fn = float(((pred == 0) & (y == 1)).sum())
    acc = float((pred == y).mean()) if len(y) else 0.0
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"accuracy": acc, "f1": f1, "recall": recall, "num_samples": float(len(y))}
