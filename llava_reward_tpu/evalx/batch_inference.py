"""Batch reward-scoring harness — the TPU equivalent of
eval/batch_inference_rm_{phi,ft_phi,phi_user_input}.py.

Differences by design: pairwise/pointwise format is sniffed from the rows
(the reference checks tuple arity, batch_inference_rm_phi.py:45-48); chosen
and rejected are scored in ONE stacked jit call per batch; batches stream
through the prefetch loader with host->HBM overlap; per-batch forward
latency is tracked like the reference's timing hook (:92-102), plus an
optional jax.profiler trace.
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Sequence

import numpy as np

from ..data.datasets import (
    PairwiseRewardDataset,
    PointwiseRewardDataset,
    is_pairwise,
)
from ..data.loader import PrefetchLoader
from ..data.sampler import DistributedSampler
from ..preprocess.collate import to_reward_batch
from ..reward.preference import preference_prob
from .metrics import pairwise_metrics, pointwise_metrics


def batch_rm_inference(
    adaptor,
    rows: Sequence[dict],
    tokenizer,
    processor,
    *,
    batch_size: int = 8,
    seq_len: int = 2944,
    max_samples: Optional[int] = None,
    num_workers: int = 8,
    image_root: Optional[str] = None,
    attn_impl: str = "auto",
    profile_dir: Optional[str] = None,
    progress: bool = True,
    cls_based: bool = False,
) -> Dict[str, float]:
    import jax
    import jax.numpy as jnp

    from ..core.registry import get_family

    rows = list(rows)[: max_samples or None]
    family = get_family(adaptor.model_type)
    pad_id = family.decoder_cfg(adaptor.cfg).pad_token_id
    # format is sniffed from the rows; --cls_based forces the pointwise
    # classification path (the reference's flag, batch_inference_rm_phi.py:45-48)
    pairwise = is_pairwise(rows) and not cls_based

    ds_cls = family.pairwise_dataset if pairwise else family.pointwise_dataset
    ds = ds_cls(rows, processor, tokenizer, image_root)

    sampler = DistributedSampler(len(ds), shuffle=False)

    def _device_put(batch):
        # move pixel tensors to HBM from the prefetch thread so transfer
        # overlaps the previous batch's compute
        if pairwise:
            chosen, rejected, c_rate, r_rate = batch
            return (
                jax.device_put(dict(chosen)),
                jax.device_put(dict(rejected)),
                c_rate,
                r_rate,
            )
        b, y = batch
        return jax.device_put(dict(b)), y

    loader = PrefetchLoader(
        ds,
        sampler,
        batch_size,
        collate_fn=lambda items: ds.collate(items, seq_len, pad_id),
        num_workers=num_workers,
        device_put=_device_put,
        drop_last=False,
    )

    score = adaptor.make_score_fn(attn_impl=attn_impl, training=False)
    params = adaptor.params

    probs, rewards, labels = [], [], []
    fwd_times = []
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    try:
        for batch in loader:
            t0 = time.perf_counter()
            if pairwise:
                chosen, rejected, c_rate, r_rate = batch
                cb, rb = to_reward_batch(chosen), to_reward_batch(rejected)
                fields = {}
                for name, a, b in zip(type(cb)._fields, cb, rb):
                    if a is None:
                        fields[name] = None
                    elif name == "position_ids":  # (3, B, S): batch axis 1
                        fields[name] = jnp.concatenate([a, b], axis=1)
                    else:
                        if (
                            name == "pixel_values"
                            and a.ndim == 5
                            and a.shape[1] != b.shape[1]
                        ):
                            # chosen/rejected fell into different crop
                            # buckets; zero-pad the smaller (the bank's
                            # leading sentinel rows keep indices valid)
                            nc = max(a.shape[1], b.shape[1])
                            pad = lambda x: jnp.pad(
                                x, [(0, 0), (0, nc - x.shape[1])] + [(0, 0)] * 3
                            )
                            a, b = pad(a), pad(b)
                        fields[name] = jnp.concatenate([a, b], axis=0)
                stacked = type(cb)(**fields)
                r = np.asarray(score(params, stacked))
                n = len(c_rate)
                p = preference_prob(
                    jnp.asarray(r[:n]),
                    jnp.asarray(r[n:]),
                    is_general_preference=adaptor.rcfg.is_general_preference,
                    value_head_dim=adaptor.rcfg.value_head_dim,
                    tau=adaptor.rcfg.general_preference_tau,
                )
                probs.extend(np.asarray(p).tolist())
            else:
                b, y = batch
                r = np.asarray(score(params, to_reward_batch(b)))[:, 0]
                rewards.extend(r.tolist())
                labels.extend(np.asarray(y).astype(int).tolist())
            fwd_times.append(time.perf_counter() - t0)
            if progress:
                done = len(probs) or len(rewards)
                print(f"\rscored {done}/{len(ds)}", end="", flush=True)
    finally:
        if profile_dir:
            jax.profiler.stop_trace()
    if progress:
        print()

    if pairwise:
        metrics = pairwise_metrics(probs)
    else:
        metrics = pointwise_metrics(rewards, labels)
    if fwd_times:
        metrics["mean_forward_s"] = float(np.mean(fwd_times[1:] or fwd_times))
    return metrics


def score_user_input(
    adaptor,
    tokenizer,
    processor,
    caption: str,
    image_paths: Sequence[str],
    *,
    seq_len: int = 2944,
    attn_impl: str = "auto",
) -> np.ndarray:
    """The _user_input harness (batch_inference_rm_phi_user_input.py:38-170):
    score one caption against N images; returns (N, value_head_dim)."""
    from PIL import Image

    from ..preprocess.collate import collate_samples
    from ..preprocess.phi3v_processor import apply_phi3v_chat_template

    text = apply_phi3v_chat_template(tokenizer, caption)
    samples = [
        processor(text, [Image.open(p).convert("RGB")]) for p in image_paths
    ]
    batch = to_reward_batch(
        collate_samples(samples, seq_len, adaptor.cfg.decoder.pad_token_id)
    )
    score = adaptor.make_score_fn(attn_impl=attn_impl, training=False)
    return np.asarray(score(adaptor.params, batch))
