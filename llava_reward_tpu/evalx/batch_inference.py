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

import os
import sys
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


def _merge_resize_tabs(a: dict, b: dict) -> dict:
    """Stack chosen/rejected device-resize tap tables along the batch axis,
    reconciling bucket-dependent shapes: tap-count (last axis of hw/vw) pads
    with zero-weight taps; crop-bucket (nc axis) pads with white rows and
    identity slot_perm — both inert by construction."""
    import jax.numpy as jnp

    from ..ops.pixels import _HALF, PRECISION_BITS

    white_bias = _HALF + (255 << PRECISION_BITS)
    nc = max(a["vidx"].shape[1], b["vidx"].shape[1])
    k_h = max(a["hw"].shape[-1], b["hw"].shape[-1])
    k_v = max(a["vw"].shape[-1], b["vw"].shape[-1])

    def fix(t):
        t = dict(t)
        t["hw"] = jnp.pad(t["hw"], [(0, 0), (0, 0), (0, k_h - t["hw"].shape[-1])])
        dn = nc - t["vidx"].shape[1]
        t["vw"] = jnp.pad(
            t["vw"],
            [(0, 0), (0, dn), (0, 0), (0, k_v - t["vw"].shape[-1])],
        )
        t["vidx"] = jnp.pad(t["vidx"], [(0, 0), (0, dn), (0, 0)])
        # pad slots render WHITE (zero taps + white bias), matching the
        # build_hd_resize_tables invariant for every other u8src table
        t["vbias"] = jnp.pad(
            t["vbias"], [(0, 0), (0, dn), (0, 0)], constant_values=white_bias
        )
        t["col_start"] = jnp.pad(t["col_start"], [(0, 0), (0, dn)])
        if dn:
            B = t["slot_perm"].shape[0]
            extra = jnp.broadcast_to(
                jnp.arange(nc - dn, nc, dtype=t["slot_perm"].dtype)[None], (B, dn)
            )
            t["slot_perm"] = jnp.concatenate([t["slot_perm"], extra], axis=1)
        return t

    a, b = fix(a), fix(b)
    return {k: jnp.concatenate([a[k], b[k]], axis=0) for k in a}


def _pixel_kind(rb) -> tuple:
    pv = rb.pixel_values
    if pv is None:
        return ("none",)
    if rb.resize_tabs is not None:
        return ("u8src",)
    if pv.dtype == np.uint8 or str(pv.dtype) == "uint8":
        return ("u8",)
    return ("f32",)


_JIT_CACHE: dict = {}


def _bank_from_src(pv, t, crop_grid):
    import jax.numpy as jnp

    from ..ops.pixels import hd_resize_u8_bank, prepare_pixel_bank

    pv = hd_resize_u8_bank(
        pv, t["hidx"], t["hw"], t["vidx"], t["vw"], t["vbias"],
        t["col_start"], t["slot_perm"], t["tflag"],
    )
    return prepare_pixel_bank(pv, crop_grid, dtype=jnp.float32)


def _bank_from_u8(pv, crop_grid):
    import jax.numpy as jnp

    from ..ops.pixels import prepare_pixel_bank

    return prepare_pixel_bank(pv, crop_grid, dtype=jnp.float32)


def _jit_once(name, fn):
    import jax

    if name not in _JIT_CACHE:
        _JIT_CACHE[name] = jax.jit(fn)
    return _JIT_CACHE[name]


def _materialize_f32(rb):
    """Collapse a device-preproc batch (u8 crops or u8 source + tap tables)
    to the f32 [global, crops...] bank layout ON DEVICE, so a chosen/
    rejected pair whose sides fell into different preprocessing modes (one
    hit the extreme-aspect host fallback) can still stack into one forward.
    Runs as ONE jitted dispatch — the tunnelled axon backend pays ~30 ms RTT
    per eager op, which would dominate these fallback batches."""
    import jax.numpy as jnp

    pv = jnp.asarray(rb.pixel_values)
    if rb.resize_tabs is not None:
        t = {k: jnp.asarray(v) for k, v in rb.resize_tabs.items()}
        bank = _jit_once("bank_from_src", _bank_from_src)(
            pv, t, jnp.asarray(rb.crop_grid)
        )
    else:
        bank = _jit_once("bank_from_u8", _bank_from_u8)(
            pv, jnp.asarray(rb.crop_grid)
        )
    return rb._replace(pixel_values=bank, resize_tabs=None, crop_grid=None)


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
    trace = os.environ.get("LRT_LOADER_TRACE") == "1"
    t_end = time.perf_counter()
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    try:
        for batch in loader:
            t0 = time.perf_counter()
            if trace:
                print(f"[infer] queue-wait {t0 - t_end:.3f}s",
                      file=sys.stderr, flush=True)
            if pairwise:
                chosen, rejected, c_rate, r_rate = batch
                cb, rb = to_reward_batch(chosen), to_reward_batch(rejected)
                if (
                    _pixel_kind(cb) != _pixel_kind(rb)
                    and "none" not in (_pixel_kind(cb)[0], _pixel_kind(rb)[0])
                ):
                    # sides fell into different preproc modes: unify on f32
                    cb = _materialize_f32(cb) if _pixel_kind(cb)[0] != "f32" else cb
                    rb = _materialize_f32(rb) if _pixel_kind(rb)[0] != "f32" else rb
                fields = {}
                for name, a, b in zip(type(cb)._fields, cb, rb):
                    if a is None:
                        fields[name] = None
                    elif name == "position_ids":  # (3, B, S): batch axis 1
                        fields[name] = jnp.concatenate([a, b], axis=1)
                    elif name == "resize_tabs":
                        fields[name] = _merge_resize_tabs(a, b)
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
                        if (
                            name == "pixel_values"
                            and a.ndim == 4
                            and a.shape[1:3] != b.shape[1:3]
                        ):
                            # device-resize sources in different size
                            # buckets: zero-pad spatially (tap weights are
                            # zero beyond each sample's true extent)
                            hs = max(a.shape[1], b.shape[1])
                            ws = max(a.shape[2], b.shape[2])
                            pad4 = lambda x: jnp.pad(
                                x,
                                [(0, 0), (0, hs - x.shape[1]),
                                 (0, ws - x.shape[2]), (0, 0)],
                            )
                            a, b = pad4(a), pad4(b)
                        fields[name] = jnp.concatenate([a, b], axis=0)
                stacked = type(cb)(**fields)
                # one jitted dispatch for the split + sigmoid: rewards stay
                # on device (re-uploading r and running preference_prob
                # eagerly costs several ~30 ms RTTs per batch on the tunnel)
                def _pref(r):
                    n = r.shape[0] // 2
                    return preference_prob(
                        r[:n], r[n:],
                        is_general_preference=adaptor.rcfg.is_general_preference,
                        value_head_dim=adaptor.rcfg.value_head_dim,
                        tau=adaptor.rcfg.general_preference_tau,
                    )

                t_stack = time.perf_counter()
                p = _jit_once(
                    ("pref", adaptor.rcfg.is_general_preference,
                     adaptor.rcfg.value_head_dim,
                     adaptor.rcfg.general_preference_tau),
                    _pref,
                )(score(params, stacked))
                t_disp = time.perf_counter()
                probs.extend(np.asarray(p).tolist())
                if trace:
                    print(
                        f"[infer] stack {t_stack - t0:.3f}s dispatch "
                        f"{t_disp - t_stack:.3f}s fetch-barrier "
                        f"{time.perf_counter() - t_disp:.3f}s",
                        file=sys.stderr, flush=True,
                    )
            else:
                b, y = batch
                r = np.asarray(score(params, to_reward_batch(b)))[:, 0]
                rewards.extend(r.tolist())
                labels.extend(np.asarray(y).astype(int).tolist())
            t_end = time.perf_counter()
            fwd_times.append(t_end - t0)
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
