"""Pallas TPU flash attention (forward), replacing flash-attn 2
(modeling_phi3_v.py:723-1032, CLIPAttentionFA2 :85-115).

Design for this workload (reward scoring, seq <= ~3k):
- grid (batch, kv_head, q_blocks); each program loads one q block and the
  FULL K/V rows for its (batch, kv-head) into VMEM (2.5k x 128 bf16 =
  0.65 MB each) and computes scores for all GQA query heads of that kv head
  in one (n_rep*Bq, S) MXU matmul — no online-softmax bookkeeping, a single
  fp32 softmax over the whole row, everything stays in VMEM (~5 MB total);
- masking is done in-kernel instead of the reference's unpad/pad dance
  (bert_padding): causal via position iota, LEFT padding via a per-batch
  ``kv_start`` scalar (valid keys are a contiguous suffix after the
  collator's left padding), sliding window via q_pos - window; arbitrary
  key-valid patterns (qwen vision windows) via an optional full (B, S)
  mask row in VMEM (``mask_layout="arbitrary"``);
- head_dim is zero-padded to a lane multiple (96 -> 128 for Phi-3) in the
  wrapper: zero K columns contribute 0 to scores and zero V columns produce
  sliced-off zeros, so results are exact;
- backward: fused Pallas kernel (recompute-in-kernel, fp32 dk/dv VMEM
  accumulators over the sequential q-block steps) — see _fa_bwd_kernel;
  LRT_XLA_ATTN_BWD=1 restores the head-chunked XLA recompute;
- sub-block software pipelining (scores(i+1) on the MXU under softmax(i) on
  the VPU) inside every kernel; direct-from-qkv variants read the fused
  projection output via column BlockSpecs and write (B, S, H*D) directly;
- under a registered mesh (core.mesh.set_active_mesh) every entry wraps
  itself in shard_map over the batch axes, since XLA cannot partition a
  custom call (plain pjit all-gathers the operands).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import attention_reference

NEG_INF = -1e30


def _fa_kernel(
    kv_start_ref,  # SMEM (B,) first valid key index per batch row
    q_ref,  # (n_rep, Bq, D)
    k_ref,  # (S, D)
    v_ref,  # (S, D)
    *rest,  # [mask_ref (1, S) if has_mask,] o_ref (n_rep, Bq, D)
    scale: float,
    causal: bool,
    sliding_window: Optional[int],
    q_len: int,
    block_q: int,
    has_mask: bool = False,
    segments: bool = False,  # mask row holds SEGMENT ids (0 = pad)
    q_offset: int = 0,  # static q-position offset (causal block-skip calls)
):
    if segments:
        mask_ref, qseg_ref, o_ref = rest
    elif has_mask:
        mask_ref, o_ref = rest
    else:
        (o_ref,) = rest
    b = pl.program_id(0)
    qi = pl.program_id(2)

    n_rep, Bq, D = q_ref.shape
    k = k_ref[...]  # (S, D)
    v = v_ref[...]
    start = kv_start_ref[b]

    # sub-block SOFTWARE PIPELINE: split the q block into row groups and
    # interleave scores(i+1) [MXU] with softmax(i) [VPU] + PV(i) [MXU] —
    # Mosaic's scheduler overlaps the units (measured 12 -> 6.6 ms/layer
    # at B8/S2560/H32/D96 full-row; composes with causal block-skip).
    n_sub = 1
    for cand in (4, 2):
        if Bq % (cand * 8) == 0 and Bq // cand >= 64:
            n_sub = cand
            break
    rsz = Bq // n_sub

    def scores_of(i):
        # collapse GQA reps into rows AFTER the sub slice: rows are
        # rep-major (n_rep, rsz) -> (n_rep*rsz, D); leading-dim collapse is
        # free in Mosaic.
        qs = q_ref[:, i * rsz : (i + 1) * rsz, :].reshape(n_rep * rsz, D)
        s = jax.lax.dot_general(
            qs, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (n_rep*rsz, S)
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        q_pos = q_offset + qi * block_q + i * rsz + (row % rsz)
        k_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        mask = k_pos < q_len  # right-pad tail from block rounding
        mask &= k_pos >= start
        if segments:
            # segment-ids masking (per-frame full attention in the qwen
            # vision tower): key seg must be nonzero AND equal to the
            # query's seg; the q block's seg values ride in as a second
            # (1, block_q) view of the same (B, S) array
            k_seg = mask_ref[0, :][None, :]
            q_seg = qseg_ref[0, i * rsz : (i + 1) * rsz]  # (rsz,)
            q_seg_rows = jnp.tile(q_seg, (n_rep,))[:, None]
            mask &= (k_seg != 0) & (k_seg == q_seg_rows)
        elif has_mask:
            # arbitrary key-valid mask (e.g. right-padded batch budgets);
            # carried as (B, 1, S) so the block's last two dims satisfy
            # Mosaic's tile rule
            mask &= mask_ref[0, :][None, :] != 0
        if causal:
            mask &= k_pos <= q_pos
            if sliding_window is not None:
                mask &= k_pos > q_pos - sliding_window
        return jnp.where(mask, s, NEG_INF)

    def write_out(i, s):
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        probs = (e / denom).astype(k.dtype)
        o = jax.lax.dot_general(
            probs, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, i * rsz : (i + 1) * rsz, :] = o.astype(o_ref.dtype).reshape(
            n_rep, rsz, D
        )

    s_prev = scores_of(0)
    for i in range(1, n_sub + 1):
        s_cur = scores_of(i) if i < n_sub else None
        write_out(i - 1, s_prev)
        s_prev = s_cur


def _round_up(x, m):
    return (x + m - 1) // m * m


def _pick_block_q(S: int, D_pad: int, n_rep: int, itemsize: int) -> int:
    """Fit the VMEM budget (~16MB/core): K + V resident (2 * S * D_pad *
    itemsize, double-buffered by the pipeline) + fp32 score tile
    (n_rep * block_q * S * 4) + q/out tiles. Solve for block_q, clamp
    to [64, 512] in VPU-friendly multiples. 512 measured ~4% faster than
    256/384 on v5e at S=2560."""
    S_est = _round_up(S, 64)
    kv_bytes = 2 * 2 * S_est * D_pad * itemsize  # K+V, 2 buffers
    budget = 14 * 1024 * 1024
    avail = max(budget - kv_bytes, 2 * 1024 * 1024)
    # fp32 scores tile ~1.5x for fused exp temporaries
    block_q = int(avail // int(4 * S_est * 1.5 * n_rep))
    return max(64, min(512, (block_q // 64) * 64))


def _flash_fwd_hm_call(
    qt: jnp.ndarray,  # (B, H, S_pad, D_pad) head-major (FULL tensor)
    kt: jnp.ndarray,  # (B, Hk, S_pad, D_pad)
    vt: jnp.ndarray,
    kv_start: jnp.ndarray,  # (B,) int32
    key_mask: Optional[jnp.ndarray],  # (B, S_pad) int32 1=valid, or None
    causal: bool,
    sliding_window: Optional[int],
    scale: float,
    q_len: int,
    block_q: int,
    q_block0: int,  # first q block this call covers
    n_q_blocks: int,  # number of q blocks this call covers
    k_ext: int,  # static key extent (rows of K/V read), multiple of block_q
    segments: bool = False,
) -> jnp.ndarray:
    """One pallas_call covering q blocks [q_block0, q_block0+n_q_blocks) and
    keys [0, k_ext). Slicing rides in the BlockSpecs (no HBM copies).
    Returns (B, H, n_q_blocks*block_q, D_pad)."""
    B, H, S_pad, D_pad = qt.shape
    Hk = kt.shape[1]
    n_rep = H // Hk
    grid = (B, Hk, n_q_blocks)

    kernel = functools.partial(
        _fa_kernel,
        scale=scale,
        causal=causal,
        sliding_window=sliding_window,
        q_len=q_len,
        block_q=block_q,
        has_mask=key_mask is not None,
        segments=segments,
        q_offset=q_block0 * block_q,
    )

    in_specs = [
        pl.BlockSpec(
            (None, n_rep, block_q, D_pad),
            lambda b, h, qi, *prefetch: (b, h, q_block0 + qi, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (None, None, k_ext, D_pad),
            lambda b, h, qi, *prefetch: (b, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (None, None, k_ext, D_pad),
            lambda b, h, qi, *prefetch: (b, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    operands = [qt, kt, vt]
    if key_mask is not None:
        mask3 = key_mask.astype(jnp.int32)[:, None, :]
        in_specs.append(
            pl.BlockSpec(
                (None, 1, k_ext),
                lambda b, h, qi, *prefetch: (b, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(mask3)
        if segments:  # q-block view of the same segment-id row
            in_specs.append(
                pl.BlockSpec(
                    (None, 1, block_q),
                    lambda b, h, qi, *prefetch: (b, 0, q_block0 + qi),
                    memory_space=pltpu.VMEM,
                )
            )
            operands.append(mask3)

    interpret = jax.devices()[0].platform != "tpu"  # CPU tests run interpreted
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (None, n_rep, block_q, D_pad),
                lambda b, h, qi, *prefetch: (b, h, qi, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (B, H, n_q_blocks * block_q, D_pad), qt.dtype
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * n_q_blocks * block_q * k_ext * D_pad,
            bytes_accessed=(
                B * H * n_q_blocks * block_q * D_pad
                + 2 * B * Hk * k_ext * D_pad
            ) * qt.dtype.itemsize,
            transcendentals=B * H * n_q_blocks * block_q * k_ext,
        ),
    )(kv_start.astype(jnp.int32), *operands)


def _flash_fwd_hm(
    qt: jnp.ndarray,  # (B, H, S_pad, D_pad) head-major
    kt: jnp.ndarray,  # (B, Hk, S_pad, D_pad)
    vt: jnp.ndarray,
    kv_start: jnp.ndarray,  # (B,) int32
    key_mask: Optional[jnp.ndarray],  # (B, S_pad) int32 1=valid, or None
    causal: bool,
    sliding_window: Optional[int],
    scale: float,
    q_len: int,
    block_q: int,
    segments: bool = False,
) -> jnp.ndarray:
    """Head-major flash core -> (B, H, S_pad, D_pad). GQA runs natively:
    each grid step's q block spans all n_rep reps of one kv head (dim-1
    block of n_rep), so ONE K/V residency serves them (n_rep x less KV DMA
    for e.g. Qwen's 28q/4kv heads).

    Causal block-skip: for causal attention, q block qi only needs keys
    [0, (qi+1)*block_q) — issue one pallas_call per q block with a STATIC
    key extent (sliced in the BlockSpec, zero copies) instead of scoring
    the full row and masking. Compute drops to (nq+1)/(2nq) of full
    (~55-60%) while keeping the simple one-softmax kernel the full-row
    benchmarks favoured over online-softmax (PERF.md)."""
    B, H, S_pad, D_pad = qt.shape
    nq = S_pad // block_q

    if causal and nq > 1:
        outs = [
            _flash_fwd_hm_call(
                qt, kt, vt, kv_start, key_mask, causal, sliding_window,
                scale, q_len, block_q,
                q_block0=qi, n_q_blocks=1, k_ext=(qi + 1) * block_q,
                segments=segments,
            )
            for qi in range(nq)
        ]
        return jnp.concatenate(outs, axis=2)

    return _flash_fwd_hm_call(
        qt, kt, vt, kv_start, key_mask, causal, sliding_window, scale,
        q_len, block_q, q_block0=0, n_q_blocks=nq, k_ext=S_pad,
        segments=segments,
    )


def _flash_fwd(
    q: jnp.ndarray,  # (B, S, H, D)
    k: jnp.ndarray,  # (B, S, Hk, D)
    v: jnp.ndarray,
    kv_start: jnp.ndarray,  # (B,) int32
    key_mask: Optional[jnp.ndarray],  # (B, S) int32 1=valid, or None
    causal: bool,
    sliding_window: Optional[int],
    scale: float,
    block_q: Optional[int] = None,
    segments: bool = False,
) -> jnp.ndarray:
    """(B, S, H, D) entry: transpose to head-major, run the core, transpose
    back. The fused decoder path (fused_qkv_attention) skips these
    transposes entirely by emitting head-major q/k/v from the prep kernel."""
    B, S, H, D = q.shape
    Hk = k.shape[2]
    n_rep = H // Hk

    # Mosaic tiles non-128 minors internally; keeping D=96 unpadded skips
    # three full-tensor pad copies per layer (measured -3% decoder time).
    D_pad = D if D % 32 == 0 else _round_up(D, 128)
    if block_q is None:
        block_q = _pick_block_q(S, D_pad, n_rep, q.dtype.itemsize)
        # short bidirectional rows (CLIP tower, S=577): a big block would
        # round S up to it (577 -> 1024, 2.5x wasted scores). One block
        # covering the 64-aligned row wins when the fp32 score tile fits
        # VMEM: 12.9 -> 8.2 ms/layer measured at CLIP shapes (PERF.md).
        if not causal:
            s64 = _round_up(S, 64)
            if s64 <= 1024 and n_rep * s64 * s64 * 4 * 1.5 <= 12 * 1024 * 1024:
                block_q = s64
    S_pad = _round_up(S, block_q)
    if D_pad != D:
        pad = [(0, 0), (0, 0), (0, 0), (0, D_pad - D)]
        q, k, v = (jnp.pad(x, pad) for x in (q, k, v))
    if S_pad != S:
        pad = [(0, 0), (0, S_pad - S), (0, 0), (0, 0)]
        q, k, v = (jnp.pad(x, pad) for x in (q, k, v))
    if key_mask is not None and key_mask.shape[1] != S_pad:
        key_mask = jnp.pad(key_mask, [(0, 0), (0, S_pad - key_mask.shape[1])])

    qt = q.transpose(0, 2, 1, 3)  # (B, H, S_pad, D)
    kt = k.transpose(0, 2, 1, 3)  # (B, Hk, S_pad, D)
    vt = v.transpose(0, 2, 1, 3)

    out = _flash_fwd_hm(
        qt, kt, vt, kv_start, key_mask, causal, sliding_window, scale,
        q_len=S, block_q=block_q, segments=segments,
    )
    out = out.transpose(0, 2, 1, 3)
    return out[:, :S, :, :D]


# --------------------------------------------------------------------------
# Fused backward kernel.
#
# Same structure as the forward (full-row softmax per q block, recomputed —
# cheaper than storing (B,H,S,S) probs): grid (B, kv_head, q_block) with the
# q-block dim innermost; dq writes per block, dk/dv accumulate in fp32 VMEM
# scratch across the sequential q-block steps of one (batch, kv-head) and
# flush on the last step. GQA reps collapse into matmul rows, so dk = ds^T q
# and dv = p^T g sum over the reps for free. Replaces the head-chunked XLA
# recompute (VERDICT r1 item 4: the single biggest training-perf lever).
# --------------------------------------------------------------------------


def _fa_bwd_kernel(
    kv_start_ref,  # SMEM (B,)
    q_ref,  # (n_rep, Bq, D)
    k_ref,  # (S, D)
    v_ref,  # (S, D)
    g_ref,  # (n_rep, Bq, D) upstream grad
    *rest,  # [mask_ref,] dq_ref, dk_ref, dv_ref, dk_acc, dv_acc
    scale: float,
    causal: bool,
    sliding_window: Optional[int],
    q_len: int,
    block_q: int,
    n_q_blocks: int,
    has_mask: bool,
    segments: bool = False,
    q_offset: int = 0,  # static q-position offset (causal block-skip calls)
):
    if segments:
        mask_ref, qseg_ref, dq_ref, dk_ref, dv_ref, dk_acc, dv_acc = rest
    elif has_mask:
        mask_ref, dq_ref, dk_ref, dv_ref, dk_acc, dv_acc = rest
    else:
        dq_ref, dk_ref, dv_ref, dk_acc, dv_acc = rest
    b = pl.program_id(0)
    qi = pl.program_id(2)

    n_rep, Bq, D = q_ref.shape
    k = k_ref[...]
    v = v_ref[...]
    start = kv_start_ref[b]

    # same sub-block software pipeline as the forward: independent row
    # groups give Mosaic MXU work to overlap with the VPU softmax/VJP chain
    n_sub = 1
    for cand in (2,):  # 4 subs measured WORSE here (0.466 vs 0.503 pairs/s)
        if Bq % (cand * 8) == 0 and Bq // cand >= 64:
            n_sub = cand
            break
    rsz = Bq // n_sub

    def scores_of(i):
        qs = q_ref[:, i * rsz : (i + 1) * rsz, :].reshape(n_rep * rsz, D)
        sc = jax.lax.dot_general(
            qs, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (r, S)
        row = jax.lax.broadcasted_iota(jnp.int32, sc.shape, 0)
        q_pos = q_offset + qi * block_q + i * rsz + (row % rsz)
        k_pos = jax.lax.broadcasted_iota(jnp.int32, sc.shape, 1)
        mask = k_pos < q_len
        mask &= k_pos >= start
        if segments:
            k_seg = mask_ref[0, :][None, :]
            q_seg = qseg_ref[0, i * rsz : (i + 1) * rsz]
            q_seg_rows = jnp.tile(q_seg, (n_rep,))[:, None]
            mask &= (k_seg != 0) & (k_seg == q_seg_rows)
        elif has_mask:
            mask &= mask_ref[0, :][None, :] != 0
        if causal:
            mask &= k_pos <= q_pos
            if sliding_window is not None:
                mask &= k_pos > q_pos - sliding_window
        return jnp.where(mask, sc, NEG_INF), qs

    def tail_of(i, sc, qs):
        gs = g_ref[:, i * rsz : (i + 1) * rsz, :].reshape(n_rep * rsz, D)
        m = jnp.max(sc, axis=-1, keepdims=True)
        e = jnp.exp(sc - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)  # fp32
        # dp = g V^T ; softmax VJP: ds = p * (dp - rowsum(p * dp))
        dp = jax.lax.dot_general(
            gs, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        delta = jnp.sum(p * dp, axis=-1, keepdims=True)
        ds = p * (dp - delta) * scale  # fp32
        ds_lp = ds.astype(k.dtype)  # low-precision MXU operands
        p_lp = p.astype(k.dtype)
        dq = jax.lax.dot_general(
            ds_lp, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dq_ref[:, i * rsz : (i + 1) * rsz, :] = dq.astype(dq_ref.dtype).reshape(
            n_rep, rsz, D
        )
        # dk = ds^T q, dv = p^T g — contraction over the rep-collapsed rows
        dk_i = jax.lax.dot_general(
            ds_lp, qs, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (S, D)
        dv_i = jax.lax.dot_general(
            p_lp, gs, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dk_i, dv_i

    dk_part = dv_part = None
    prev = scores_of(0)
    for i in range(1, n_sub + 1):
        cur = scores_of(i) if i < n_sub else None
        dk_i, dv_i = tail_of(i - 1, *prev)
        dk_part = dk_i if dk_part is None else dk_part + dk_i
        dv_part = dv_i if dv_part is None else dv_part + dv_i
        prev = cur

    @pl.when(qi == 0)
    def _init():
        dk_acc[...] = dk_part
        dv_acc[...] = dv_part

    @pl.when(qi > 0)
    def _accum():
        dk_acc[...] += dk_part
        dv_acc[...] += dv_part

    @pl.when(qi == n_q_blocks - 1)
    def _flush():
        dk_ref[...] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[...] = dv_acc[...].astype(dv_ref.dtype)


def _pick_block_q_bwd(S: int, D_pad: int, n_rep: int, itemsize: int) -> int:
    """Backward VMEM: K+V resident + fp32 dk/dv accumulators (2*S*D*4) +
    ~4 fp32 (R, S) tiles (scores/p/dp/ds)."""
    S_est = _round_up(S, 64)
    fixed = 2 * 2 * S_est * D_pad * itemsize + 2 * S_est * D_pad * 4
    budget = 13 * 1024 * 1024
    avail = max(budget - fixed, 2 * 1024 * 1024)
    block_q = int(avail // int(4 * S_est * 4.5 * n_rep))
    return max(64, min(256, (block_q // 64) * 64))


def _flash_bwd(
    q: jnp.ndarray,  # (B, S, H, D)
    k: jnp.ndarray,  # (B, S, Hk, D)
    v: jnp.ndarray,
    g: jnp.ndarray,  # (B, S, H, D)
    kv_start: jnp.ndarray,
    key_mask: Optional[jnp.ndarray],
    causal: bool,
    sliding_window: Optional[int],
    scale: float,
    segments: bool = False,
):
    B, S, H, D = q.shape
    Hk = k.shape[2]
    n_rep = H // Hk
    D_pad = D if D % 32 == 0 else _round_up(D, 128)
    block_q = _pick_block_q_bwd(S, D_pad, n_rep, q.dtype.itemsize)
    S_pad = _round_up(S, block_q)
    if D_pad != D:
        pad = [(0, 0), (0, 0), (0, 0), (0, D_pad - D)]
        q, k, v, g = (jnp.pad(x, pad) for x in (q, k, v, g))
    if S_pad != S:
        pad = [(0, 0), (0, S_pad - S), (0, 0), (0, 0)]
        q, k, v, g = (jnp.pad(x, pad) for x in (q, k, v, g))
    if key_mask is not None and key_mask.shape[1] != S_pad:
        key_mask = jnp.pad(key_mask, [(0, 0), (0, S_pad - key_mask.shape[1])])

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    gt = g.transpose(0, 2, 1, 3)
    nq = S_pad // block_q
    mask3 = (
        key_mask.astype(jnp.int32)[:, None, :] if key_mask is not None else None
    )
    interpret = jax.devices()[0].platform != "tpu"

    def one_call(q_block0, n_q_blocks, k_ext):
        """One pallas_call over q blocks [q_block0, q_block0+n_q_blocks) and
        keys [0, k_ext) — the fwd kernel's causal block-skip, mirrored:
        early q blocks never touch (or pay for) the keys above the
        diagonal. dk/dv come back sized (B, Hk, k_ext, D_pad)."""
        kernel = functools.partial(
            _fa_bwd_kernel,
            scale=scale, causal=causal, sliding_window=sliding_window,
            q_len=S, block_q=block_q, n_q_blocks=n_q_blocks,
            has_mask=key_mask is not None, segments=segments,
            q_offset=q_block0 * block_q,
        )

        def qspec():
            return pl.BlockSpec(
                (None, n_rep, block_q, D_pad),
                lambda b, h, qi, *p: (b, h, q_block0 + qi, 0),
                memory_space=pltpu.VMEM,
            )

        def qspec_out():
            return pl.BlockSpec(
                (None, n_rep, block_q, D_pad),
                lambda b, h, qi, *p: (b, h, qi, 0),
                memory_space=pltpu.VMEM,
            )

        def kvspec():
            return pl.BlockSpec(
                (None, None, k_ext, D_pad),
                lambda b, h, qi, *p: (b, h, 0, 0),
                memory_space=pltpu.VMEM,
            )

        in_specs = [qspec(), kvspec(), kvspec(), qspec()]
        operands = [qt, kt, vt, gt]
        if mask3 is not None:
            in_specs.append(
                pl.BlockSpec(
                    (None, 1, k_ext),
                    lambda b, h, qi, *p: (b, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            )
            operands.append(mask3)
            if segments:
                in_specs.append(
                    pl.BlockSpec(
                        (None, 1, block_q),
                        lambda b, h, qi, *p: (b, 0, q_block0 + qi),
                        memory_space=pltpu.VMEM,
                    )
                )
                operands.append(mask3)

        return pl.pallas_call(
            kernel,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(B, Hk, n_q_blocks),
                in_specs=in_specs,
                out_specs=[qspec_out(), kvspec(), kvspec()],
                scratch_shapes=[
                    pltpu.VMEM((k_ext, D_pad), jnp.float32),
                    pltpu.VMEM((k_ext, D_pad), jnp.float32),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((B, H, n_q_blocks * block_q, D_pad), q.dtype),
                jax.ShapeDtypeStruct((B, Hk, k_ext, D_pad), k.dtype),
                jax.ShapeDtypeStruct((B, Hk, k_ext, D_pad), v.dtype),
            ],
            cost_estimate=pl.CostEstimate(
                flops=10 * B * H * n_q_blocks * block_q * k_ext * D_pad,
                bytes_accessed=4 * (qt.size + kt.size + vt.size) * q.dtype.itemsize,
                transcendentals=B * H * n_q_blocks * block_q * k_ext,
            ),
        )(kv_start.astype(jnp.int32), *operands)

    if causal and nq > 1:
        dqs, dk_sum, dv_sum = [], None, None
        for qi in range(nq):
            k_ext = (qi + 1) * block_q
            dq_i, dk_i, dv_i = one_call(qi, 1, k_ext)
            dqs.append(dq_i)
            pad = [(0, 0), (0, 0), (0, S_pad - k_ext), (0, 0)]
            dk_i = jnp.pad(dk_i.astype(jnp.float32), pad)
            dv_i = jnp.pad(dv_i.astype(jnp.float32), pad)
            dk_sum = dk_i if dk_sum is None else dk_sum + dk_i
            dv_sum = dv_i if dv_sum is None else dv_sum + dv_i
        dqt = jnp.concatenate(dqs, axis=2)
        dkt = dk_sum.astype(k.dtype)
        dvt = dv_sum.astype(v.dtype)
    else:
        dqt, dkt, dvt = one_call(0, nq, S_pad)

    def back(x, n_heads):
        x = x.transpose(0, 2, 1, 3)
        return x[:, :S, :, :D]

    return back(dqt, H), back(dkt, Hk), back(dvt, Hk)




def _batch_shard_mesh():
    """Active mesh + its batch axes (core/mesh.py), or (None, (), 1).

    XLA's SPMD partitioner cannot split a custom call: under plain pjit it
    all-gathers the operands and replicates the kernel on every chip
    (measured: 15 all-gathers on an 8-device mesh). Kernel entries use this
    to run under shard_map over the batch axes instead — each chip computes
    its own batch shard, no communication at all."""
    from ..core.mesh import get_active_mesh

    mesh = get_active_mesh()
    if mesh is None or mesh.devices.size <= 1:
        return None, (), 1
    batch_axes = tuple(
        a for a in ("dp", "fsdp") if a in mesh.axis_names and mesh.shape[a] > 1
    )
    if not batch_axes:
        return None, (), 1
    n = 1
    for a in batch_axes:
        n *= mesh.shape[a]
    return mesh, batch_axes, n


def _shard_map_batch(core_fn, mesh, batch_axes, arg_ndims, out_ndim=4):
    """shard_map ``core_fn`` with dim-0 batch sharding on every arg and the
    (B, ...) output."""
    from jax.sharding import PartitionSpec as P

    in_specs = tuple(P(batch_axes, *([None] * (nd - 1))) for nd in arg_ndims)
    return jax.shard_map(
        core_fn, mesh=mesh, in_specs=in_specs,
        out_specs=P(batch_axes, *([None] * (out_ndim - 1))), check_vma=False,
    )


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8)
)
def _flash_attention_core(q, k, v, kv_start, key_mask, causal, sliding_window, scale,
                          segments=False):
    return _flash_fwd(q, k, v, kv_start, key_mask, causal, sliding_window, scale,
                      segments=segments)


def _core_fwd(q, k, v, kv_start, key_mask, causal, sliding_window, scale,
              segments=False):
    out = _flash_fwd(q, k, v, kv_start, key_mask, causal, sliding_window, scale,
                     segments=segments)
    return out, (q, k, v, kv_start, key_mask)


def _core_bwd(causal, sliding_window, scale, segments, res, g):
    """Backward via the fused Pallas kernel (recompute-in-kernel, fp32
    dk/dv accumulators — no (B, H, S, S) tensor anywhere). Set
    LRT_XLA_ATTN_BWD=1 to fall back to the head-chunked XLA recompute."""
    import os

    q, k, v, kv_start, key_mask = res
    if os.environ.get("LRT_XLA_ATTN_BWD") != "1":
        dq, dk, dv = _flash_bwd(
            q, k, v, g, kv_start, key_mask, causal, sliding_window, scale,
            segments=segments,
        )
        return dq, dk, dv, None, None
    return _core_bwd_xla(causal, sliding_window, scale, res, g, segments=segments)


def _core_bwd_xla(causal, sliding_window, scale, res, g, segments=False):
    """Head-chunked XLA recompute (the pre-kernel path, kept as a fallback
    and as the oracle for kernel-grad parity tests)."""
    q, k, v, kv_start, key_mask = res
    B, S, H, D = q.shape
    if key_mask is not None:
        mask = key_mask.astype(jnp.int32)
    else:
        mask = (jnp.arange(S)[None, :] >= kv_start[:, None]).astype(jnp.int32)

    n_rep = H // k.shape[2]
    if n_rep > 1:  # GQA: expand for the reference path, reduce dk/dv after
        k_full = jnp.repeat(k, n_rep, axis=2)
        v_full = jnp.repeat(v, n_rep, axis=2)
    else:
        k_full, v_full = k, v

    # pick a head chunking that bounds the probs tensor to ~256MB fp32
    per_head = B * S * S * 4
    hc = max(1, min(H, int((256 * 1024 * 1024) // max(per_head, 1)) or 1))
    while H % hc != 0:
        hc -= 1
    nch = H // hc

    def ref(q_h, k_h, v_h):
        if segments:
            return attention_reference(
                q_h, k_h, v_h, causal=causal, sliding_window=sliding_window,
                scale=scale, segment_ids=mask,
            )
        return attention_reference(
            q_h, k_h, v_h, causal=causal, key_padding_mask=mask,
            sliding_window=sliding_window, scale=scale,
        )

    def chunk_grad(args):
        q_h, k_h, v_h, g_h = args
        _, vjp = jax.vjp(ref, q_h, k_h, v_h)
        return vjp(g_h)

    def split(x):  # (B, S, H, D) -> (nch, B, S, hc, D)
        return jnp.moveaxis(
            x.reshape(B, S, nch, hc, D), 2, 0
        )

    dq_c, dk_c, dv_c = jax.lax.map(
        chunk_grad, (split(q), split(k_full), split(v_full), split(g))
    )

    def unsplit(x):  # (nch, B, S, hc, D) -> (B, S, H, D)
        return jnp.moveaxis(x, 0, 2).reshape(B, S, H, D)

    dq, dk, dv = unsplit(dq_c), unsplit(dk_c), unsplit(dv_c)
    if n_rep > 1:  # sum the expanded-kv grads back onto the shared heads
        dk = dk.reshape(B, S, k.shape[2], n_rep, D).sum(axis=3)
        dv = dv.reshape(B, S, k.shape[2], n_rep, D).sum(axis=3)
    return dq, dk, dv, None, None


_flash_attention_core.defvjp(_core_fwd, _core_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    key_padding_mask: Optional[jnp.ndarray] = None,  # (B, S) 1=valid
    sliding_window: Optional[int] = None,
    scale: Optional[float] = None,
    mask_layout: str = "leftpad",
) -> jnp.ndarray:
    """Drop-in for ops.attention.mha's kernel path.

    ``mask_layout``:
    - "leftpad" (default): valid keys form a suffix (the collator's left
      padding, preprocess/collate.py) — masked with one per-batch scalar;
    - "arbitrary": any key-valid pattern (e.g. qwen vision windows whose
      padding is interleaved) — the full (B, S) mask rides into the kernel.
    """
    B, S, H, D = q.shape
    if scale is None:
        scale = 1.0 / (D ** 0.5)
    kv_start = jnp.zeros((B,), jnp.int32)
    key_mask = None
    segments = False
    if key_padding_mask is not None:
        if mask_layout == "segments":
            key_mask = key_padding_mask.astype(jnp.int32)
            segments = True
        elif mask_layout == "arbitrary":
            key_mask = key_padding_mask.astype(jnp.int32)
        elif mask_layout == "leftpad":
            kv_start = jnp.sum(
                1 - key_padding_mask.astype(jnp.int32), axis=-1
            )  # number of left pads == first valid index
        else:
            raise ValueError(f"unknown mask_layout {mask_layout!r}")
    if sliding_window is not None and sliding_window >= S:
        sliding_window = None

    mesh, batch_axes, nshards = _batch_shard_mesh()
    if mesh is not None and B % nshards == 0:
        has_mask = key_mask is not None

        def core(q_, k_, v_, kv_, km_):
            return _flash_attention_core(
                q_, k_, v_, kv_, km_ if has_mask else None,
                causal, sliding_window, scale, segments,
            )

        km = key_mask if has_mask else jnp.zeros((B, S), jnp.int32)
        return _shard_map_batch(core, mesh, batch_axes, (4, 4, 4, 1, 2))(
            q, k, v, kv_start, km
        )
    return _flash_attention_core(
        q, k, v, kv_start, key_mask, causal, sliding_window, scale, segments
    )


# --------------------------------------------------------------------------
# Fused rope+transpose prep kernel + fused decoder attention entry.
#
# The decoder's fused qkv matmul emits (B, S, q_size + 2*kv_size). Getting
# from there to the head-major layout the flash core wants costs XLA a
# reshape + rope elementwise pass + (B,S,H,D)->(B,H,S,D) transposes —
# measured ~5.5 ms/layer at the reward shapes (B8 S2560 H32 D96, PERF.md).
# The prep kernel below streams the qkv tensor once, column-sliced by head
# groups, applies RoPE in-VMEM and writes (B, n_heads, S, D) directly.
# --------------------------------------------------------------------------


def _prep_kernel(x_ref, cos_ref, sin_ref, o_ref, *, g, D, rope):
    x = x_ref[...]  # (block_s, g*D)
    if rope:
        cos = cos_ref[...]  # (block_s, D)
        sin = sin_ref[...]
        half = D // 2
    for j in range(g):
        h = x[:, j * D : (j + 1) * D]
        if rope:
            # rotate_half via static lane slices (pltpu.roll can't rotate
            # non-128 lane widths)
            rot = jnp.concatenate([-h[:, half:], h[:, :half]], axis=1)
            h = h * cos + rot * sin
        o_ref[j] = h


def _prep_group_size(n_heads: int, D: int) -> Optional[int]:
    """Largest head-group g with (g*D) % 128 == 0 and n_heads % g == 0 —
    the column-block constraint of the prep kernel."""
    for g in (16, 8, 4, 2, 1):
        if n_heads % g == 0 and (g * D) % 128 == 0:
            return g
    return None


def _prep_block_s(S: int) -> Optional[int]:
    for bs in (512, 256, 320, 128, 64, 8):
        if S % bs == 0:
            return bs
    return None


def rope_transpose(
    x: jnp.ndarray,  # (B, S, C) projection output (fused or single)
    cos: Optional[jnp.ndarray],  # (B, S, D) or None for no rope
    sin: Optional[jnp.ndarray],
    *,
    col_offset: int,  # start column of this tensor's heads inside x
    n_heads: int,
    head_dim: int,
) -> jnp.ndarray:
    """-> (B, n_heads, S, head_dim), roped iff cos is not None. Caller must
    check fused_path_supported() first."""
    B, S, C = x.shape
    D = head_dim
    g = _prep_group_size(n_heads, D)
    block_s = _prep_block_s(S)
    assert g is not None and block_s is not None and col_offset % (g * D) == 0
    base = col_offset // (g * D)
    rope = cos is not None
    if not rope:  # dummy operands keep one kernel signature
        cos = jnp.zeros((B, S, D), x.dtype)
        sin = cos
    kernel = functools.partial(_prep_kernel, g=g, D=D, rope=rope)
    interpret = jax.devices()[0].platform != "tpu"
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(B, n_heads // g, S // block_s),
        in_specs=[
            pl.BlockSpec(
                (None, block_s, g * D),
                lambda b, gi, si: (b, si, base + gi),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, block_s, D),
                lambda b, gi, si: (b, si, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, block_s, D),
                lambda b, gi, si: (b, si, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (None, g, block_s, D),
            lambda b, gi, si: (b, gi, si, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, n_heads, S, D), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=6 * B * S * n_heads * D,
            bytes_accessed=2 * B * S * n_heads * D * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, cos, sin)


def fused_path_supported(
    S: int, n_heads: int, n_kv_heads: int, head_dim: int
) -> bool:
    """The fused qkv attention path needs head groups whose column width is
    a 128 multiple and head_dim lane-compatible without padding. Any S is
    accepted: sequences that don't divide into prep/flash blocks are
    end-padded inside the impl (q_len masks the pad keys, the pad q rows are
    sliced off) — e.g. llava's 2976 pads to 3072."""
    if _prep_group_size(n_heads, head_dim) is None:
        return False
    if n_kv_heads != n_heads and _prep_group_size(n_kv_heads, head_dim) is None:
        return False
    return head_dim % 32 == 0


def _fused_s_pad(S: int) -> int:
    """Padded sequence length for the fused path: keep S when it already
    divides cleanly (64-aligned q blocks + a prep block size exist — the
    pre-round-5 support condition), else round up to a 256 multiple, which
    guarantees both."""
    if S % 64 == 0 and _prep_block_s(S) is not None:
        return S
    return _round_up(S, 256)


# --------------------------------------------------------------------------
# DIRECT qkv flash kernel (MHA): reads q/k/v straight out of the fused
# projection output via column BlockSpecs, ropes in-kernel, and writes the
# attention output in (B, S, H*D) layout — no head-major materialisation at
# all (the prep-kernel path writes+reads 3 head-major tensors, ~5 ms/layer
# at reward shapes). Each program covers g heads whose combined column
# width g*D is a 128 multiple; the per-head loop software-pipelines
# scores(j+1) [MXU] against softmax(j) [VPU] like _fa_kernel.
# --------------------------------------------------------------------------


def _fa_direct_kernel(
    kv_start_ref,  # SMEM (B,)
    qkv_q_ref,  # (block_q, g*D) q columns of this head group
    qkv_k_ref,  # (k_ext, g*D) k columns
    qkv_v_ref,  # (k_ext, g*D) v columns
    cos_q_ref,  # (block_q, D)
    sin_q_ref,
    cos_k_ref,  # (k_ext, D)
    sin_k_ref,
    o_ref,  # (block_q, g*D)
    *,
    scale: float,
    causal: bool,
    sliding_window: Optional[int],
    q_len: int,
    block_q: int,
    g: int,
    D: int,
    q_offset: int,
    rope_on: bool = True,
):
    b = pl.program_id(0)
    start = kv_start_ref[b]
    qblk = qkv_q_ref[...]
    kblk = qkv_k_ref[...]
    vblk = qkv_v_ref[...]
    cq, sq = cos_q_ref[...], sin_q_ref[...]
    ck, sk = cos_k_ref[...], sin_k_ref[...]
    half = D // 2

    def rope(h, c, s):
        if not rope_on:
            return h
        rot = jnp.concatenate([-h[:, half:], h[:, :half]], axis=1)
        return h * c + rot * s

    def scores_of(j):
        qj = rope(qblk[:, j * D : (j + 1) * D], cq, sq)
        kj = rope(kblk[:, j * D : (j + 1) * D], ck, sk)
        s = jax.lax.dot_general(
            qj, kj, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (block_q, k_ext)
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        q_pos = q_offset + row
        k_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        mask = (k_pos < q_len) & (k_pos >= start)
        if causal:
            mask &= k_pos <= q_pos
            if sliding_window is not None:
                mask &= k_pos > q_pos - sliding_window
        return jnp.where(mask, s, NEG_INF)

    def write_out(j, s):
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(qblk.dtype)
        o = jax.lax.dot_general(
            probs, vblk[:, j * D : (j + 1) * D], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, j * D : (j + 1) * D] = o.astype(o_ref.dtype)

    s_prev = scores_of(0)
    for j in range(1, g + 1):
        s_cur = scores_of(j) if j < g else None
        write_out(j - 1, s_prev)
        s_prev = s_cur


def _direct_group(n_heads: int, D: int) -> Optional[int]:
    # SMALLEST group with a 128-multiple column width: VMEM holds g heads'
    # K/V columns resident, so bigger g trades pipeline depth for memory
    for g in (1, 2, 4, 8):
        if n_heads % g == 0 and (g * D) % 128 == 0:
            return g
    return None


def _direct_path_supported(
    S, n_heads, n_kv_heads, head_dim, key_mask, sliding_window
) -> bool:
    """MHA only (the prep path keeps GQA's shared-KV residency), leftpad/
    causal masks only, S divisible into 64-aligned q blocks."""
    return (
        n_heads == n_kv_heads
        and key_mask is None
        and _direct_group(n_heads, head_dim) is not None
        and head_dim % 2 == 0
        and S % 64 == 0
    )


def _fused_qkv_attention_direct(
    qkv, cos, sin, kv_start, *,
    n_heads, head_dim, causal, sliding_window, scale,
    valid_len: Optional[int] = None,
):
    B, S, C = qkv.shape
    D = head_dim
    qsz = n_heads * D
    g = _direct_group(n_heads, D)
    assert g is not None, (n_heads, D)  # caller gates on _direct_path_supported
    block_q = _pick_block_q(S, D, 1, qkv.dtype.itemsize)
    # VMEM fit against the raised 64MB limit: double-buffered K/V g-head
    # columns + fp32 score tiles (2 alive under the sub-pipeline) + rope rows
    budget = 40 * 1024 * 1024
    fixed = 2 * 2 * S * g * D * qkv.dtype.itemsize + 8 * S * D * qkv.dtype.itemsize
    per_row = int(2 * 4 * S * 1.5 + 4 * g * D)
    block_q = min(block_q, max(64, ((budget - fixed) // per_row) // 64 * 64))
    while S % block_q != 0:
        block_q -= 64
    nq = S // block_q
    rope_on = cos is not None
    if not rope_on:
        cos = jnp.zeros((B, S, D), qkv.dtype)
        sin = cos
    cosb = jnp.broadcast_to(cos, (B, S, D))
    sinb = jnp.broadcast_to(sin, (B, S, D))
    q_len = valid_len if valid_len is not None else S

    def one_call(q_block0, k_ext):
        kernel = functools.partial(
            _fa_direct_kernel,
            scale=scale, causal=causal, sliding_window=sliding_window,
            q_len=q_len, block_q=block_q, g=g, D=D,
            q_offset=q_block0 * block_q, rope_on=rope_on,
        )
        gD = g * D
        return pl.pallas_call(
            kernel,
            interpret=jax.devices()[0].platform != "tpu",
            # the g-head K/V residency + fp32 score tiles overflow the
            # conservative 16MB scoped default; v5e VMEM is far larger
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(B, n_heads // g, 1),
                in_specs=[
                    pl.BlockSpec(
                        (None, block_q, gD),
                        lambda b, h, qi, *p: (b, q_block0, h),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (None, k_ext, gD),
                        lambda b, h, qi, *p: (b, 0, (qsz // gD) + h),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (None, k_ext, gD),
                        lambda b, h, qi, *p: (b, 0, 2 * (qsz // gD) + h),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (None, block_q, D),
                        lambda b, h, qi, *p: (b, q_block0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (None, block_q, D),
                        lambda b, h, qi, *p: (b, q_block0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (None, k_ext, D),
                        lambda b, h, qi, *p: (b, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (None, k_ext, D),
                        lambda b, h, qi, *p: (b, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (None, block_q, gD),
                    lambda b, h, qi, *p: (b, 0, h),  # out covers ONE q block
                    memory_space=pltpu.VMEM,
                ),
            ),
            out_shape=jax.ShapeDtypeStruct((B, block_q, qsz), qkv.dtype),
            cost_estimate=pl.CostEstimate(
                flops=4 * B * n_heads * block_q * k_ext * D,
                bytes_accessed=(B * block_q + 2 * B * k_ext) * C * qkv.dtype.itemsize,
                transcendentals=B * n_heads * block_q * k_ext,
            ),
        )(kv_start.astype(jnp.int32), qkv, qkv, qkv, cosb, sinb, cosb, sinb)

    if causal and nq > 1:
        outs = [one_call(qi, (qi + 1) * block_q) for qi in range(nq)]
        return jnp.concatenate(outs, axis=1)
    return jnp.concatenate([one_call(qi, S) for qi in range(nq)], axis=1) \
        if nq > 1 else one_call(0, S)


def direct_attention(
    qkv, cos, sin, kv_start, *,
    n_heads, head_dim, causal, sliding_window, scale,
    valid_len=None,
):
    """Public mesh-aware entry for the direct kernel (CLIP tower): runs
    under shard_map on the batch axes when a mesh is registered, so the
    custom call partitions instead of forcing all-gathers."""
    B = qkv.shape[0]
    mesh, batch_axes, nshards = _batch_shard_mesh()
    if mesh is not None and B % nshards == 0:
        def core(qkv_, kv_):
            return _fused_qkv_attention_direct(
                qkv_, cos, sin, kv_,
                n_heads=n_heads, head_dim=head_dim, causal=causal,
                sliding_window=sliding_window, scale=scale, valid_len=valid_len,
            )

        return _shard_map_batch(core, mesh, batch_axes, (3, 1), out_ndim=3)(
            qkv, kv_start
        )
    return _fused_qkv_attention_direct(
        qkv, cos, sin, kv_start,
        n_heads=n_heads, head_dim=head_dim, causal=causal,
        sliding_window=sliding_window, scale=scale, valid_len=valid_len,
    )


def _fused_qkv_attention_fwd_impl(
    qkv, cos, sin, kv_start, key_mask, *,
    n_heads, n_kv_heads, head_dim, causal, sliding_window, scale,
):
    B, S, _ = qkv.shape
    D = head_dim
    qsz = n_heads * D
    kvsz = n_kv_heads * D
    # sequences that don't block-divide (llava anyres: 2976) are end-padded;
    # q_len masks the pad keys in-kernel, the pad q rows are sliced off.
    # End-padding (not front) keeps every valid token's causal position.
    S_orig = S
    S_pad = _fused_s_pad(S)
    if S_pad != S:
        pad = [(0, 0), (0, S_pad - S), (0, 0)]
        qkv = jnp.pad(qkv, pad)
        cos = jnp.pad(jnp.broadcast_to(cos, (B, S, D)), pad)
        sin = jnp.pad(jnp.broadcast_to(sin, (B, S, D)), pad)
        if key_mask is not None:
            key_mask = jnp.pad(key_mask, [(0, 0), (0, S_pad - S)])
        S = S_pad
    if _direct_path_supported(S, n_heads, n_kv_heads, D, key_mask, sliding_window):
        g = _direct_group(n_heads, D)
        # tiny grids (small batch training recompute) pipeline poorly in
        # the g-head direct kernel; the per-head prep path wins there
        if B * (n_heads // g) >= 32:
            out = _fused_qkv_attention_direct(
                qkv, cos, sin, kv_start,
                n_heads=n_heads, head_dim=D, causal=causal,
                sliding_window=sliding_window, scale=scale,
                valid_len=S_orig if S_orig != S else None,
            )
            return out[:, :S_orig] if S_orig != S else out
    qt = rope_transpose(qkv, cos, sin, col_offset=0, n_heads=n_heads, head_dim=D)
    kt = rope_transpose(qkv, cos, sin, col_offset=qsz, n_heads=n_kv_heads, head_dim=D)
    vt = rope_transpose(qkv, None, None, col_offset=qsz + kvsz,
                        n_heads=n_kv_heads, head_dim=D)
    n_rep = n_heads // n_kv_heads
    block_q = _pick_block_q(S, D, n_rep, qkv.dtype.itemsize)
    while S % block_q != 0:
        block_q -= 64
    out = _flash_fwd_hm(
        qt, kt, vt, kv_start, key_mask, causal, sliding_window, scale,
        q_len=S_orig, block_q=block_q,
    )  # (B, H, S, D)
    out = out.transpose(0, 2, 1, 3).reshape(B, S, qsz)
    return out[:, :S_orig] if S_orig != S else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _fused_core(qkv, cos, sin, kv_start, key_mask,
                n_heads, n_kv_heads, head_dim, causal, sliding_window, scale):
    return _fused_qkv_attention_fwd_impl(
        qkv, cos, sin, kv_start, key_mask,
        n_heads=n_heads, n_kv_heads=n_kv_heads, head_dim=head_dim,
        causal=causal, sliding_window=sliding_window, scale=scale,
    )


def _fused_core_fwd(qkv, cos, sin, kv_start, key_mask,
                    n_heads, n_kv_heads, head_dim, causal, sliding_window, scale):
    out = _fused_qkv_attention_fwd_impl(
        qkv, cos, sin, kv_start, key_mask,
        n_heads=n_heads, n_kv_heads=n_kv_heads, head_dim=head_dim,
        causal=causal, sliding_window=sliding_window, scale=scale,
    )
    return out, (qkv, cos, sin, kv_start, key_mask)


def _fused_core_bwd(n_heads, n_kv_heads, head_dim, causal, sliding_window, scale,
                    res, g):
    """Backward = VJP of (split + rope) chained with the HEAD-CHUNKED
    attention backward (_core_bwd) so the (B, H, S, S) probs tensor never
    materialises whole; a fused backward kernel is the eventual
    replacement (PERF.md)."""
    from .rope import apply_rotary

    qkv, cos, sin, kv_start, key_mask = res
    B, S, _ = qkv.shape
    D = head_dim
    qsz, kvsz = n_heads * D, n_kv_heads * D

    def front(qkv_in):
        q = qkv_in[..., :qsz].reshape(B, S, n_heads, D)
        k = qkv_in[..., qsz : qsz + kvsz].reshape(B, S, n_kv_heads, D)
        v = qkv_in[..., qsz + kvsz :].reshape(B, S, n_kv_heads, D)
        q, k = apply_rotary(q, k, cos, sin)
        return q, k, v

    (q, k, v), front_vjp = jax.vjp(front, qkv)
    dq, dk, dv, _, _ = _core_bwd(
        causal, sliding_window, scale, False, (q, k, v, kv_start, key_mask),
        g.reshape(B, S, n_heads, D),
    )
    (dqkv,) = front_vjp((dq, dk, dv))
    zeros = jnp.zeros_like(cos)
    return dqkv, zeros, zeros, None, None


_fused_core.defvjp(_fused_core_fwd, _fused_core_bwd)


def fused_qkv_attention(
    qkv: jnp.ndarray,  # (B, S, q_size + 2*kv_size) fused projection output
    cos: jnp.ndarray,  # (B, S, head_dim)
    sin: jnp.ndarray,
    *,
    n_heads: int,
    n_kv_heads: int,
    head_dim: int,
    causal: bool = True,
    key_padding_mask: Optional[jnp.ndarray] = None,  # (B, S) left-pad
    sliding_window: Optional[int] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """RoPE + flash attention straight from the fused qkv projection,
    returning (B, S, n_heads*head_dim) ready for o_proj — no XLA layout
    transposes anywhere on the path. Caller gates on
    fused_path_supported()."""
    B, S, _ = qkv.shape
    if scale is None:
        scale = 1.0 / (head_dim ** 0.5)
    if key_padding_mask is None:
        kv_start = jnp.zeros((B,), jnp.int32)
    else:
        kv_start = jnp.sum(1 - key_padding_mask.astype(jnp.int32), axis=-1)
    if sliding_window is not None and sliding_window >= S:
        sliding_window = None

    mesh, batch_axes, nshards = _batch_shard_mesh()
    if mesh is not None and B % nshards == 0:
        def core(qkv_, cos_, sin_, kv_):
            return _fused_core(
                qkv_, cos_, sin_, kv_, None,
                n_heads, n_kv_heads, head_dim, causal, sliding_window, scale,
            )

        cosb = jnp.broadcast_to(cos, (B, S, head_dim))
        sinb = jnp.broadcast_to(sin, (B, S, head_dim))
        return _shard_map_batch(
            core, mesh, batch_axes, (3, 3, 3, 1), out_ndim=3
        )(qkv, cosb, sinb, kv_start)
    return _fused_core(
        qkv, cos, sin, kv_start, None,
        n_heads, n_kv_heads, head_dim, causal, sliding_window, scale,
    )
