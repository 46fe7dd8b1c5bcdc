"""Device-side image preprocessing: the fused XLA pixel path that replaces
host-side CLIP-normalisation + global-bicubic (the blueprint's perf north
star — SURVEY.md §2b torchvision row; reference host ops at
processing_phi3_v.py:62-136,265).

Host ships a UINT8 crop bank (4x fewer bytes over the wire than the f32
bank, and no host normalise/resize work) plus the (hc, wc) crop grid; on
device:

  1. u8 -> f32, /255, per-channel CLIP normalise (fused by XLA into the
     consumers);
  2. the 336x336 global view runs ON THE MXU as block-separable bicubic
     matmuls: G = sum_c KyBand[hc, r_c] @ crop_c @ KxBand[wc, col_c]^T,
     where KyBand is a constant (max_grid, max_grid, 336, 336) bank of
     torch-parity cubic-convolution weight slices (rows sum to 1, so the
     resize commutes exactly with the affine normalisation the host
     applies first — order swap is exact to float rounding).

Grids up to max_grid=8 per axis cover every num_crops=16 geometry except
16x1/1x16 panoramas, which fall back to the host f32 path at the
processor level.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

OPENAI_CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
OPENAI_CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)

CROP = 336
MAX_GRID = 8  # covers every hc*wc <= 16 grid except 16x1/1x16 panoramas


def bicubic_weight_matrix(in_size: int, out_size: int = CROP) -> np.ndarray:
    """Dense (out_size, in_size) torch-parity bicubic weights (cubic
    convolution a=-0.75, align_corners=False, no antialias) — the matrix
    form of preprocess.phi3v_processor._resize_bicubic_1d."""
    scale = in_size / out_size
    coords = (np.arange(out_size) + 0.5) * scale - 0.5
    base = np.floor(coords).astype(np.int64)
    frac = coords - base
    taps = np.stack([base - 1, base, base + 1, base + 2], axis=1)
    taps = np.clip(taps, 0, in_size - 1)
    offs = np.stack([frac + 1, frac, 1 - frac, 2 - frac], axis=1)
    ax = np.abs(offs)
    a = -0.75
    ax2, ax3 = ax * ax, ax * ax * ax
    weights = np.where(
        ax <= 1,
        (a + 2) * ax3 - (a + 3) * ax2 + 1,
        np.where(ax < 2, a * ax3 - 5 * a * ax2 + 8 * a * ax - 4 * a, 0.0),
    )
    W = np.zeros((out_size, in_size), np.float32)
    for o in range(out_size):
        for t in range(4):
            W[o, taps[o, t]] += weights[o, t]
    return W


@functools.lru_cache(maxsize=2)
def _band_bank_np(max_grid: int = MAX_GRID) -> np.ndarray:
    """(max_grid, max_grid, 336, 336): entry [g, r] is columns
    [r*336, (r+1)*336) of the (336, (g+1)*336) bicubic matrix (zero for
    r > g)."""
    bank = np.zeros((max_grid, max_grid, CROP, CROP), np.float32)
    for g in range(max_grid):
        W = bicubic_weight_matrix((g + 1) * CROP)
        for r in range(g + 1):
            bank[g, r] = W[:, r * CROP : (r + 1) * CROP]
    return bank


def normalize_pixels(x: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """uint8 (or 0-255 float) -> CLIP-normalised, channels-last."""
    x = x.astype(jnp.float32) / 255.0
    x = (x - jnp.asarray(OPENAI_CLIP_MEAN)) / jnp.asarray(OPENAI_CLIP_STD)
    return x.astype(dtype)


def prepare_pixel_bank(
    crops_u8: jnp.ndarray,  # (B, nc, 336, 336, 3) uint8; slots 0..hc*wc-1 valid
    crop_grid: jnp.ndarray,  # (B, 2) int32 (hc, wc), 1-based, each <= MAX_GRID
    *,
    dtype=jnp.float32,
    max_grid: int = MAX_GRID,
) -> jnp.ndarray:
    """uint8 crop bank -> (B, nc+1, 336, 336, 3) normalised [global, crops...]
    matching host preprocess_image (phi3v_processor.py:219-264) to float
    rounding."""
    B, nc, _, _, C = crops_u8.shape
    bank = jnp.asarray(_band_bank_np(max_grid))  # (G, G, 336, 336)

    hc = jnp.clip(crop_grid[:, 0], 1, max_grid)
    wc = jnp.clip(crop_grid[:, 1], 1, max_grid)
    slot = jnp.arange(nc)
    r = slot[None, :] // jnp.maximum(wc[:, None], 1)  # (B, nc)
    col = slot[None, :] % jnp.maximum(wc[:, None], 1)
    valid = slot[None, :] < (hc * wc)[:, None]
    r = jnp.where(valid & (r < max_grid), r, 0)
    col = jnp.where(valid, col, 0)

    # per-slot weight slices: KyS[b,c] = bank[hc-1, r_c], zeroed when invalid
    ky = bank[hc[:, None] - 1, r]  # (B, nc, 336, 336)
    kx = bank[wc[:, None] - 1, col]
    vmask = valid.astype(jnp.float32)[..., None, None]
    ky = ky * vmask

    xf = crops_u8.astype(jnp.float32)
    # G[b] = sum_c Ky_c @ crop_c @ Kx_c^T   (y: out rows, x: out cols)
    tmp = jnp.einsum("bcyh,bchwn->bcywn", ky, xf)
    glb = jnp.einsum("bcywn,bcxw->byxn", tmp, kx)  # (B, 336, 336, 3)

    full = jnp.concatenate([glb[:, None], xf], axis=1)  # (B, nc+1, ...)
    return normalize_pixels(full, dtype=dtype)


# ---------------------------------------------------------------- HD resize
#
# Device-side HD bilinear resize (SURVEY.md §2b torchvision row, last piece;
# reference host ops at processing_phi3_v.py:62-104): the host ships the
# DECODED uint8 original (fewer wire bytes than the resized crop bank) plus
# tiny per-sample tap tables; the resize + white-pad + crop-split all run on
# device, and the result feeds prepare_pixel_bank (normalise + global
# bicubic) above.
#
# Exactness: PIL's BILINEAR resample is fixed-point (8bpc path,
# Resample.c) — horizontal pass first, coefficients rounded to
# 2^PRECISION_BITS, per-pass accumulate in int32 with round-half-up and a
# clip to u8. We emulate that arithmetic EXACTLY (int32 gather-multiply-
# accumulate on the VPU), so the device bank is bit-identical to the host
# path (test_device_resize.py), not merely close.

PRECISION_BITS = 32 - 8 - 2  # PIL Resample.c 8bpc fixed point
_HALF = 1 << (PRECISION_BITS - 1)
WOUT_MAX = MAX_GRID * CROP  # 2688: widest supported landscape HD width


def pil_bilinear_taps(in_size: int, out_size: int, k_static: int):
    """PIL-parity bilinear tap table: (idx (out,), w (out, k_static) int32).

    idx[o] is the first source index of output o's taps; w rows are the
    fixed-point coefficients (sum 2^PRECISION_BITS), zero-padded to
    k_static. Mirrors precompute_coeffs + normalize_coeffs_8bpc."""
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 1.0 * filterscale
    ksize = int(np.ceil(support)) * 2 + 1
    if ksize > k_static:
        raise ValueError(f"k_static {k_static} < required {ksize}")
    centers = (np.arange(out_size) + 0.5) * scale
    xmin = np.maximum((centers - support + 0.5).astype(np.int64), 0)
    xmax = np.minimum((centers + support + 0.5).astype(np.int64), in_size)
    taps = xmin[:, None] + np.arange(k_static)[None, :]
    dist = (taps - centers[:, None] + 0.5) / filterscale
    w = np.maximum(0.0, 1.0 - np.abs(dist))
    w = np.where(taps < xmax[:, None], w, 0.0)
    w = w / w.sum(axis=1, keepdims=True)
    wq = np.where(
        w < 0,
        (w * (1 << PRECISION_BITS) - 0.5).astype(np.int64),
        (w * (1 << PRECISION_BITS) + 0.5).astype(np.int64),
    )
    return xmin.astype(np.int32), wq.astype(np.int32)


def _fixedpoint_clip8(acc: jnp.ndarray) -> jnp.ndarray:
    """int32 accumulator (incl. rounding half) -> u8, PIL clip8 semantics."""
    return jnp.clip(
        jax.lax.shift_right_arithmetic(acc, PRECISION_BITS), 0, 255
    ).astype(jnp.uint8)


def hd_resize_u8_bank(
    src_u8: jnp.ndarray,   # (B, Hs, Ws, 3) u8, LANDSCAPE-oriented original
    hidx: jnp.ndarray,     # (B, WOUT_MAX) int32 first horizontal tap
    hw: jnp.ndarray,       # (B, WOUT_MAX, Kh) int32 fixed-point weights
    vidx: jnp.ndarray,     # (B, nc, 336) int32 first vertical tap (source row)
    vw: jnp.ndarray,       # (B, nc, 336, Kv) int32 (all-zero on white-pad rows)
    vbias: jnp.ndarray,    # (B, nc, 336) int32 rounding half (+255<<PB on pad rows)
    col_start: jnp.ndarray,  # (B, nc) int32 first horizontal-output column of slot
    slot_perm: jnp.ndarray,  # (B, nc) int32 final-order -> landscape-order slots
    tflag: jnp.ndarray,    # (B,) bool: portrait sample (transpose back)
) -> jnp.ndarray:
    """uint8 original -> (B, nc, 336, 336, 3) uint8 HD crop bank, bit-equal
    to hd_transform_image + crop split on host. All shapes static; every
    per-sample geometry lives in the host-built tap tables."""
    B, Hs, Ws, C = src_u8.shape
    nc = vidx.shape[1]
    Kh, Kv = hw.shape[-1], vw.shape[-1]
    src = src_u8.astype(jnp.int32)

    # pass 1 — horizontal (PIL resamples horizontally first)
    acc = jnp.full((B, Hs, hidx.shape[1], C), _HALF, jnp.int32)
    for k in range(Kh):
        col = jnp.clip(hidx + k, 0, Ws - 1)  # (B, Wout)
        taps = jnp.take_along_axis(src, col[:, None, :, None], axis=2)
        acc = acc + taps * hw[:, None, :, k, None]
    hpass = _fixedpoint_clip8(acc).astype(jnp.int32)  # (B, Hs, Wout, 3)

    # column-split into slots BEFORE the vertical pass (shrinks the pass-2
    # working set from (.., WOUT_MAX, ..) to (.., 336, ..))
    cols = col_start[:, :, None] + jnp.arange(CROP, dtype=jnp.int32)  # (B, nc, 336)
    slots = jnp.take_along_axis(
        hpass[:, None], cols[:, :, None, :, None], axis=3
    )  # (B, nc, Hs, 336, 3)

    # pass 2 — vertical, white padding folded into vbias
    acc = jnp.broadcast_to(vbias[:, :, :, None, None], (B, nc, CROP, CROP, C))
    for k in range(Kv):
        row = jnp.clip(vidx + k, 0, Hs - 1)  # (B, nc, 336)
        taps = jnp.take_along_axis(slots, row[:, :, :, None, None], axis=2)
        acc = acc + taps * vw[:, :, :, None, k, None]
    bank = _fixedpoint_clip8(acc)  # (B, nc, 336, 336, 3) landscape order

    # portrait samples: permute slots + swap each crop's spatial axes
    permuted = jnp.take_along_axis(
        bank, slot_perm[:, :, None, None, None], axis=1
    )
    return jnp.where(
        tflag[:, None, None, None, None], permuted.swapaxes(2, 3), bank
    )


def taps_for_bucket(bucket_edge: int) -> int:
    """Static tap count covering every downscale a bucket edge can ask for
    (worst support = bucket_edge/336; ksize = 2*ceil(support)+1)."""
    import math

    return 2 * math.ceil(max(bucket_edge / CROP, 1.0)) + 1


def build_hd_resize_tables(
    in_h: int,
    in_w: int,
    new_w: int,
    new_h: int,
    transposed: bool,
    num_crops: int,
    kh: int,
    kv: int,
):
    """Host-side (numpy) per-sample tap tables for hd_resize_u8_bank.

    (in_h, in_w): the LANDSCAPE-oriented source size (caller transposes the
    array for portrait images); (new_w, new_h): hd_transform_scale's resize
    target. Returns a dict of arrays (unbatched) + the final (hc, wc)."""
    import math

    nc = num_crops
    target_h = int(math.ceil(new_h / CROP) * CROP)
    top = (target_h - new_h) // 2
    hcL, wcL = target_h // CROP, new_w // CROP
    if wcL * CROP > WOUT_MAX:
        raise ValueError(f"HD width {new_w} exceeds device budget {WOUT_MAX}")

    hx, hwt = pil_bilinear_taps(in_w, new_w, kh)
    hidx = np.zeros((WOUT_MAX,), np.int32)
    hw = np.zeros((WOUT_MAX, kh), np.int32)
    hidx[:new_w] = hx
    hw[:new_w] = hwt

    vx, vwt = pil_bilinear_taps(in_h, new_h, kv)
    vidx = np.zeros((nc, CROP), np.int32)
    vw = np.zeros((nc, CROP, kv), np.int32)
    vbias = np.full((nc, CROP), _HALF + (255 << PRECISION_BITS), np.int32)
    col_start = np.zeros((nc,), np.int32)
    for s in range(min(hcL * wcL, nc)):
        rL, cL = divmod(s, wcL)
        col_start[s] = cL * CROP
        g = rL * CROP + np.arange(CROP)
        inside = (g >= top) & (g < top + new_h)
        src_rows = np.clip(g - top, 0, new_h - 1)
        vidx[s] = np.where(inside, vx[src_rows], 0)
        vw[s] = np.where(inside[:, None], vwt[src_rows], 0)
        vbias[s] = np.where(inside, _HALF, vbias[s])

    slot_perm = np.arange(nc, dtype=np.int32)
    if transposed:
        hc, wc = wcL, hcL
        for r in range(hc):
            for c in range(wc):
                slot_perm[r * wc + c] = c * wcL + r
    else:
        hc, wc = hcL, wcL
    return {
        "hidx": hidx, "hw": hw, "vidx": vidx, "vw": vw, "vbias": vbias,
        "col_start": col_start, "slot_perm": slot_perm,
        "tflag": np.asarray(transposed),
    }, (hc, wc)
