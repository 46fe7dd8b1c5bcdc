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
