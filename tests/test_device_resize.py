"""Device-side HD bilinear resize vs the host PIL path — BIT-EXACT parity.

The device op (ops/pixels.hd_resize_u8_bank) emulates PIL's fixed-point
BILINEAR resample (the backend of the reference's torchvision resize on PIL
inputs, processing_phi3_v.py:62-104) exactly, so the assertion is equality,
not a tolerance.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp
from PIL import Image

from llava_reward_tpu.ops.pixels import (
    WOUT_MAX,
    build_hd_resize_tables,
    hd_resize_u8_bank,
    taps_for_bucket,
)
from llava_reward_tpu.preprocess.phi3v_processor import (
    hd_transform_image,
    hd_transform_scale,
)

NC = 16


def _host_crops(arr_u8, num_crops=NC):
    """hd_transform_image + the u8 crop split from preprocess_image."""
    img = Image.fromarray(arr_u8)
    hd = hd_transform_image(img, num_crops)
    h, w = hd.shape[:2]
    hc, wc = h // 336, w // 336
    crops = hd.reshape(hc, 336, wc, 336, 3).transpose(0, 2, 1, 3, 4)
    return np.ascontiguousarray(crops.reshape(hc * wc, 336, 336, 3)), (hc, wc)


def _device_crops(arr_u8, bucket_hw, num_crops=NC):
    h0, w0 = arr_u8.shape[:2]
    new_w, new_h, transposed = hd_transform_scale(w0, h0, num_crops)
    land = arr_u8.transpose(1, 0, 2) if transposed else arr_u8
    Hs, Ws = bucket_hw
    assert land.shape[0] <= Hs and land.shape[1] <= Ws, (land.shape, bucket_hw)
    kh, kv = taps_for_bucket(Ws), taps_for_bucket(Hs)
    tabs, (hc, wc) = build_hd_resize_tables(
        land.shape[0], land.shape[1], new_w, new_h, transposed, num_crops,
        kh=kh, kv=kv,
    )
    src = np.zeros((Hs, Ws, 3), np.uint8)
    src[: land.shape[0], : land.shape[1]] = land
    out = jax.jit(hd_resize_u8_bank)(
        jnp.asarray(src[None]),
        *(jnp.asarray(tabs[k][None]) for k in (
            "hidx", "hw", "vidx", "vw", "vbias", "col_start", "slot_perm",
            "tflag",
        )),
    )
    return np.asarray(out[0]), (hc, wc)


@pytest.mark.parametrize(
    "h0,w0",
    [
        (768, 1024),   # landscape 4:3 downscale
        (1024, 768),   # portrait (transposed path)
        (512, 512),    # square
        (200, 260),    # upscale (small image)
        (97, 533),     # extreme-ish landscape, odd sizes
        (640, 360),    # portrait 16:9
    ],
)
def test_device_hd_resize_bit_exact(h0, w0):
    rng = np.random.default_rng(h0 * 1000 + w0)
    arr = rng.integers(0, 256, (h0, w0, 3), np.uint8)
    host, grid_h = _host_crops(arr)
    Hs = max(h0, w0)
    Ws = max(h0, w0)
    dev, grid_d = _device_crops(arr, (Hs, Ws))
    assert grid_h == grid_d
    n = grid_h[0] * grid_h[1]
    np.testing.assert_array_equal(dev[:n], host)


def test_device_hd_resize_batched_mixed_geometry():
    """One jit call, two samples with different geometry/orientation —
    everything per-sample rides in the tables."""
    rng = np.random.default_rng(0)
    imgs = [
        rng.integers(0, 256, (700, 990, 3), np.uint8),
        rng.integers(0, 256, (990, 700, 3), np.uint8),
    ]
    Hs = Ws = 990
    kh, kv = taps_for_bucket(Ws), taps_for_bucket(Hs)
    tabs, grids, srcs = [], [], []
    for arr in imgs:
        h0, w0 = arr.shape[:2]
        new_w, new_h, transposed = hd_transform_scale(w0, h0, NC)
        land = arr.transpose(1, 0, 2) if transposed else arr
        t, g = build_hd_resize_tables(
            land.shape[0], land.shape[1], new_w, new_h, transposed, NC,
            kh=kh, kv=kv,
        )
        src = np.zeros((Hs, Ws, 3), np.uint8)
        src[: land.shape[0], : land.shape[1]] = land
        tabs.append(t)
        grids.append(g)
        srcs.append(src)
    batched = {
        k: jnp.asarray(np.stack([t[k] for t in tabs])) for k in tabs[0]
    }
    out = np.asarray(
        jax.jit(hd_resize_u8_bank)(
            jnp.asarray(np.stack(srcs)),
            batched["hidx"], batched["hw"], batched["vidx"], batched["vw"],
            batched["vbias"], batched["col_start"], batched["slot_perm"],
            batched["tflag"],
        )
    )
    for b, arr in enumerate(imgs):
        host, grid = _host_crops(arr)
        assert grid == grids[b]
        n = grid[0] * grid[1]
        np.testing.assert_array_equal(out[b, :n], host)
