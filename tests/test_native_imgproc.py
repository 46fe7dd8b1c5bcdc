"""Native C++ image pipeline vs the PIL reference path."""

import io

import numpy as np
import pytest

from llava_reward_tpu.preprocess import native
from llava_reward_tpu.preprocess.phi3v_processor import (
    OPENAI_CLIP_MEAN,
    OPENAI_CLIP_STD,
    hd_transform_image,
)

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native lib unavailable"
)


def _jpeg_bytes(arr):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95)
    return buf.getvalue()


def _png_bytes(arr):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def test_decode_jpeg_close_to_pil(rng):
    from PIL import Image

    arr = (rng.random((60, 80, 3)) * 255).astype(np.uint8)
    blob = _jpeg_bytes(arr)
    ours = native.decode_image(blob)
    ref = np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"))
    assert ours.shape == ref.shape
    # same codec, identical output
    assert np.mean(np.abs(ours.astype(int) - ref.astype(int))) < 1.0


def test_decode_png_exact(rng):
    arr = (rng.random((40, 50, 3)) * 255).astype(np.uint8)
    ours = native.decode_image(_png_bytes(arr))
    np.testing.assert_array_equal(ours, arr)


def test_resize_matches_pil(rng):
    from PIL import Image

    arr = (rng.random((100, 140, 3)) * 255).astype(np.uint8)
    ours = native.resize_rgb8(arr, 48, 64, "bilinear")
    ref = np.asarray(
        Image.fromarray(arr).resize((64, 48), Image.BILINEAR), np.float32
    )
    # PIL uses int16 fixed-point coeffs; float path is within 1 LSB
    assert np.max(np.abs(ours - ref)) <= 1.0
    assert np.mean(np.abs(ours - ref)) < 0.3


def test_fused_hd_batch_matches_python(rng):
    imgs = [
        (rng.random((123, 456, 3)) * 255).astype(np.uint8),
        (rng.random((500, 300, 3)) * 255).astype(np.uint8),  # portrait
    ]
    blobs = [_png_bytes(a) for a in imgs]  # lossless so decode matches PIL
    sizes = [(a.shape[1], a.shape[0]) for a in imgs]
    outs = native.phi3v_hd_batch(blobs, sizes, num_crops=16, num_threads=2)
    assert outs is not None
    from PIL import Image

    for arr, out in zip(imgs, outs):
        ref_u8 = hd_transform_image(Image.fromarray(arr), 16)
        ref = (ref_u8.astype(np.float32) / 255.0 - OPENAI_CLIP_MEAN) / OPENAI_CLIP_STD
        assert out.shape == ref.shape
        # resample fixed-point vs float differences, scaled by 1/std
        assert np.mean(np.abs(out - ref)) < 0.02
        assert np.max(np.abs(out - ref)) < 0.2
