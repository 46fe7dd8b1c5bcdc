"""Host-side Phi-3.5-V processor: HD multi-crop geometry, normalisation,
tokenised text/image splicing, and the static-shape index arrays the TPU
forward consumes.

Reference behaviour reproduced (processing_phi3_v.py):
- HD_transform (:83-104): transpose-if-portrait, scale search
  ``scale * ceil(scale/ratio) <= num_crops``, bilinear resize to
  (new_w = scale*336, new_h = new_w/ratio), white top/bottom pad to a
  multiple of 336, transpose back;
- CLIP normalise, global 336x336 bicubic downsample (:263-265), crop grid
  reshape (:272), concat [global]+crops and zero-pad to num_crops+1
  (:128-136,277);
- ``num_img_tokens = ((h/336)*(w/336)+1)*144 + 1 + (h/336+1)*12`` (:269);
- text splitting on ``<|image_\\d+|>`` and insertion of per-image token runs
  (:407-454); attention mask all-ones over both text and image positions
  (:449).

TPU-first difference: instead of negative sentinel token ids, we emit
  * ``img_gather_idx``: the dense feature-bank gather (see models/phi3v.py)
    that encodes the HD [sub+newline, glb_GN, global+newline] ordering,
  * ``splice_idx``: per sequence position, the image-token slot or -1,
so the device code is all static-shape gathers.

The global-image bicubic downsample uses torch (CPU) when available for
bit parity with the reference's F.interpolate(mode='bicubic'); otherwise a
numpy implementation of the same cubic-convolution (a=-0.75) resampler.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass
from typing import Any, List, Optional, Sequence, Tuple

import numpy as np

OPENAI_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], dtype=np.float32)
OPENAI_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], dtype=np.float32)

IMAGE_TAG_PATTERN = re.compile(r"<\|image_(\d+)\|>")


# --------------------------------------------------------------- geometry

def hd_transform_scale(width: int, height: int, hd_num: int = 16) -> Tuple[int, int, bool]:
    """Return (new_w, new_h, transposed) for the landscape-oriented image.

    Mirrors HD_transform's scale search (processing_phi3_v.py:83-104).
    """
    transposed = False
    if width < height:
        width, height = height, width
        transposed = True
    ratio = width / height
    scale = 1
    while scale * math.ceil(scale / ratio) <= hd_num:
        scale += 1
    scale -= 1
    new_w = int(scale * 336)
    new_h = int(new_w / ratio)
    return new_w, new_h, transposed


def padded_size(new_w: int, new_h: int) -> Tuple[int, int]:
    """White-pad height up to a multiple of 336 (padding_336, :61-75)."""
    target_h = int(math.ceil(new_h / 336) * 336)
    return new_w, target_h


def calc_hd_transform_size(width: int, height: int, hd_num: int = 16) -> Tuple[int, int]:
    """Final (w, h) after HD transform incl. transpose-back (:104-125)."""
    new_w, new_h, transposed = hd_transform_scale(width, height, hd_num)
    pw, ph = padded_size(new_w, new_h)
    if transposed:
        pw, ph = ph, pw
    return pw, ph


def num_img_tokens_for(h: int, w: int) -> int:
    """(:269) — h, w are the padded HD sizes (multiples of 336)."""
    hc, wc = h // 336, w // 336
    return int((hc * wc + 1) * 144 + 1 + (hc + 1) * 12)


def max_num_img_tokens(num_crops: int = 16) -> int:
    """Static image-token budget: worst case over h_crop*w_crop <= num_crops
    (maximised by an extreme num_crops x 1 aspect ratio)."""
    best = 0
    for hc in range(1, num_crops + 1):
        for wc in range(1, num_crops + 1):
            if hc * wc <= num_crops:
                best = max(best, num_img_tokens_for(hc * 336, wc * 336))
    return best


def build_img_gather_idx(
    h_crop: int, w_crop: int, num_crops: int, budget: int, merge_grid: int = 12
) -> np.ndarray:
    """Indices into the dense feature bank for one image's token sequence.

    Bank layout (models/phi3v.py): rows 0/1 are sub_GN/glb_GN; crop c's
    merged patch (i, j) lives at ``2 + c*G^2 + i*G + j`` (G = merge_grid) —
    sentinels lead so indices survive crop-count padding.
    Ordering matches hd_feature_transform
    (modeling_phi3_v.py:254-303): sub crops row-major with a newline after
    each of the h_crop*G rows, then glb_GN, then the global crop (index 0)
    with its newlines.
    """
    G = merge_grid
    g2 = G * G
    sub_gn, glb_gn = 0, 1  # sentinel rows lead the bank (models/phi3v.py)
    base = 2

    # sub-image rows: R in [0, h_crop*G), columns [0, w_crop*G) + newline
    R = np.arange(h_crop * G)[:, None]
    Cc = np.arange(w_crop * G)[None, :]
    crop = 1 + (R // G) * w_crop + (Cc // G)
    idx_grid = base + crop * g2 + (R % G) * G + (Cc % G)  # (h_crop*G, w_crop*G)
    rows = np.concatenate(
        [idx_grid, np.full((h_crop * G, 1), sub_gn, dtype=np.int64)], axis=1
    ).reshape(-1)

    # global crop grid + newlines
    gi = np.arange(G)[:, None]
    gj = np.arange(G)[None, :]
    glb_grid = base + 0 * g2 + gi * G + gj
    glb_rows = np.concatenate(
        [glb_grid, np.full((G, 1), sub_gn, dtype=np.int64)], axis=1
    ).reshape(-1)

    idx = np.concatenate([rows, np.array([glb_gn], dtype=np.int64), glb_rows])
    n = idx.shape[0]
    if G == 12:  # the formula at :269 is specific to the 24->12 merge grid
        assert n == num_img_tokens_for(h_crop * 336, w_crop * 336), (n, h_crop, w_crop)
    if n > budget:
        raise ValueError(f"image token count {n} exceeds budget {budget}")
    out = np.full((budget,), sub_gn, dtype=np.int32)  # pad value is masked out
    out[:n] = idx
    return out


# --------------------------------------------------------------- resampling

def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic-convolution kernel used by torch's bicubic (a = -0.75)."""
    ax = np.abs(x)
    ax2, ax3 = ax * ax, ax * ax * ax
    w = np.where(
        ax <= 1,
        (a + 2) * ax3 - (a + 3) * ax2 + 1,
        np.where(ax < 2, a * ax3 - 5 * a * ax2 + 8 * a * ax - 4 * a, 0.0),
    )
    return w


def _resize_bicubic_1d(x: np.ndarray, out_size: int, axis: int) -> np.ndarray:
    """torch F.interpolate(mode='bicubic', align_corners=False, antialias=False)
    along one axis."""
    in_size = x.shape[axis]
    scale = in_size / out_size
    # align_corners=False source coordinates
    coords = (np.arange(out_size) + 0.5) * scale - 0.5
    base = np.floor(coords).astype(np.int64)
    frac = coords - base
    taps = np.stack([base - 1, base, base + 1, base + 2], axis=1)  # (out, 4)
    taps = np.clip(taps, 0, in_size - 1)
    offs = np.stack([frac + 1, frac, 1 - frac, 2 - frac], axis=1)
    weights = _cubic_kernel(offs)  # (out, 4)
    x = np.moveaxis(x, axis, 0)
    gathered = x[taps]  # (out, 4, ...)
    out = np.einsum("ot,ot...->o...", weights, gathered)
    return np.moveaxis(out, 0, axis)


def resize_bicubic_np(img_chw: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Bicubic resize (C, H, W) float32 -> (C, size0, size1), torch parity."""
    out = _resize_bicubic_1d(img_chw, size[0], axis=1)
    out = _resize_bicubic_1d(out, size[1], axis=2)
    return out


def bicubic_global_image(img_chw: np.ndarray) -> np.ndarray:
    """336x336 global view of the normalised HD image (:265).

    The numpy resampler implements torch's exact bicubic (cubic convolution
    a=-0.75, align_corners=False, no antialias; verified to 3e-7 against
    F.interpolate) and runs ~20x faster than torch's single-thread CPU path
    (12 vs 263 ms on a 1008x1344 input)."""
    return resize_bicubic_np(img_chw, (336, 336))


# --------------------------------------------------------------- image path

def hd_transform_image(image, num_crops: int = 16) -> np.ndarray:
    """PIL image -> HD-transformed uint8 RGB array (H, W, 3), H and W per
    calc_hd_transform_size. Bilinear resize on PIL (same backend the
    reference's torchvision resize uses on PIL inputs) + white padding."""
    from PIL import Image

    img = image.convert("RGB")
    w, h = img.size
    new_w, new_h, transposed = hd_transform_scale(w, h, num_crops)
    if transposed:
        img = img.transpose(Image.TRANSPOSE)
    img = img.resize((new_w, new_h), Image.BILINEAR)
    arr = np.asarray(img, dtype=np.uint8)
    _, target_h = padded_size(new_w, new_h)
    top = (target_h - new_h) // 2
    bottom = target_h - new_h - top
    arr = np.pad(
        arr, ((top, bottom), (0, 0), (0, 0)), mode="constant", constant_values=255
    )
    if transposed:
        arr = arr.transpose(1, 0, 2)  # transpose back (swap H and W)
    return arr


def preprocess_image(
    image, num_crops: int = 16, layout: str = "f32"
) -> Tuple[np.ndarray, Tuple[int, int], int]:
    """Full image pipeline for one image.

    ``image``: PIL image, or raw JPEG/PNG ``bytes`` (routed through the
    native C++ fused decode+HD+normalise pipeline when built —
    native/imgproc.cpp — with a PIL fallback).

    ``layout``:
    - "f32" (default): (num_crops+1, 336, 336, 3) float32 channels-last
      normalised bank [global, crops...], zero-padded (matching
      pad_to_max_num_crops_tensor, :128-136);
    - "u8": (hc*wc, 336, 336, 3) UINT8 crops only — normalisation and the
      global bicubic run on device (ops/pixels.prepare_pixel_bank), host
      work and host->HBM bytes drop ~4x.

    Returns (pixel_values, (h, w), num_img_tokens).
    """
    if layout == "u8":
        if isinstance(image, (bytes, bytearray)):
            import io

            from PIL import Image

            image = Image.open(io.BytesIO(bytes(image)))
        arr = hd_transform_image(image, num_crops)  # (H, W, 3) uint8
        h, w = arr.shape[:2]
        hc, wc = h // 336, w // 336
        crops = arr.reshape(hc, 336, wc, 336, 3).transpose(0, 2, 1, 3, 4)
        crops = np.ascontiguousarray(crops.reshape(hc * wc, 336, 336, 3))
        return crops, (h, w), num_img_tokens_for(h, w)
    x = None
    if isinstance(image, (bytes, bytearray)):
        from . import native

        blob = bytes(image)
        arr_hdr = native.decode_image(blob) if native.native_available() else None
        if arr_hdr is not None:
            hh, ww = arr_hdr.shape[:2]
            outs = native.phi3v_hd_batch([blob], [(ww, hh)], num_crops, 1)
            if outs is not None:
                x = outs[0]  # already normalised (H, W, 3) float32
        if x is None:  # fall back to PIL decode
            import io

            from PIL import Image

            image = Image.open(io.BytesIO(blob))
    if x is None:
        arr = hd_transform_image(image, num_crops)  # (H, W, 3) uint8
        x = arr.astype(np.float32) / 255.0
        x = (x - OPENAI_CLIP_MEAN) / OPENAI_CLIP_STD  # (H, W, 3)
    h, w = x.shape[:2]

    glb = bicubic_global_image(x.transpose(2, 0, 1)).transpose(1, 2, 0)  # (336,336,3)

    hc, wc = h // 336, w // 336
    crops = x.reshape(hc, 336, wc, 336, 3).transpose(0, 2, 1, 3, 4).reshape(
        hc * wc, 336, 336, 3
    )
    out = np.zeros((num_crops + 1, 336, 336, 3), dtype=np.float32)
    out[0] = glb
    out[1 : 1 + hc * wc] = crops
    return out, (h, w), num_img_tokens_for(h, w)


def decode_to_u8(image) -> np.ndarray:
    """PIL image / raw bytes -> decoded uint8 RGB (H, W, 3), no resize
    (device-resize mode ships this as-is; native C++ decode when built)."""
    if isinstance(image, (bytes, bytearray)):
        from . import native

        blob = bytes(image)
        if native.native_available():
            arr = native.decode_image(blob)
            if arr is not None:
                return arr
        import io

        from PIL import Image

        image = Image.open(io.BytesIO(blob))
    return np.asarray(image.convert("RGB"), dtype=np.uint8)


def preprocess_image_src(image, num_crops: int = 16):
    """Device-resize preprocessing for one image: decode only; the HD
    bilinear resize + pad + crop split run on device (ops/pixels.
    hd_resize_u8_bank, bit-exact vs hd_transform_image).

    Returns (src_u8_landscape, resize_geom, (h, w) final, n_tokens), or
    None when the geometry exceeds the device budget (fallback to the
    u8/f32 host paths)."""
    from ..ops.pixels import MAX_GRID, WOUT_MAX

    arr = decode_to_u8(image)
    h0, w0 = arr.shape[:2]
    new_w, new_h, transposed = hd_transform_scale(w0, h0, num_crops)
    _, target_h = padded_size(new_w, new_h)
    hcL, wcL = target_h // 336, new_w // 336
    land = arr.transpose(1, 0, 2) if transposed else arr
    if (
        max(hcL, wcL) > MAX_GRID
        or max(land.shape[:2]) > WOUT_MAX
        or new_w > WOUT_MAX
    ):
        return None
    h, w = (new_w, target_h) if transposed else (target_h, new_w)
    return np.ascontiguousarray(land), (new_w, new_h, transposed), (h, w), num_img_tokens_for(h, w)


def sample_from_src(s: "ProcessedSample") -> "ProcessedSample":
    """Mixed-batch fallback: host-resize a device-resize sample back into
    u8 crops (identical output — the device op is bit-exact vs this)."""
    import dataclasses

    from PIL import Image

    new_w, new_h, transposed = s.resize_geom
    img = Image.fromarray(s.src_u8).resize((new_w, new_h), Image.BILINEAR)
    arr = np.asarray(img, dtype=np.uint8)
    _, target_h = padded_size(new_w, new_h)
    top = (target_h - new_h) // 2
    arr = np.pad(
        arr, ((top, target_h - new_h - top), (0, 0), (0, 0)),
        mode="constant", constant_values=255,
    )
    if transposed:
        arr = arr.transpose(1, 0, 2)
    h, w = arr.shape[:2]
    hc, wc = h // 336, w // 336
    crops = arr.reshape(hc, 336, wc, 336, 3).transpose(0, 2, 1, 3, 4)
    crops = np.ascontiguousarray(crops.reshape(hc * wc, 336, 336, 3))
    assert (hc, wc) == tuple(s.crop_grid), ((hc, wc), s.crop_grid)
    return dataclasses.replace(s, pixel_values=crops, src_u8=None, resize_geom=None)


def host_bank_from_u8(
    crops_u8: np.ndarray, crop_grid: Tuple[int, int]
) -> np.ndarray:
    """u8 crops (hc*wc, 336, 336, 3) -> f32 normalised (hc*wc+1, ...) bank
    [global, crops...] — the host fallback used when a batch mixes u8 and
    f32 samples (extreme-aspect images)."""
    hc, wc = crop_grid
    x = crops_u8.astype(np.float32) / 255.0
    x = (x - OPENAI_CLIP_MEAN) / OPENAI_CLIP_STD
    hd = x.reshape(hc, wc, 336, 336, 3).transpose(0, 2, 1, 3, 4).reshape(
        hc * 336, wc * 336, 3
    )
    glb = bicubic_global_image(hd.transpose(2, 0, 1)).transpose(1, 2, 0)
    return np.concatenate([glb[None], x], axis=0).astype(np.float32)


# --------------------------------------------------------------- full sample

@dataclass
class ProcessedSample:
    """One (text, image) sample, unpadded; the collator left-pads to the
    static sequence length."""

    family = "phi3v"  # collator crop-bucketing applies to HD crops only

    input_ids: np.ndarray  # (s,) int32, image positions hold 0
    attention_mask: np.ndarray  # (s,) int32 all ones (reference :449)
    splice_idx: np.ndarray  # (s,) int32, slot index or -1
    pixel_values: Optional[np.ndarray]  # f32 (num_crops+1, 336, 336, 3) bank
    # OR u8 (hc*wc, 336, 336, 3) crops when crop_grid is set (device preproc)
    img_gather_idx: Optional[np.ndarray]  # (T_img,) int32
    num_img_tokens: int
    image_size: Tuple[int, int]  # (h, w) post-HD
    crop_grid: Optional[Tuple[int, int]] = None  # (hc, wc) in u8 mode
    # device-RESIZE mode (LRT_DEVICE_RESIZE=1): the DECODED original ships
    # and the HD bilinear resize itself runs on device (ops/pixels.
    # hd_resize_u8_bank); pixel_values is None and these two are set.
    src_u8: Optional[np.ndarray] = None  # landscape-oriented (h, w, 3) u8
    resize_geom: Optional[Tuple[int, int, bool]] = None  # (new_w, new_h, transposed)


class Phi3VProcessor:
    """Tokeniser + image processor + splice-index builder.

    ``tokenizer`` needs ``__call__(text).input_ids`` (HF-compatible) or may
    be any callable ``text -> List[int]``.
    """

    accepts_bytes = True  # images may arrive as raw JPEG/PNG bytes (native path)

    def __init__(
        self,
        tokenizer,
        num_crops: int = 16,
        img_token_budget: Optional[int] = None,
        device_preproc: bool = False,
    ):
        self.tokenizer = tokenizer
        self.num_crops = num_crops
        self.img_token_budget = (
            img_token_budget
            if img_token_budget is not None
            else max_num_img_tokens(num_crops)
        )
        # ship u8 crops and normalise/global-resize on device (single-image
        # samples with grids <= ops/pixels.MAX_GRID; others fall back to f32)
        self.device_preproc = device_preproc
        # LRT_DEVICE_RESIZE=1: ship the DECODED original instead and run the
        # HD bilinear resize itself on device too (opt-in, needs device_preproc)
        import os

        self.device_resize = device_preproc and os.environ.get(
            "LRT_DEVICE_RESIZE", "0"
        ) == "1"

    def _tokenize(self, text: str) -> List[int]:
        out = self.tokenizer(text)
        if hasattr(out, "input_ids"):
            return list(out.input_ids)
        if isinstance(out, dict):
            return list(out["input_ids"])
        return list(out)

    def __call__(self, text: str, images: Sequence[Any] = ()) -> ProcessedSample:
        if not images:
            ids = np.asarray(self._tokenize(text), dtype=np.int32)
            return ProcessedSample(
                input_ids=ids,
                attention_mask=np.ones_like(ids),
                splice_idx=np.full_like(ids, -1),
                pixel_values=None,
                img_gather_idx=None,
                num_img_tokens=0,
                image_size=(0, 0),
            )
        # tag validation matches _convert_images_texts_to_inputs
        # (processing_phi3_v.py:426-437): ids 1..n contiguous, one per image
        split = IMAGE_TAG_PATTERN.split(text)
        text_chunks = [self._tokenize(c) for c in split[0::2]]
        tag_ids = [int(t) for t in split[1::2]]
        unique = sorted(set(tag_ids))
        if unique != list(range(1, len(unique) + 1)):
            raise ValueError(f"image ids must be 1..n, got {unique}")
        if len(unique) != len(images):
            raise ValueError(f"{len(unique)} image tags but {len(images)} images")

        # Multi-image: the feature bank concatenates every image's crops after
        # the leading GN sentinel rows, so image i's crop c lives at rows
        # 2 + (i*(num_crops+1) + c)*144 ...
        crop_grid = None
        src_u8 = resize_geom = None
        use_u8 = self.device_preproc and len(images) == 1
        if use_u8 and self.device_resize:
            src = preprocess_image_src(images[0], self.num_crops)
            if src is not None:
                src_u8, resize_geom, (h8, w8), n_tok8 = src
                crop_grid = (h8 // 336, w8 // 336)
                per_img = [(None, (h8, w8), n_tok8)]
                use_u8 = False  # skip the crop-bank branches below
        if use_u8 and src_u8 is None:
            from ..ops.pixels import MAX_GRID

            per_img = [preprocess_image(im, self.num_crops, layout="u8") for im in images]
            h8, w8 = per_img[0][1]
            if h8 // 336 > MAX_GRID or w8 // 336 > MAX_GRID:
                use_u8 = False  # extreme aspect: host f32 fallback
        if src_u8 is not None:
            pixel_values = None
        elif use_u8:
            pixel_values = per_img[0][0]  # (hc*wc, 336, 336, 3) uint8
            crop_grid = (h8 // 336, w8 // 336)
        else:
            per_img = [preprocess_image(im, self.num_crops) for im in images]
            pixel_values = np.concatenate([p[0] for p in per_img], axis=0)
        grid2 = 144  # merge_grid^2
        crops1 = self.num_crops + 1

        ids: List[int] = []
        splice: List[int] = []
        gather: List[np.ndarray] = []
        slot = 0
        for i, chunk in enumerate(text_chunks):
            ids.extend(chunk)
            splice.extend([-1] * len(chunk))
            if i >= len(tag_ids):
                continue
            img_i = tag_ids[i] - 1
            _, (h, w), n_tok = per_img[img_i]
            idx = build_img_gather_idx(
                h // 336, w // 336, self.num_crops, budget=n_tok
            ).astype(np.int64)
            # shift crop rows (idx >= 2) to this image's bank region
            idx = np.where(idx >= 2, idx + img_i * crops1 * grid2, idx)
            gather.append(idx)
            ids.extend([0] * n_tok)
            splice.extend(range(slot, slot + n_tok))
            slot += n_tok

        budget = max(self.img_token_budget, slot) if len(images) == 1 else slot
        gather_idx = np.zeros((budget,), dtype=np.int32)  # pad -> sub_GN row 0
        if gather:
            cat = np.concatenate(gather)
            gather_idx[: len(cat)] = cat.astype(np.int32)

        h0, w0 = per_img[0][1]
        return ProcessedSample(
            input_ids=np.asarray(ids, dtype=np.int32),
            attention_mask=np.ones((len(ids),), dtype=np.int32),
            splice_idx=np.asarray(splice, dtype=np.int32),
            pixel_values=pixel_values,
            img_gather_idx=gather_idx,
            num_img_tokens=slot,
            image_size=(h0, w0),
            crop_grid=crop_grid,
            src_u8=src_u8,
            resize_geom=resize_geom,
        )


def apply_phi3v_chat_template(tokenizer, prompt: str) -> str:
    """The dataset-layer prompt construction (reward_dataset.py:84-91):
    chat template on one user turn ``<|image_1|>\\n{prompt}`` with
    add_generation_prompt=True, the trailing 22 chars (the assistant cue)
    sliced off, then EOS appended."""
    msg = {"role": "user", "content": f"<|image_1|>\n{prompt}"}
    templated = tokenizer.apply_chat_template(
        [msg], tokenize=False, add_generation_prompt=True
    )[:-22]
    return templated + tokenizer.eos_token
