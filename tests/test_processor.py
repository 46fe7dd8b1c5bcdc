"""HD-transform geometry, num_img_tokens, and the splice pipeline."""

import numpy as np
import pytest

from llava_reward_tpu.preprocess.phi3v_processor import (
    Phi3VProcessor,
    apply_phi3v_chat_template,
    calc_hd_transform_size,
    hd_transform_scale,
    max_num_img_tokens,
    num_img_tokens_for,
    preprocess_image,
)
from llava_reward_tpu.preprocess.collate import collate_samples, to_reward_batch


def brute_force_hd_size(width, height, hd_num=16):
    """Independent re-derivation of the HD_transform geometry spec."""
    import math

    transposed = width < height
    w, h = (height, width) if transposed else (width, height)
    ratio = w / h
    scale = 1
    while scale * math.ceil(scale / ratio) <= hd_num:
        scale += 1
    scale -= 1
    new_w = scale * 336
    new_h = int(new_w / ratio)
    pad_h = math.ceil(new_h / 336) * 336
    return (pad_h, new_w) if transposed else (new_w, pad_h)


@pytest.mark.parametrize(
    "w,h",
    [(640, 480), (480, 640), (1024, 1024), (1920, 1080), (336, 336), (100, 700), (5000, 400)],
)
def test_hd_geometry(w, h):
    assert calc_hd_transform_size(w, h) == brute_force_hd_size(w, h)


def test_num_img_tokens_formula():
    # 4x4 crops: (16+1)*144 + 1 + 5*12 = 2509 (SURVEY.md, processing:269)
    assert num_img_tokens_for(4 * 336, 4 * 336) == 2509
    assert num_img_tokens_for(336, 336) == 2 * 144 + 1 + 2 * 12


def test_max_budget():
    assert max_num_img_tokens(16) == num_img_tokens_for(16 * 336, 336)  # 16x1
    assert max_num_img_tokens(16) == 2653


def test_preprocess_image_shapes():
    from PIL import Image

    img = Image.fromarray(
        (np.random.default_rng(0).random((480, 640, 3)) * 255).astype(np.uint8)
    )
    pix, (h, w), n = preprocess_image(img, num_crops=16)
    assert pix.shape == (17, 336, 336, 3)
    assert (w, h) == calc_hd_transform_size(640, 480)
    assert n == num_img_tokens_for(h, w)
    hc, wc = h // 336, w // 336
    # crops beyond hc*wc are zero padding
    assert np.all(pix[1 + hc * wc :] == 0)
    # global image is not all zeros
    assert np.abs(pix[0]).sum() > 0


class FakeTokenizer:
    """Whitespace tokenizer with an HF-ish surface."""

    eos_token = "</s>"
    eos_token_id = 1
    pad_token_id = 0

    def __call__(self, text):
        toks = [hash(t) % 500 + 2 for t in text.split()]
        return {"input_ids": toks}

    def apply_chat_template(self, msgs, tokenize=False, add_generation_prompt=True):
        body = "".join(m["content"] for m in msgs)
        return f"<s>user {body} end " + "x" * 22


def test_processor_splice():
    from PIL import Image

    tok = FakeTokenizer()
    proc = Phi3VProcessor(tok, num_crops=4)
    img = Image.fromarray(np.zeros((400, 500, 3), np.uint8))
    text = "<|image_1|> describe this picture"
    s = proc(text, [img])
    n_img = s.num_img_tokens
    assert n_img == num_img_tokens_for(*s.image_size)
    # layout: [chunk0][img tokens][chunk1]
    n_text0 = len(tok(IMAGE_SPLIT := "")["input_ids"])  # empty prefix chunk
    assert (s.splice_idx >= 0).sum() == n_img
    img_pos = np.nonzero(s.splice_idx >= 0)[0]
    assert np.array_equal(s.splice_idx[img_pos], np.arange(n_img))
    assert np.all(s.attention_mask == 1)
    assert s.input_ids.shape == s.splice_idx.shape


def test_collate_left_pad():
    from PIL import Image

    tok = FakeTokenizer()
    proc = Phi3VProcessor(tok, num_crops=4)
    img = Image.fromarray(np.zeros((128, 128, 3), np.uint8))
    s1 = proc("<|image_1|> a cat", [img])
    s2 = proc("<|image_1|> a much longer description of a dog", [img])
    S = max(len(s1.input_ids), len(s2.input_ids)) + 7
    batch = collate_samples([s1, s2], seq_len=S, pad_token_id=tok.pad_token_id)
    assert batch["input_ids"].shape == (2, S)
    # left padding: padded prefix is 0-mask, suffix is valid
    n1 = len(s1.input_ids)
    assert np.all(batch["attention_mask"][0, : S - n1] == 0)
    assert np.all(batch["attention_mask"][0, S - n1 :] == 1)
    assert np.all(batch["input_ids"][0, : S - n1] == tok.pad_token_id)
    # splice indices preserved and shifted
    np.testing.assert_array_equal(batch["splice_idx"][0, S - n1 :], s1.splice_idx)
    rb = to_reward_batch(batch)
    assert rb.pixel_values.shape[0] == 2


def test_chat_template_slicing():
    tok = FakeTokenizer()
    out = apply_phi3v_chat_template(tok, "hello world")
    # trailing 22 filler chars removed, EOS appended
    assert out.endswith("</s>")
    assert "x" * 22 not in out
    assert "<|image_1|>" in out
