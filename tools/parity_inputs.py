"""Shared inputs for the full-size parity proof.

Builds, for N pairs from data/sample_test, bit-identical inputs in BOTH
layouts:
  - 'hf':   input_ids with -1 at image positions (processing_phi3_v.py:
            407-454 negative-id splice), left-padded + attention_mask,
            pixel_values (num_images, crops+1, 3, 336, 336) CLIP-normalised,
            image_sizes (num_images, 2)
  - 'ours': RewardBatch arrays (splice_idx / img_gather_idx layout,
            channels-last pixel bank)

Images go through OUR preprocess_image (the bicubic is torch-parity tested
to 3e-7, tests/test_processor.py); prompt token ids are seeded randoms (a
real tokenizer adds nothing to numerical parity and the published vocab is
unreachable without egress).

Writes <out>/inputs.npz with a list of {chosen, rejected} dicts per layout.
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from llava_reward_tpu.preprocess.phi3v_processor import (  # noqa: E402
    build_img_gather_idx,
    preprocess_image,
)

PAD_ID = 32000
EOS_ID = 2


def build_sample(image_path: str, rng, num_crops: int, seq_len: int):
    from PIL import Image

    img = Image.open(image_path).convert("RGB")
    pixel, (h, w), n_tok = preprocess_image(img, num_crops=num_crops)
    hc, wc = h // 336, w // 336
    gather = build_img_gather_idx(hc, wc, num_crops, budget=n_tok).astype(np.int32)

    n_prompt = 24
    prompt_ids = rng.integers(3, 31000, n_prompt).astype(np.int32)
    # [bos-ish text] [image tokens] [text tail + eos]
    ids = np.concatenate([
        prompt_ids[:8],
        np.zeros(n_tok, np.int32),
        prompt_ids[8:],
        np.asarray([EOS_ID], np.int32),
    ])
    splice = np.concatenate([
        np.full(8, -1, np.int32),
        np.arange(n_tok, dtype=np.int32),
        np.full(n_prompt - 8 + 1, -1, np.int32),
    ])
    s = len(ids)
    assert s <= seq_len, (s, seq_len)
    pad = seq_len - s
    ids_p = np.concatenate([np.full(pad, PAD_ID, np.int32), ids])
    splice_p = np.concatenate([np.full(pad, -1, np.int32), splice])
    mask = np.concatenate([np.zeros(pad, np.int32), np.ones(s, np.int32)])

    ours = {
        "input_ids": ids_p[None],
        "attention_mask": mask[None],
        "pixel_values": pixel[None],  # (1, crops+1, 336, 336, 3) f32
        "img_gather_idx": gather[None],
        "splice_idx": splice_p[None],
        "num_img_tokens": np.asarray([n_tok], np.int32),
    }
    hf_ids = np.where(splice_p >= 0, -1, ids_p).astype(np.int64)[None]
    hf = {
        "input_ids": hf_ids,
        "attention_mask": mask[None].astype(np.int64),
        "pixel_values": np.ascontiguousarray(
            pixel.transpose(0, 3, 1, 2)
        )[None],  # (1, crops+1, 3, 336, 336)
        "image_sizes": np.asarray([[h, w]], np.int64),
    }
    return ours, hf, (h, w, n_tok)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="scratch/fullsize")
    ap.add_argument("--pairs", type=int, default=2)
    ap.add_argument("--num_crops", type=int, default=16)
    ap.add_argument("--seq_len", type=int, default=0, help="0 = auto")
    args = ap.parse_args()

    with open(os.path.join(REPO, "data/sample_test/pairwise_sample.json")) as f:
        rows = json.load(f)
    rng = np.random.default_rng(42)

    specs = []
    raw = []
    for row in rows[: args.pairs]:
        for side in ("chosen_path", "reject_path"):
            path = os.path.join(REPO, row[side])  # repo-relative sample paths
            assert os.path.exists(path), path
            raw.append(path)
    # auto seq: max tokens + prompt + pad margin, rounded to 64
    probe = [build_sample(p, np.random.default_rng(0), args.num_crops, 8192)[2] for p in raw]
    need = max(t[2] for t in probe) + 25
    seq_len = args.seq_len or ((need + 63) // 64 + 1) * 64
    print("geometries:", probe, "-> seq_len", seq_len)

    batches = []
    it = iter(raw)
    for i in range(args.pairs):
        pc, hc_, _ = build_sample(next(it), rng, args.num_crops, seq_len)
        pr, hr, _ = build_sample(next(it), rng, args.num_crops, seq_len)
        batches.append({
            "chosen": hc_, "rejected": hr,          # oracle layout
            "chosen_ours": pc, "rejected_ours": pr,  # jax layout
        })
    os.makedirs(args.out, exist_ok=True)
    np.savez(os.path.join(args.out, "inputs.npz"),
             batches=np.asarray(batches, dtype=object))
    print(f"{len(batches)} pairs -> {args.out}/inputs.npz")


if __name__ == "__main__":
    main()
