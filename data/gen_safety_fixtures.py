"""Generate UnsafeBench/SMID-format pointwise safety datasets with synthetic
images.

The reference ships the UnsafeBench pointwise train JSONs
(/root/reference/data/Unsafebench/Unsafebench_{cap_,}train.json: 8109 rows of
{safety_label, category, source, path, label, prompt}) and the SMID test set
(/root/reference/data/smid_test.json: 2941 rows of {path, label, prompt}) —
but NOT the images, whose paths point at the authors' machine. This
generator reproduces the exact schemas with locally-rendered JPEGs so the
pointwise classification path (cls_fit / pointwise eval,
rm_trainer_general_preference.py:240-345, batch_inference_rm_phi.py:123-152)
can be exercised at any scale:

    python data/gen_safety_fixtures.py --out data/safety_fixtures \\
        --train 64 --test 32 [--seed 0]

The synthetic "unsafe" images are high-contrast noise, "safe" ones smooth
gradients, so a trained classifier has real signal to find.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

UNSAFEBENCH_CATEGORIES = (
    "Hate", "Harassment", "Violence", "Self-harm", "Sexual", "Shocking",
    "Illegal activity", "Deception", "Political", "Public and personal health",
    "Spam", "Privacy",
)
_SOURCES = ("Laion5B", "Lexica")


def _safe_image(rng, hw=(96, 128)):
    h, w = hw
    gy = np.broadcast_to(np.linspace(0, 1, h)[:, None], (h, w))
    gx = np.broadcast_to(np.linspace(0, 1, w)[None, :], (h, w))
    base = np.stack([gy * 0.5 + 0.3, gx * 0.5 + 0.2, (gx + gy) * 0.25 + 0.3], -1)
    img = base + rng.normal(0, 0.02, (h, w, 3))
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def _unsafe_image(rng, hw=(96, 128)):
    h, w = hw
    img = rng.random((h // 8, w // 8, 3))
    img = np.kron(img, np.ones((8, 8, 1)))  # blocky high-contrast noise
    img[::7] = 1.0 - img[::7]
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def generate(out_dir: str, n_train: int = 64, n_test: int = 32, seed: int = 0):
    """Write Unsafebench_train.json (UnsafeBench schema), smid_test.json
    (SMID schema) and the referenced JPEGs under ``out_dir``. Paths in the
    JSONs are relative to ``out_dir`` (use it as --image_root), unlike the
    reference's absolute paths — data/re_path.py exists for rewriting."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    img_dir = os.path.join(out_dir, "images")
    os.makedirs(img_dir, exist_ok=True)

    def render(i, label):
        arr = _safe_image(rng) if label == 1 else _unsafe_image(rng)
        rel = f"images/{i}.jpg"
        Image.fromarray(arr).save(os.path.join(out_dir, rel), quality=90)
        return rel

    # UnsafeBench train rows: label 1 == Safe (reference rows pair
    # safety_label "Safe" with label 1). The reference ships TWO variants
    # of the same 8109 rows (/root/reference/data/Unsafebench/): _train has
    # the source caption only where one existed (2283/8109 prompts empty),
    # _cap_train fills every prompt with a generated caption. Mirror that:
    # identical rows, prompt emptied for ~28% of them in the plain variant.
    train, cap_train = [], []
    for i in range(n_train):
        label = int(rng.random() < 0.5)
        row = {
            "safety_label": "Safe" if label == 1 else "Unsafe",
            "category": UNSAFEBENCH_CATEGORIES[
                int(rng.integers(len(UNSAFEBENCH_CATEGORIES)))],
            "source": _SOURCES[int(rng.integers(2))],
            "path": render(f"train_{i}", label),
            "label": label,
            "prompt": f"a user-submitted image number {i}",
        }
        cap_train.append(row)
        train.append(
            dict(row, prompt="") if rng.random() < 2283 / 8109 else row
        )
    with open(os.path.join(out_dir, "Unsafebench_train.json"), "w") as f:
        json.dump(train, f, indent=4)
    with open(os.path.join(out_dir, "Unsafebench_cap_train.json"), "w") as f:
        json.dump(cap_train, f, indent=4)

    # SMID test rows: empty prompt, just {path, label, prompt}
    test = []
    for i in range(n_test):
        label = int(rng.random() < 0.55)
        test.append({
            "path": render(f"test_{i}", label),
            "label": label,
            "prompt": "",
        })
    with open(os.path.join(out_dir, "smid_test.json"), "w") as f:
        json.dump(test, f, indent=4)
    return out_dir


def generate_reference_layout(data_dir: str, n_train: int, n_test: int,
                              seed: int = 0):
    """Write the files at the reference's shipped-data paths
    (/root/reference/data/): Unsafebench/Unsafebench_{cap_,}train.json and
    smid_test.json, images under <data_dir>/safety_images. JSON paths are
    relative to <data_dir> (pass it as --image_root)."""
    import shutil

    tmp = os.path.join(data_dir, "_safety_tmp")
    generate(tmp, n_train, n_test, seed)

    img_dst = os.path.join(data_dir, "safety_images")
    if os.path.isdir(img_dst):
        shutil.rmtree(img_dst)
    shutil.move(os.path.join(tmp, "images"), img_dst)

    def rewrite(src, dst):
        rows = json.load(open(os.path.join(tmp, src)))
        for r in rows:
            r["path"] = r["path"].replace("images/", "safety_images/", 1)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        with open(dst, "w") as f:
            json.dump(rows, f, indent=4)

    ub = os.path.join(data_dir, "Unsafebench")
    rewrite("Unsafebench_train.json",
            os.path.join(ub, "Unsafebench_train.json"))
    rewrite("Unsafebench_cap_train.json",
            os.path.join(ub, "Unsafebench_cap_train.json"))
    rewrite("smid_test.json", os.path.join(data_dir, "smid_test.json"))
    shutil.rmtree(tmp)
    return data_dir


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="data/safety_fixtures")
    p.add_argument("--train", type=int, default=64)
    p.add_argument("--test", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--layout", choices=("flat", "reference"), default="flat",
                   help="'reference' mirrors /root/reference/data/ paths "
                        "under --out")
    a = p.parse_args()
    if a.layout == "reference":
        generate_reference_layout(a.out, a.train, a.test, a.seed)
    else:
        generate(a.out, a.train, a.test, a.seed)
    print(f"wrote {a.train} train + {a.test} test rows under {a.out}")
