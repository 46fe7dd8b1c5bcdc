"""Reward-forward throughput benchmark (the reference's only perf
instrumentation is wall-clock around custom_forward,
eval/batch_inference_rm_phi.py:92-102 — this is its TPU equivalent).

Measures image-text PAIRS/sec/chip for the full-size Phi-3.5-V reward
forward (4.2B decoder + CLIP ViT-L/14-336 on 17 crops, bf16, GPM dim-2 +
SkipCA, seq 2560 covering the 4x4-crop 2509-token image budget).

vs_baseline is computed against BASELINE_PAIRS_PER_SEC — an ESTIMATE, not a
measurement (no GPU exists in this environment and the reference repo
publishes no numbers, BASELINE.md). Derivation (documented + emitted in the
JSON as baseline_provenance):

  per-pair FLOPs  = 2 seqs x [decoder 2*4.2e9 params*2560 tok = 21.5 TF
                    + CLIP 17 crops * 2*0.303e9*577 = 6.0 TF] = 55 TF
  A100-80GB bf16 dense peak = 312 TF/s; HF eager + flash-attn-2 inference
  lands at 30-40% MFU on decoder-dominated workloads
  -> 312*0.35/55 = 2.0 pairs/s (range 1.7-2.3 at 30-40% MFU).

The sensitivity range rides in baseline_range. A measured replacement needs
GPU hardware: run eval/batch_inference_rm_phi.py (its :92-102 timing hook)
on the published HF checkpoints and substitute the measured pairs/s here.

Env knobs: BENCH_BATCH (pairs, default 4), BENCH_STEPS (default 8),
BENCH_SEQ (default 2560), BENCH_TINY=1 for a smoke run on CPU,
BENCH_E2E=1 for the end-to-end pipeline (image decode + HD preprocessing
overlapped with device compute via the prefetch loader — the
batch_inference_rm_phi.py-equivalent measurement).
"""

import json
import os
import time

import numpy as np

BASELINE_PAIRS_PER_SEC = 2.0


def e2e_main():
    """Synthetic-image end-to-end eval throughput: host pipeline (native C++
    decode+HD when built) overlapped with the jitted forward."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from llava_reward_tpu.core.config import (
        RewardConfig,
        phi35_vision_config,
        phi3v_tiny_config,
    )
    from llava_reward_tpu.evalx.adaptor import RewardAdaptor
    from llava_reward_tpu.evalx.batch_inference import batch_rm_inference
    from llava_reward_tpu.models import phi3v
    from llava_reward_tpu.preprocess.phi3v_processor import Phi3VProcessor
    from llava_reward_tpu.reward import init_head_params

    tiny = os.environ.get("BENCH_TINY") == "1"
    pairs = int(os.environ.get("BENCH_BATCH", "2" if tiny else "4"))
    n_pairs = int(os.environ.get("BENCH_SAMPLES", "8" if tiny else "32"))
    seq = int(os.environ.get("BENCH_SEQ", "512" if tiny else "2944"))

    cfg = phi3v_tiny_config(num_crops=4) if tiny else phi35_vision_config()
    rcfg = RewardConfig(
        is_general_preference=True, value_head_dim=2, add_cross_attention=True,
        layer_id=cfg.decoder.num_layers,
    )
    dtype = jnp.float32 if tiny else jnp.bfloat16
    params = {
        "backbone": phi3v.init_params(jax.random.PRNGKey(0), cfg, dtype=dtype),
        "head": init_head_params(jax.random.PRNGKey(1), cfg, rcfg, dtype=dtype),
    }
    adaptor = RewardAdaptor(cfg=cfg, rcfg=rcfg, params=params, model_type="phi3v")

    class Tok:
        eos_token = "</s>"

        def __call__(self, text):
            return {"input_ids": [hash(t) % 30000 + 5 for t in text.split()]}

        def apply_chat_template(self, msgs, tokenize=False, add_generation_prompt=True):
            return "".join(m["content"] for m in msgs) + " " + "x" * 22

    tok = Tok()
    # the production path: u8 crops + device-side normalise/global-bicubic
    proc = Phi3VProcessor(
        tok, num_crops=cfg.num_crops,
        device_preproc=os.environ.get("LRT_DEVICE_PREPROC", "1") != "0",
    )

    # synthetic jpegs on disk (realistic decode work)
    import tempfile

    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp()
    rows = []
    for i in range(n_pairs):
        for side in ("c", "r"):
            # one image shape -> one crop bucket -> one compiled program
            arr = (rng.random((768, 1024, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(f"{tmp}/{i}{side}.jpg", quality=90)
        rows.append(
            {
                "prompt": f"a richly detailed scene number {i}",
                "chosen_path": f"{i}c.jpg",
                "reject_path": f"{i}r.jpg",
                "c_rate": 1.0,
                "r_rate": 0.0,
            }
        )
    # warm the compile with the first batch, then measure the full pass
    t0 = time.perf_counter()
    metrics = batch_rm_inference(
        adaptor, rows, tok, proc, batch_size=pairs, seq_len=seq,
        image_root=tmp, num_workers=int(os.environ.get("BENCH_WORKERS", "8")),
        progress=False,
    )
    dt = time.perf_counter() - t0
    value = len(rows) / dt
    print(
        json.dumps(
            {
                "metric": "phi35v_e2e_eval_pairs_per_sec_per_chip",
                "value": round(value, 4),
                "unit": "pairs/s/chip",
                "vs_baseline": round(value / BASELINE_PAIRS_PER_SEC, 4),
            }
        )
    )


def main():
    import jax

    try:  # persistent compile cache works through the axon tunnel (CLAUDE.md)
        jax.config.update("jax_compilation_cache_dir", "/root/jaxcache")
    except Exception:
        pass
    import jax.numpy as jnp

    from llava_reward_tpu.core.config import (
        RewardConfig,
        phi35_vision_config,
        phi3v_tiny_config,
        replace,
    )
    from llava_reward_tpu.models import phi3v
    from llava_reward_tpu.preprocess.phi3v_processor import build_img_gather_idx
    from llava_reward_tpu.reward import init_head_params
    from llava_reward_tpu.reward.model import RewardBatch, reward_forward

    tiny = os.environ.get("BENCH_TINY") == "1"
    pairs = int(os.environ.get("BENCH_BATCH", "2" if tiny else "4"))
    steps = int(os.environ.get("BENCH_STEPS", "2" if tiny else "8"))
    seq = int(os.environ.get("BENCH_SEQ", "384" if tiny else "2560"))

    if tiny:
        cfg = phi3v_tiny_config(num_crops=4)
    else:
        cfg = phi35_vision_config()
    rcfg = RewardConfig(
        is_general_preference=True,
        value_head_dim=2,
        add_cross_attention=True,
        layer_id=cfg.decoder.num_layers,
    )

    key = jax.random.PRNGKey(0)
    params = {
        "backbone": phi3v.init_params(key, cfg, dtype=jnp.bfloat16),
        "head": init_head_params(jax.random.PRNGKey(1), cfg, rcfg, dtype=jnp.bfloat16),
    }

    # 4x4-crop image geometry (the dominant real case): 2509 image tokens
    rng = np.random.default_rng(0)
    B = pairs * 2  # chosen + rejected per pair
    nc = cfg.num_crops
    hc = wc = min(4, int(np.sqrt(nc)))
    n_img = (hc * wc + 1) * 144 + 1 + (hc + 1) * 12
    if n_img > seq - 16:  # fall back to a 1x1 geometry on small seq budgets
        hc = wc = 1
        n_img = 2 * 144 + 1 + 2 * 12
    assert n_img <= seq - 16, (n_img, seq)
    gidx = build_img_gather_idx(hc, wc, nc, budget=n_img)

    ids = rng.integers(2, cfg.decoder.vocab_size - 2, (B, seq)).astype(np.int32)
    splice = np.full((B, seq), -1, np.int32)
    splice[:, 1 : 1 + n_img] = np.arange(n_img)
    crop = cfg.vision.image_size
    batch = RewardBatch(
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.asarray(np.ones((B, seq), np.int32)),
        pixel_values=jnp.asarray(
            (rng.standard_normal((B, nc + 1, crop, crop, 3)) * 0.5).astype(np.float32)
        ),
        img_gather_idx=jnp.asarray(np.tile(gidx[None], (B, 1))),
        splice_idx=jnp.asarray(splice),
        num_img_tokens=jnp.full((B,), n_img, np.int32),
    )

    @jax.jit
    def fwd(p, b):
        return reward_forward(p, cfg, rcfg, b, training=False).reward

    # Distinct inputs per timed step: the axon backend memoises identical
    # (executable, args) dispatches, so repeating one batch measures nothing.
    import jax as _jax

    batches = []
    for s in range(steps):
        new_ids = jnp.asarray(
            rng.integers(2, cfg.decoder.vocab_size - 2, (B, seq)).astype(np.int32)
        )
        batches.append(batch._replace(input_ids=new_ids))

    # NB: block_until_ready is lazy on the tunnelled axon backend — fetching
    # the (tiny) result to host is the only reliable completion barrier.
    np.asarray(fwd(params, batch))  # compile + execute
    times = []
    for s in range(steps):
        t0 = time.perf_counter()
        np.asarray(fwd(params, batches[s]))
        times.append(time.perf_counter() - t0)

    pairs_per_sec = pairs / float(np.median(times))
    n_chips = 1  # bench runs single-chip
    value = pairs_per_sec / n_chips
    print(
        json.dumps(
            {
                "metric": "phi35v_reward_forward_pairs_per_sec_per_chip",
                "value": round(value, 4),
                "unit": "pairs/s/chip",
                "vs_baseline": round(value / BASELINE_PAIRS_PER_SEC, 4),
                "baseline": BASELINE_PAIRS_PER_SEC,
                "baseline_provenance": "estimated: 55 TF/pair at 35% MFU of "
                "A100-312TF/s (see module docstring; no GPU in env to measure)",
                "baseline_range_pairs_per_sec": [1.7, 2.3],
            }
        )
    )


if __name__ == "__main__":
    if os.environ.get("BENCH_E2E") == "1":
        e2e_main()
    else:
        main()
