"""Side-by-side parity vs the REFERENCE'S OWN vendored torch model
(/root/reference/.../modeling_phi3_v.py) through the full checkpoint
contract: synthesized HF checkpoint (exact state-dict layout, bf16) +
LLaVA-Reward artifact (PEFT LoRA + heads + SkipCA + ft-projector) loaded by
BOTH stacks, scored on real sample images.

This is the CI-sized variant (2 decoder layers, full 3072 width, full
ViT-L/14-336 tower, 1x1-crop images) of the full-size proof in PARITY.md
(tools/synth_fullsize.py / parity_oracle.py / parity_ours.py)."""

import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference checkout not present"
)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    import synth_fullsize
    from PIL import Image

    d = tmp_path_factory.mktemp("oracle_parity")
    synth_fullsize.synth_base(str(d / "base"), layers=2)
    synth_fullsize.synth_artifact(str(d / "artifact"), layers=2, rank=16)

    # 1x1-crop geometry: downscale two sample images below 336px
    src = os.path.join(REPO, "data", "sample_test", "sample_img")
    jpgs = sorted(p for p in os.listdir(src) if p.endswith((".jpg", ".png")))[:2]
    paths = []
    for i, name in enumerate(jpgs):
        im = Image.open(os.path.join(src, name)).convert("RGB")
        im = im.resize((320, 256))
        p = str(d / f"img{i}.jpg")
        im.save(p, quality=92)
        paths.append(p)
    return str(d), paths


def _build_inputs(paths, num_crops=1):  # 1x1 geometry: 313 img tokens, CPU-fast
    import parity_inputs

    rng = np.random.default_rng(42)
    ours_c, hf_c, _ = parity_inputs.build_sample(paths[0], rng, num_crops, 384)
    ours_r, hf_r, _ = parity_inputs.build_sample(paths[1], rng, num_crops, 384)
    return {"chosen": hf_c, "rejected": hf_r,
            "chosen_ours": ours_c, "rejected_ours": ours_r}


def test_reference_oracle_parity(workdir):
    d, paths = workdir
    base, art = os.path.join(d, "base"), os.path.join(d, "artifact")
    pair = _build_inputs(paths)

    # --- oracle: reference torch model, fp32 ---
    import parity_oracle

    model, heads = parity_oracle.load_oracle_model(base, art)
    rc = parity_oracle.custom_forward_oracle(model, heads, pair["chosen"], 0.1)[0]
    rr = parity_oracle.custom_forward_oracle(model, heads, pair["rejected"], 0.1)[0]
    prob_oracle = parity_oracle.preference_prob(rc, rr, 0.1)
    del model

    # --- ours: real loading path + jitted forward, fp32 CPU ---
    import jax.numpy as jnp

    from llava_reward_tpu.evalx.adaptor import load_reward_adaptor
    from llava_reward_tpu.reward.model import RewardBatch
    from llava_reward_tpu.reward.preference import preference_prob

    adaptor = load_reward_adaptor(base, art, model_type="phi3v", ft_projector=True)
    adaptor.rcfg.layer_id = adaptor.cfg.decoder.num_layers
    assert adaptor.rcfg.is_general_preference and adaptor.rcfg.value_head_dim == 2
    score = adaptor.make_score_fn(attn_impl="xla", training=False)

    rewards = {}
    for side in ("chosen", "rejected"):
        b = pair[f"{side}_ours"]
        batch = RewardBatch(
            input_ids=jnp.asarray(b["input_ids"]),
            attention_mask=jnp.asarray(b["attention_mask"]),
            pixel_values=jnp.asarray(b["pixel_values"]),
            img_gather_idx=jnp.asarray(b["img_gather_idx"]),
            splice_idx=jnp.asarray(b["splice_idx"]),
            num_img_tokens=jnp.asarray(b["num_img_tokens"]),
        )
        rewards[side] = np.asarray(score(adaptor.params, batch), np.float32)[0]

    ours_prob = float(preference_prob(
        jnp.asarray(rewards["chosen"][None]), jnp.asarray(rewards["rejected"][None]),
        is_general_preference=True, value_head_dim=2, tau=0.1,
    )[0])

    rc_np, rr_np = rc.numpy(), rr.numpy()
    dev = max(
        np.abs(rewards["chosen"] - rc_np).max(),
        np.abs(rewards["rejected"] - rr_np).max(),
    )
    # north-star numerical budget (BASELINE.md): <= 1e-3 reward deviation
    assert dev <= 1e-3, (rewards, rc_np, rr_np)
    assert (ours_prob > 0.5) == (prob_oracle > 0.5)
    assert abs(ours_prob - prob_oracle) < 1e-3
