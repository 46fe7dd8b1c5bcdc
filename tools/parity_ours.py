"""OUR side of the full-size parity proof: load the synthesized base
checkpoint + reward artifact through the REAL loading path
(evalx.adaptor.load_reward_adaptor: torch .bin reader, fused-layout
conversion, PEFT adapter import + merge-at-load, head/projector re-keying)
and score the shared inputs with the jitted reward forward.

Runs either on CPU fp32 (--platform cpu: exactness vs the fp32 torch
oracle) or the default device bf16 (--platform device: the production
configuration). Writes <out>/ours_<tag>.json.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="scratch/fullsize")
    ap.add_argument("--platform", default="cpu",
                    choices=["cpu", "device", "int8"])
    args = ap.parse_args()

    import jax

    quantize = None
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
        dtype_tag, compute_dtype = "f32", None
    elif args.platform == "int8":
        # the --load_in_8bit production configuration: w8a8 decoder on the
        # int8 MXU path, bf16 everything else
        import jax.numpy as jnp

        dtype_tag, compute_dtype, quantize = "int8", jnp.bfloat16, "w8a8"
    else:
        import jax.numpy as jnp

        dtype_tag, compute_dtype = "bf16", jnp.bfloat16

    import jax.numpy as jnp

    from llava_reward_tpu.evalx.adaptor import load_reward_adaptor
    from llava_reward_tpu.reward.model import RewardBatch
    from llava_reward_tpu.reward.preference import preference_prob

    base = os.path.join(args.dir, "base")
    art = os.path.join(args.dir, "artifact")
    t0 = time.time()
    adaptor = load_reward_adaptor(
        base, art, model_type="phi3v", ft_projector=True,
        compute_dtype=compute_dtype, quantize=quantize,
    )
    adaptor.rcfg.layer_id = adaptor.cfg.decoder.num_layers
    print(f"loaded in {time.time()-t0:.0f}s; tau={adaptor.rcfg.general_preference_tau} "
          f"dim={adaptor.rcfg.value_head_dim} ca={adaptor.rcfg.add_cross_attention}",
          flush=True)
    score = adaptor.make_score_fn(attn_impl="auto", training=False)

    data = np.load(os.path.join(args.dir, "inputs.npz"), allow_pickle=True)
    batches = data["batches"].tolist()
    tau = adaptor.rcfg.general_preference_tau

    out = []
    for i, pair in enumerate(batches):
        rew = {}
        t0 = time.time()
        for side in ("chosen", "rejected"):
            b = pair[f"{side}_ours"]
            px = b["pixel_values"]
            if compute_dtype is not None:
                px = px.astype(np.float32)  # cast on device after transfer
            batch = RewardBatch(
                input_ids=jnp.asarray(b["input_ids"]),
                attention_mask=jnp.asarray(b["attention_mask"]),
                pixel_values=jnp.asarray(px).astype(compute_dtype or jnp.float32),
                img_gather_idx=jnp.asarray(b["img_gather_idx"]),
                splice_idx=jnp.asarray(b["splice_idx"]),
                num_img_tokens=jnp.asarray(b["num_img_tokens"]),
            )
            rew[side] = np.asarray(score(adaptor.params, batch), np.float32)[0]
        prob = float(preference_prob(
            jnp.asarray(rew["chosen"][None]), jnp.asarray(rew["rejected"][None]),
            is_general_preference=adaptor.rcfg.is_general_preference,
            value_head_dim=adaptor.rcfg.value_head_dim, tau=tau,
        )[0])
        out.append({
            "pair": i,
            "chosen_reward": [float(x) for x in rew["chosen"]],
            "rejected_reward": [float(x) for x in rew["rejected"]],
            "prob_chosen": prob,
            "decision": prob > 0.5,
        })
        print(f"pair {i}: rc={out[-1]['chosen_reward']} rr={out[-1]['rejected_reward']} "
              f"prob={prob:.6f} ({time.time()-t0:.0f}s)", flush=True)

    path = os.path.join(args.dir, f"ours_{dtype_tag}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("ours done ->", path)


if __name__ == "__main__":
    main()
