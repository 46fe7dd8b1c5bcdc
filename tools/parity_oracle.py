"""ORACLE side of the real-checkpoint parity proof: load the synthesized
full-size checkpoint through the REFERENCE'S vendored Phi3VForCausalLM
(modeling_phi3_v.py, imported from /root/reference) and reproduce
custom_forward exactly (rw_model_general_preference.py:334-448):

  - position_ids = cumsum(mask)-1, pad->1                   (:344-345)
  - forward(output_hidden_states=True); layer_id=32 -> last_hidden_state,
    vision_embedding = hidden_states[-1]                    (:349-353)
  - SkipCA: softmax(W_q(h) W_k(v)^T / sqrt(d)) W_v(v), residual +
    RMSNorm(ca_layernorm)                                   (:376-386)
  - GPM head, eval read-out: per-dim gather at the EOS index (:428-444)
  - preference prob sigma((c0*r1 - c1*r0)/tau)   (reward_adaptor_loader.py:174-181)

LoRA is merged into the base weights manually (W += B@A * alpha/r), the
algebraic identity of PEFT's merge_and_unload — our side merges through
io/lora instead, so agreement also validates the PEFT import path.

Inputs come from tools/parity_inputs.py (shared with the JAX side) so both
stacks consume bit-identical input_ids / pixel_values.

Writes oracle rewards to <out>/oracle.json. Runs on CPU fp32 (~minutes per
sequence at full size on one core).
"""

import argparse
import json
import math
import os
import sys
import time

import numpy as np
import torch
import torch.nn.functional as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, "/root/reference/llava_reward/models/base_mllm")


def load_oracle_model(base_dir: str, artifact_dir: str):
    from phi3_v.configuration_phi3_v import Phi3VConfig
    from phi3_v.modeling_phi3_v import Phi3VForCausalLM

    with open(os.path.join(base_dir, "config.json")) as f:
        cfg = Phi3VConfig(**json.load(f))
    cfg._attn_implementation = "eager"
    # the vendored model's legacy-cache path predates transformers 4.57's
    # DynamicCache API; reward scoring never uses the kv cache
    cfg.use_cache = False
    torch.manual_seed(0)
    model = Phi3VForCausalLM(cfg)
    sd = torch.load(
        os.path.join(base_dir, "pytorch_model.bin"),
        map_location="cpu", weights_only=True,
    )
    missing, unexpected = model.load_state_dict(sd, strict=False)
    # strict key accounting: the reference model must consume our synthetic
    # checkpoint exactly (rotary inv_freq buffers are generated, not stored)
    real_missing = [k for k in missing if "inv_freq" not in k]
    assert not real_missing, f"oracle missing keys: {real_missing[:5]}"
    assert not unexpected, f"oracle unexpected keys: {unexpected[:5]}"
    model = model.float().eval()

    # merge the PEFT LoRA adapter: W += B @ A * (alpha / r)
    lora = torch.load(
        os.path.join(artifact_dir, "lora", "adapter_model.bin"),
        map_location="cpu", weights_only=True,
    )
    with open(os.path.join(artifact_dir, "lora", "adapter_config.json")) as f:
        acfg = json.load(f)
    scale = acfg["lora_alpha"] / acfg["r"]
    merged = 0
    base_sd = model.state_dict()
    for k in list(lora):
        if not k.endswith("lora_A.weight"):
            continue
        tgt = k[len("base_model.model."):].replace(".lora_A.weight", ".weight")
        A = lora[k].float()
        B = lora[k.replace("lora_A", "lora_B")].float()
        base_sd[tgt] += (B @ A) * scale
        merged += 1
    model.load_state_dict(base_sd)
    print(f"merged {merged} LoRA deltas (scale {scale})")

    heads = torch.load(
        os.path.join(artifact_dir, "pytorch_model.bin"),
        map_location="cpu", weights_only=True,
    )
    heads = {k: v.float() for k, v in heads.items()}
    # ft-projector weights override the base (reward_adaptor_loader.py:46-60)
    proj_sd = {
        k: v for k, v in heads.items()
        if k.startswith("model.vision_embed_tokens.img_projection")
    }
    if proj_sd:
        base_sd = model.state_dict()
        for k, v in proj_sd.items():
            base_sd[k] = v
        model.load_state_dict(base_sd)
    return model, heads


def custom_forward_oracle(model, heads, batch, tau: float):
    """rw_model_general_preference.py:334-448, phi3v path, eval mode."""
    input_ids = torch.from_numpy(batch["input_ids"]).long()
    attention_mask = torch.from_numpy(batch["attention_mask"]).long()
    pixel_values = torch.from_numpy(batch["pixel_values"]).float()
    image_sizes = torch.from_numpy(batch["image_sizes"]).long()

    position_ids = attention_mask.long().cumsum(-1) - 1
    position_ids.masked_fill_(attention_mask == 0, 1)
    with torch.no_grad():
        outputs = model.model(
            input_ids, attention_mask=attention_mask, position_ids=position_ids,
            pixel_values=pixel_values, image_sizes=image_sizes,
            output_hidden_states=True,
        )
        h = outputs["last_hidden_state"]  # layer_id == 32
        vision = outputs["hidden_states"][-1][:, : outputs["hidden_states"][-1].shape[1], :]

        # SkipCA (:376-386)
        Wq, Wk, Wv = heads["W_q.weight"], heads["W_k.weight"], heads["W_v.weight"]
        Q = h @ Wq.T
        K = vision @ Wk.T
        V = vision @ Wv.T
        scores = torch.bmm(Q, K.transpose(1, 2)) / math.sqrt(vision.shape[2])
        attn = torch.bmm(F.softmax(scores, dim=-1), V)
        x = h + attn
        # Phi3RMSNorm (modeling_phi3_v.py:385-399): fp32 variance
        var = x.pow(2).mean(-1, keepdim=True)
        x = x * torch.rsqrt(var + 1e-5)
        h = heads["ca_layernorm.weight"] * x

        values = h @ heads["value_head.weight"].T  # (B, S, 2)
        eos = attention_mask.size(1) - 1 - attention_mask.long().fliplr().argmax(
            dim=1
        )
        eos = eos.unsqueeze(1)
        reward = torch.cat(
            [values[:, :, d].gather(dim=1, index=eos) for d in range(values.shape[-1])],
            dim=1,
        )  # (B, 2)
    return reward


def preference_prob(rc, rr, tau):
    """GPM dim-2: sigma((c0*r1 - c1*r0)/tau) (reward_adaptor_loader.py:174-181)."""
    return float(torch.sigmoid((rc[0] * rr[1] - rc[1] * rr[0]) / tau))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="scratch/fullsize")
    args = ap.parse_args()
    base = os.path.join(args.dir, "base")
    art = os.path.join(args.dir, "artifact")

    with open(os.path.join(args.dir, "inputs.npz"), "rb") as f:
        data = np.load(f, allow_pickle=True)
        batches = data["batches"].tolist()
    tau = 0.1

    model, heads = load_oracle_model(base, art)
    out = []
    for i, pair in enumerate(batches):
        t0 = time.time()
        rc = custom_forward_oracle(model, heads, pair["chosen"], tau)[0]
        rr = custom_forward_oracle(model, heads, pair["rejected"], tau)[0]
        prob = preference_prob(rc, rr, tau)
        out.append(
            {
                "pair": i,
                "chosen_reward": [float(x) for x in rc],
                "rejected_reward": [float(x) for x in rr],
                "prob_chosen": prob,
                "decision": prob > 0.5,
            }
        )
        print(f"pair {i}: rc={out[-1]['chosen_reward']} rr={out[-1]['rejected_reward']} "
              f"prob={prob:.6f} ({time.time()-t0:.0f}s)", flush=True)
    with open(os.path.join(args.dir, "oracle.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("oracle done ->", os.path.join(args.dir, "oracle.json"))


if __name__ == "__main__":
    main()
