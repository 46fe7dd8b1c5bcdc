"""Synthesize a FULL-SIZE Phi-3.5-vision HF checkpoint + LLaVA-Reward
artifact with seeded random bf16 weights, for the real-checkpoint parity
proof (PARITY.md).

With zero network egress the published weights are unreachable, so the proof
uses a full-size random-init checkpoint laid out EXACTLY like
microsoft/Phi-3.5-vision-instruct (same state-dict key names, fused
qkv/gate_up layouts, su-rope config.json) and validates it by loading it
through the REFERENCE'S OWN vendored Phi3VForCausalLM
(/root/reference/llava_reward/models/base_mllm/phi3_v/modeling_phi3_v.py)
with strict key checking — any naming/layout drift fails the oracle load.

The reward artifact mirrors save_model_lora's output exactly
(deepspeed.py:333-417): pytorch_model.bin {value_head, W_q/k/v,
ca_layernorm, img_projection}, lora/ PEFT adapter (r=128 on
qkv/o/gate_up/down), reward_config.yaml.

Usage: python tools/synth_fullsize.py [--out scratch/fullsize] [--layers 32]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_config(layers: int) -> dict:
    rng = np.random.default_rng(1234)
    half_rot = 3072 // 32 // 2  # head_dim 96 -> 48 su factors
    return {
        "architectures": ["Phi3VForCausalLM"],
        "model_type": "phi3_v",
        "vocab_size": 32064,
        "hidden_size": 3072,
        "intermediate_size": 8192,
        "num_hidden_layers": layers,
        "num_attention_heads": 32,
        "num_key_value_heads": 32,
        "hidden_act": "silu",
        "max_position_embeddings": 131072,
        "original_max_position_embeddings": 4096,
        "rope_theta": 10000.0,
        "rope_scaling": {
            "type": "su",
            "short_factor": [round(float(x), 4) for x in rng.uniform(1.0, 1.3, half_rot)],
            "long_factor": [round(float(x), 4) for x in rng.uniform(1.5, 3.0, half_rot)],
        },
        "sliding_window": 131072,
        "rms_norm_eps": 1e-5,
        "embd_pdrop": 0.0,
        "resid_pdrop": 0.0,
        "attention_dropout": 0.0,
        "attention_bias": False,
        "initializer_range": 0.02,
        "tie_word_embeddings": False,
        "bos_token_id": 1,
        "eos_token_id": 2,
        "pad_token_id": 32000,
        "torch_dtype": "bfloat16",
        "embd_layer": {
            "embedding_cls": "image",
            "hd_transform_order": "sub_glb",
            "projection_cls": "mlp",
            "use_hd_transform": True,
            "with_learnable_separator": True,
        },
        "img_processor": {
            "image_dim_out": 1024,
            "model_name": "openai/clip-vit-large-patch14-336",
            "name": "clip_vision_model",
            "num_img_tokens": 144,
            "layer_idx": -2,
            "type_feature": "patch",
        },
    }


def synth_base(out_dir: str, layers: int, seed: int = 0) -> None:
    import torch

    rng = np.random.default_rng(seed)
    H, I, V = 3072, 8192, 32064
    CH, CI, CL = 1024, 4096, 24  # CLIP ViT-L/14-336

    def w(*shape, std=0.02):
        return torch.from_numpy(
            (rng.standard_normal(shape) * std).astype(np.float32)
        ).to(torch.bfloat16)

    def ones(*shape):
        return torch.ones(shape, dtype=torch.bfloat16)

    def zeros(*shape):
        return torch.zeros(shape, dtype=torch.bfloat16)

    sd = {}
    sd["model.embed_tokens.weight"] = w(V, H)
    # Phi3ImageEmbedding holds the shared text embedding as .wte
    # (modeling_phi3_v.py:121-133); the HF checkpoint stores both keys
    sd["model.vision_embed_tokens.wte.weight"] = sd["model.embed_tokens.weight"]
    for i in range(layers):
        p = f"model.layers.{i}"
        sd[f"{p}.input_layernorm.weight"] = ones(H)
        sd[f"{p}.self_attn.qkv_proj.weight"] = w(3 * H, H)
        sd[f"{p}.self_attn.o_proj.weight"] = w(H, H)
        sd[f"{p}.post_attention_layernorm.weight"] = ones(H)
        sd[f"{p}.mlp.gate_up_proj.weight"] = w(2 * I, H)
        sd[f"{p}.mlp.down_proj.weight"] = w(H, I)
    sd["model.norm.weight"] = ones(H)
    sd["lm_head.weight"] = w(V, H)

    c = "model.vision_embed_tokens.img_processor.vision_model"
    sd[f"{c}.embeddings.class_embedding"] = w(CH)
    sd[f"{c}.embeddings.patch_embedding.weight"] = w(CH, 3, 14, 14)
    sd[f"{c}.embeddings.position_embedding.weight"] = w(577, CH)
    sd[f"{c}.pre_layrnorm.weight"] = ones(CH)
    sd[f"{c}.pre_layrnorm.bias"] = zeros(CH)
    for i in range(CL):
        p = f"{c}.encoder.layers.{i}"
        for ln in ("layer_norm1", "layer_norm2"):
            sd[f"{p}.{ln}.weight"] = ones(CH)
            sd[f"{p}.{ln}.bias"] = zeros(CH)
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[f"{p}.self_attn.{proj}.weight"] = w(CH, CH)
            sd[f"{p}.self_attn.{proj}.bias"] = zeros(CH)
        sd[f"{p}.mlp.fc1.weight"] = w(CI, CH)
        sd[f"{p}.mlp.fc1.bias"] = zeros(CI)
        sd[f"{p}.mlp.fc2.weight"] = w(CH, CI)
        sd[f"{p}.mlp.fc2.bias"] = zeros(CH)
    sd[f"{c}.post_layernorm.weight"] = ones(CH)
    sd[f"{c}.post_layernorm.bias"] = zeros(CH)

    sd["model.vision_embed_tokens.glb_GN"] = w(1, 1, 4 * CH)
    sd["model.vision_embed_tokens.sub_GN"] = w(1, 1, 1, 4 * CH)
    sd["model.vision_embed_tokens.img_projection.0.weight"] = w(H, 4 * CH)
    sd["model.vision_embed_tokens.img_projection.0.bias"] = zeros(H)
    sd["model.vision_embed_tokens.img_projection.2.weight"] = w(H, H)
    sd["model.vision_embed_tokens.img_projection.2.bias"] = zeros(H)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(synth_config(layers), f, indent=1)
    torch.save(sd, os.path.join(out_dir, "pytorch_model.bin"))
    n = sum(v.numel() for v in sd.values())
    print(f"base checkpoint: {n/1e9:.2f}B params -> {out_dir}")


def synth_artifact(out_dir: str, layers: int, rank: int = 128, seed: int = 1) -> None:
    """Reward artifact exactly as save_model_lora writes it
    (deepspeed.py:333-417): heads + SkipCA + projector in pytorch_model.bin,
    PEFT lora/ dir, 4-key reward_config.yaml."""
    import torch

    rng = np.random.default_rng(seed)
    H = 3072

    def t(*shape, std=0.02):
        return torch.from_numpy(
            (rng.standard_normal(shape) * std).astype(np.float32)
        ).to(torch.bfloat16)

    sd = {
        "value_head.weight": t(2, H),
        "W_q.weight": t(H, H),
        "W_k.weight": t(H, H),
        "W_v.weight": t(H, H),
        "ca_layernorm.weight": torch.ones(H, dtype=torch.bfloat16),
        "model.vision_embed_tokens.img_projection.0.weight": t(H, 4096),
        "model.vision_embed_tokens.img_projection.0.bias": t(H, std=0.01),
        "model.vision_embed_tokens.img_projection.2.weight": t(H, H),
        "model.vision_embed_tokens.img_projection.2.bias": t(H, std=0.01),
    }
    os.makedirs(out_dir, exist_ok=True)
    torch.save(sd, os.path.join(out_dir, "pytorch_model.bin"))

    lora_dir = os.path.join(out_dir, "lora")
    os.makedirs(lora_dir, exist_ok=True)
    lora_sd = {}
    shapes = {"qkv_proj": 3 * H, "o_proj": H, "gate_up_proj": 2 * 8192, "down_proj": H}
    ins = {"qkv_proj": H, "o_proj": H, "gate_up_proj": H, "down_proj": 8192}
    for i in range(layers):
        for mod in shapes:
            base = f"base_model.model.model.layers.{i}"
            sub = "self_attn" if "proj" in mod and mod in ("qkv_proj", "o_proj") else "mlp"
            key = f"{base}.{sub}.{mod}"
            lora_sd[f"{key}.lora_A.weight"] = t(rank, ins[mod], std=0.02)
            lora_sd[f"{key}.lora_B.weight"] = t(shapes[mod], rank, std=0.02)
    torch.save(lora_sd, os.path.join(lora_dir, "adapter_model.bin"))
    with open(os.path.join(lora_dir, "adapter_config.json"), "w") as f:
        json.dump(
            {
                "peft_type": "LORA",
                "r": rank,
                "lora_alpha": 256,
                "lora_dropout": 0.05,
                "target_modules": ["qkv_proj", "o_proj", "gate_up_proj", "down_proj"],
                "task_type": "CAUSAL_LM",
                "base_model_name_or_path": "microsoft/Phi-3.5-vision-instruct",
            },
            f,
            indent=1,
        )
    with open(os.path.join(out_dir, "reward_config.yaml"), "w") as f:
        f.write(
            "add_cross_attention: true\n"
            "general_preference_tau: 0.1\n"
            "is_general_preference: true\n"
            "value_head_dim: 2\n"
        )
    print(f"reward artifact (LoRA r={rank}) -> {out_dir}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="scratch/fullsize")
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--lora_rank", type=int, default=128)
    args = ap.parse_args()
    synth_base(os.path.join(args.out, "base"), args.layers)
    synth_artifact(os.path.join(args.out, "artifact"), args.layers, args.lora_rank)
