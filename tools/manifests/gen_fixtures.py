"""Regenerate the fixture key manifests (key lists transcribed from the
published HF checkpoints' safetensors index layouts; zero egress here, so
these encode the known-public layouts — swap in the real
model.safetensors.index.json on real-weights day)."""

import os

HERE = os.path.dirname(os.path.abspath(__file__))


def clip_keys(prefix, n_layers=24, position_ids=False):
    ks = [
        f"{prefix}.embeddings.class_embedding",
        f"{prefix}.embeddings.patch_embedding.weight",
        f"{prefix}.embeddings.position_embedding.weight",
        f"{prefix}.pre_layrnorm.weight",
        f"{prefix}.pre_layrnorm.bias",
        f"{prefix}.post_layernorm.weight",
        f"{prefix}.post_layernorm.bias",
    ]
    if position_ids:  # buffer persisted by older transformers; loaders ignore
        ks.append(f"{prefix}.embeddings.position_ids")
    for i in range(n_layers):
        p = f"{prefix}.encoder.layers.{i}"
        for ln in ("layer_norm1", "layer_norm2"):
            ks += [f"{p}.{ln}.weight", f"{p}.{ln}.bias"]
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            ks += [f"{p}.self_attn.{proj}.weight", f"{p}.self_attn.{proj}.bias"]
        for fc in ("fc1", "fc2"):
            ks += [f"{p}.mlp.{fc}.weight", f"{p}.mlp.{fc}.bias"]
    return ks


def phi35v():
    ks = ["model.embed_tokens.weight", "model.norm.weight", "lm_head.weight"]
    for i in range(32):
        p = f"model.layers.{i}"
        ks += [
            f"{p}.input_layernorm.weight",
            f"{p}.post_attention_layernorm.weight",
            f"{p}.self_attn.qkv_proj.weight",
            f"{p}.self_attn.o_proj.weight",
            f"{p}.mlp.gate_up_proj.weight",
            f"{p}.mlp.down_proj.weight",
        ]
    ks += [
        "model.vision_embed_tokens.glb_GN",
        "model.vision_embed_tokens.sub_GN",
        "model.vision_embed_tokens.wte.weight",
        "model.vision_embed_tokens.img_projection.0.weight",
        "model.vision_embed_tokens.img_projection.0.bias",
        "model.vision_embed_tokens.img_projection.2.weight",
        "model.vision_embed_tokens.img_projection.2.bias",
    ]
    ks += clip_keys(
        "model.vision_embed_tokens.img_processor.vision_model", position_ids=True
    )
    return ks


def qwen25_7b():
    ks = ["model.embed_tokens.weight", "model.norm.weight", "lm_head.weight",
          "visual.patch_embed.proj.weight", "visual.merger.ln_q.weight",
          "visual.merger.mlp.0.weight", "visual.merger.mlp.0.bias",
          "visual.merger.mlp.2.weight", "visual.merger.mlp.2.bias"]
    for i in range(32):
        p = f"visual.blocks.{i}"
        ks += [f"{p}.norm1.weight", f"{p}.norm2.weight",
               f"{p}.attn.qkv.weight", f"{p}.attn.qkv.bias",
               f"{p}.attn.proj.weight", f"{p}.attn.proj.bias"]
        for proj in ("gate_proj", "up_proj", "down_proj"):
            ks += [f"{p}.mlp.{proj}.weight", f"{p}.mlp.{proj}.bias"]
    for i in range(28):
        p = f"model.layers.{i}"
        ks += [f"{p}.input_layernorm.weight",
               f"{p}.post_attention_layernorm.weight",
               f"{p}.self_attn.o_proj.weight"]
        for proj in ("q_proj", "k_proj", "v_proj"):
            ks += [f"{p}.self_attn.{proj}.weight", f"{p}.self_attn.{proj}.bias"]
        for proj in ("gate_proj", "up_proj", "down_proj"):
            ks.append(f"{p}.mlp.{proj}.weight")
    return ks


def llava16_13b():
    ks = ["image_newline",
          "language_model.lm_head.weight",
          "language_model.model.embed_tokens.weight",
          "language_model.model.norm.weight",
          "multi_modal_projector.linear_1.weight",
          "multi_modal_projector.linear_1.bias",
          "multi_modal_projector.linear_2.weight",
          "multi_modal_projector.linear_2.bias"]
    for i in range(40):
        p = f"language_model.model.layers.{i}"
        ks += [f"{p}.input_layernorm.weight",
               f"{p}.post_attention_layernorm.weight"]
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
            ks.append(f"{p}.self_attn.{proj}.weight")
        for proj in ("gate_proj", "up_proj", "down_proj"):
            ks.append(f"{p}.mlp.{proj}.weight")
    ks += clip_keys("vision_tower.vision_model")
    return ks


FAMILIES = {
    "phi35_vision_instruct": phi35v,
    "qwen25_vl_7b_instruct": qwen25_7b,
    "llava_v16_vicuna_13b": llava16_13b,
}

if __name__ == "__main__":
    for name, fn in FAMILIES.items():
        d = os.path.join(HERE, name)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "keys.txt"), "w") as f:
            f.write("\n".join(sorted(fn())) + "\n")
        print(name, len(fn()), "keys")
