"""Phi-3 decoder, TPU-first (stacked layers + lax.scan, fused projections).

Reference layer semantics (modeling_phi3_v.py:1130-1205):
  h -> RMSNorm -> attention (fused qkv_proj, su-RoPE, causal) -> +residual
    -> RMSNorm -> MLP (fused gate_up_proj, silu-gated) -> +residual
with a final RMSNorm after the last layer (:1500).

TPU-first decisions:
- all 32 layers stacked along a leading axis, executed with ``lax.scan``:
  one compiled layer body, FSDP sharding by annotating the stacked leaves,
  gradient checkpointing by ``jax.checkpoint`` on the body;
- fused qkv / gate_up weights kept fused (big MXU matmuls), matching the
  checkpoint layout (modeling_phi3_v.py:561-562,620-622);
- attention layout (B, S, H, D) end-to-end, RoPE applied without transposes;
- intermediate-layer readout (the reward model's ``layer_id`` knob,
  rw_model_general_preference.py:349-352) via a constant-memory "collect"
  carry instead of materialising all 33 hidden states like
  ``output_hidden_states=True`` does;
- optional LoRA deltas on qkv/o/gate_up/down as stacked (A, B) factors
  applied in-line (see lora/lora.py).

Param tree:
  {
    'embed_tokens': (V, H),
    'layers': {
      'input_layernorm': (L, H),
      'qkv_proj': (L, H, q+2kv), 'o_proj': (L, H, H),
      'post_attention_layernorm': (L, H),
      'gate_up_proj': (L, H, 2I), 'down_proj': (L, I, H),
    },
    'final_layernorm': (H,),
  }
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.config import DecoderConfig
from ..ops.activations import ACT2FN
from ..ops.attention import fused_rope_attention
from ..ops.norms import rms_norm
from ..ops.rope import rope_cos_sin_for_config


def init_params(key: jax.Array, cfg: DecoderConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 6)
    H, I, L, V = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers, cfg.vocab_size
    std = 0.02

    def dense(k, shape):
        return (jax.random.normal(k, shape) * std).astype(dtype)

    return {
        "embed_tokens": dense(ks[0], (V, H)),
        "layers": {
            "input_layernorm": jnp.ones((L, H), dtype),
            "qkv_proj": dense(ks[1], (L, H, cfg.q_size + 2 * cfg.kv_size)),
            "o_proj": dense(ks[2], (L, cfg.q_size, H)),
            "post_attention_layernorm": jnp.ones((L, H), dtype),
            "gate_up_proj": dense(ks[3], (L, H, 2 * I)),
            "down_proj": dense(ks[4], (L, I, H)),
        },
        "final_layernorm": jnp.ones((H,), dtype),
    }


def _maybe_lora(x, base_out, lora_layer, name):
    """Add a LoRA delta: x @ A @ B * (alpha/r). lora_layer holds per-layer
    slices of the stacked adapter (or None). Adapter compute runs in the
    activation dtype (bf16); the f32 master weights live in the optimizer."""
    if lora_layer is None or name not in lora_layer:
        return base_out
    a = lora_layer[name]["a"].astype(x.dtype)  # (in, r)
    b = lora_layer[name]["b"].astype(x.dtype)  # (r, out)
    scale = lora_layer[name]["scale"].astype(x.dtype)
    return base_out + (x @ a) @ b * scale


def decoder_layer(
    h: jnp.ndarray,  # (B, S, H)
    lp: dict,  # per-layer params (leading layer axis removed by scan)
    cfg: DecoderConfig,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray],  # (B, S) 1=valid
    attn_impl: str,
    lora_layer: Optional[dict] = None,
) -> jnp.ndarray:
    import os

    from ..utils.quantize import dequant_layer, int8_linear_pre, is_w8a8, qmatmul

    # weight-only quantized leaves dequantize here; w8a8 leaves pass
    # through and run on the int8 MXU path inside qmatmul
    lp = dequant_layer(lp, h.dtype)
    B, S, H = h.shape
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    # quantizing-RMSNorm epilogue (ops/quant_epilogue.py): W8A8 inference
    # layers take int8 codes + row scales straight from the norm, skipping
    # the standalone activation-quantize pass. LRT_LN_QUANT=0 opts out.
    def _rq(hid, gamma):
        from ..ops.quant_epilogue import rms_quant

        return rms_quant(hid, gamma, cfg.rms_norm_eps)

    from ..ops.quant_epilogue import supported as _lnq_supported
    from .clip_vit import _on_tpu

    use_rq = (
        lora_layer is None
        and os.environ.get("LRT_LN_QUANT", "1") != "0"
        and _on_tpu()
        and _lnq_supported(h)
    )

    residual = h
    if use_rq and is_w8a8(lp["qkv_proj"]):
        codes, rs = _rq(h, lp["input_layernorm"])
        qkv = int8_linear_pre(codes, rs, lp["qkv_proj"], h.dtype)
    else:
        x = rms_norm(h, lp["input_layernorm"], cfg.rms_norm_eps)
        qkv = _maybe_lora(x, qmatmul(x, lp["qkv_proj"]), lora_layer, "qkv_proj")
    attn = fused_rope_attention(
        qkv, cos, sin,
        n_heads=nh, n_kv_heads=nkv, head_dim=hd,
        causal=True,
        key_padding_mask=attention_mask,
        sliding_window=cfg.sliding_window,
        impl=attn_impl,
    )  # (B, S, nh*hd); pallas fused path on TPU, split+rope+mha elsewhere
    if use_rq and is_w8a8(lp["o_proj"]):
        # attention output comes from a Pallas custom call: XLA can't fuse
        # the dynamic quantize into it, so the one-pass row_quant saves a
        # full HBM read of (M, H) per layer
        from ..ops.quant_epilogue import row_quant

        codes, rs = row_quant(attn)
        attn = int8_linear_pre(codes, rs, lp["o_proj"], h.dtype)
    else:
        attn = _maybe_lora(attn, qmatmul(attn, lp["o_proj"]), lora_layer, "o_proj")
    h = residual + attn

    residual = h
    if use_rq and is_w8a8(lp["gate_up_proj"]):
        codes, rs = _rq(h, lp["post_attention_layernorm"])
        gate_up = int8_linear_pre(codes, rs, lp["gate_up_proj"], h.dtype)
    else:
        x = rms_norm(h, lp["post_attention_layernorm"], cfg.rms_norm_eps)
        gate_up = _maybe_lora(x, qmatmul(x, lp["gate_up_proj"]), lora_layer, "gate_up_proj")
    if (
        use_rq
        and is_w8a8(lp["down_proj"])
        and cfg.hidden_act == "silu"
        and cfg.intermediate_size % 128 == 0
    ):
        # silu(gate)*up fused straight to int8 codes: the down matmul's
        # quantize pass reads the model's largest activation (M, I)
        from ..ops.quant_epilogue import silu_mul_quant

        codes, rs = silu_mul_quant(gate_up)
        mlp = int8_linear_pre(codes, rs, lp["down_proj"], h.dtype)
    else:
        gate, up = jnp.split(gate_up, 2, axis=-1)
        act = ACT2FN[cfg.hidden_act]
        mlp = up * act(gate)
        mlp = _maybe_lora(mlp, qmatmul(mlp, lp["down_proj"]), lora_layer, "down_proj")
    return residual + mlp


class DecoderOutput(NamedTuple):
    last_hidden_state: jnp.ndarray  # post-final-RMSNorm (B, S, H)
    collected_hidden_state: Optional[jnp.ndarray]  # pre-norm layer output, or None


def forward(
    params: dict,
    cfg: DecoderConfig,
    inputs_embeds: jnp.ndarray,  # (B, S, H)
    attention_mask: Optional[jnp.ndarray],  # (B, S) 1=valid
    position_ids: jnp.ndarray,  # (B, S)
    *,
    collect_layer_id: Optional[int] = None,
    attn_impl: str = "auto",
    remat: bool = False,
    lora: Optional[dict] = None,  # stacked adapter tree (leading layer axis)
) -> DecoderOutput:
    """Run the decoder. ``collect_layer_id`` uses HF hidden_states indexing
    (0 = embeddings, i = output of layer i, pre-final-norm); ``num_layers``
    or None means "just the post-norm last_hidden_state"."""
    cos, sin = rope_cos_sin_for_config(position_ids, cfg, dtype=inputs_embeds.dtype)

    collect = collect_layer_id is not None and collect_layer_id < cfg.num_layers

    body = decoder_layer
    if remat:
        body = jax.checkpoint(
            body, static_argnums=(2, 6), policy=jax.checkpoint_policies.nothing_saveable
        )

    def scan_fn(carry, xs):
        h, collected, i = carry
        lp, lora_layer = xs
        h_new = body(h, lp, cfg, cos, sin, attention_mask, attn_impl, lora_layer)
        if collect:
            collected = jnp.where(i + 1 == collect_layer_id, h_new, collected)
        return (h_new, collected, i + 1), None

    # collect_layer_id == 0 means the embeddings themselves; init covers it.
    init_collected = inputs_embeds if collect else jnp.zeros((), inputs_embeds.dtype)

    # None is an empty pytree node, so it scans alongside the stacked layers.
    (h, collected, _), _ = jax.lax.scan(
        scan_fn, (inputs_embeds, init_collected, jnp.int32(0)), (params["layers"], lora)
    )

    last = rms_norm(h, params["final_layernorm"], cfg.rms_norm_eps)
    return DecoderOutput(
        last_hidden_state=last,
        collected_hidden_state=collected if collect else None,
    )


def logits(params: dict, lm_head: jnp.ndarray, hidden: jnp.ndarray) -> jnp.ndarray:
    """LM logits for the ptx/SFT regularisers (lm_head stored (H, V))."""
    return hidden @ lm_head
