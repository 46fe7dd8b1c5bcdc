"""CLIP ViT vision tower (ViT-L/14-336 for Phi-3.5-V), TPU-first.

Reference behaviour (modeling_phi3_v.py:68-83,208-219): run the HF
CLIPVisionModel, take hidden_states[-2] (penultimate layer output, i.e. the
output after 23 of 24 layers, before post-layernorm) and drop the CLS token.

TPU-first design decisions:
- the patch "conv" (stride == kernel) is a reshape + one big matmul on the
  MXU instead of a convolution;
- encoder layers are stacked along a leading layer axis and executed with
  ``lax.scan`` (single compiled layer body, FSDP-shardable, remat-friendly);
- only ``num_active_layers`` (23) are ever executed: the final layer's output
  is unused by feature extraction, so it is never computed (the reference's
  patch_clip_for_lora does the same by truncation, utils/utils.py:264-282).

Param tree (all linear kernels stored (in, out) so apply is ``x @ W + b``):
  {
    'class_embedding': (H,),
    'patch_proj': (P*P*C, H),            # flat order (ph, pw, C)
    'position_embedding': (577, H),
    'pre_layernorm': {'weight','bias'},
    'layers': {                          # each leaf has leading layer axis L
      'ln1': {'weight','bias'}, 'ln2': {'weight','bias'},
      'attn': {'q'|'k'|'v'|'out': {'kernel','bias'}},
      'mlp': {'fc1'|'fc2': {'kernel','bias'}},
    },
    'post_layernorm': {'weight','bias'},  # loaded for ckpt parity; unused
  }
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.config import VisionConfig
from ..ops.activations import ACT2FN
from ..ops.attention import mha
from ..ops.norms import layer_norm


def init_params(key: jax.Array, cfg: VisionConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 8)
    H, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    P, C = cfg.patch_size, cfg.num_channels
    std = 0.02

    def dense(k, shape):
        return (jax.random.normal(k, shape) * std).astype(dtype)

    def stacked(k, in_dim, out_dim):
        return {
            "kernel": dense(k, (L, in_dim, out_dim)),
            "bias": jnp.zeros((L, out_dim), dtype),
        }

    return {
        "class_embedding": dense(ks[0], (H,)),
        "patch_proj": dense(ks[1], (P * P * C, H)),
        "position_embedding": dense(ks[2], (cfg.num_positions, H)),
        "pre_layernorm": {"weight": jnp.ones((H,), dtype), "bias": jnp.zeros((H,), dtype)},
        "layers": {
            "ln1": {"weight": jnp.ones((L, H), dtype), "bias": jnp.zeros((L, H), dtype)},
            "ln2": {"weight": jnp.ones((L, H), dtype), "bias": jnp.zeros((L, H), dtype)},
            "attn": {
                "q": stacked(ks[3], H, H),
                "k": stacked(ks[4], H, H),
                "v": stacked(ks[5], H, H),
                "out": stacked(ks[6], H, H),
            },
            "mlp": {"fc1": stacked(ks[7], H, I), "fc2": stacked(ks[7], I, H)},
        },
        "post_layernorm": {"weight": jnp.ones((H,), dtype), "bias": jnp.zeros((H,), dtype)},
    }


def embed_patches(params: dict, cfg: VisionConfig, pixel_values: jnp.ndarray) -> jnp.ndarray:
    """pixel_values: (N, H_img, W_img, C) channels-last, CLIP-normalised.

    Returns (N, 1+num_patches, H) embeddings (CLS + patches + positions).
    """
    N, Himg, Wimg, C = pixel_values.shape
    P = cfg.patch_size
    gh, gw = Himg // P, Wimg // P
    x = pixel_values.reshape(N, gh, P, gw, P, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(N, gh * gw, P * P * C)
    patches = jnp.dot(
        x, params["patch_proj"], preferred_element_type=x.dtype
    )  # (N, gh*gw, H)
    cls = jnp.broadcast_to(
        params["class_embedding"][None, None, :], (N, 1, cfg.hidden_size)
    ).astype(patches.dtype)
    emb = jnp.concatenate([cls, patches], axis=1)
    return emb + params["position_embedding"][None].astype(patches.dtype)


def _lora_delta(x, lora_layer, name):
    if lora_layer is None or name not in lora_layer:
        return 0.0
    t = lora_layer[name]
    a = t["a"].astype(x.dtype)
    b = t["b"].astype(x.dtype)
    return (x @ a) @ b * t["scale"].astype(x.dtype)


def _encoder_layer(
    h, lp, cfg: VisionConfig, attn_impl: str, lora_layer=None, valid_len=None
):
    act = ACT2FN[cfg.hidden_act]
    nh, hd = cfg.num_heads, cfg.head_dim
    N, S, H = h.shape

    import os

    from ..utils.quantize import int8_linear_pre, is_w8a8, qmatmul

    # quantizing-LN epilogue (ops/quant_epilogue.py): when this layer's
    # projections are W8A8 and no LoRA rides on them (merged-eval towers),
    # the LN emits int8 codes + row scales directly — the standalone
    # activation-quantize HBM pass that made tower-level CLIP int8 LOSE to
    # bf16 (PERF.md int8 ledger) disappears. LRT_LN_QUANT=0 opts out.
    from ..ops.quant_epilogue import supported as _lnq_supported

    use_ln_quant = (
        lora_layer is None
        and os.environ.get("LRT_LN_QUANT", "1") != "0"
        and _on_tpu()
        and _lnq_supported(h)
    )

    residual = h
    a = lp["attn"]
    x = None
    if use_ln_quant and is_w8a8(a["q"]["kernel"]) and attn_impl == "fused":
        from ..ops.quant_epilogue import ln_quant

        x_codes, x_rs = ln_quant(
            h, lp["ln1"]["weight"], lp["ln1"]["bias"], cfg.layer_norm_eps
        )
    else:
        x = layer_norm(h, lp["ln1"]["weight"], lp["ln1"]["bias"], cfg.layer_norm_eps)
    if attn_impl == "fused":
        # fused qkv matmul + direct flash kernel: attention output comes
        # back in (N, S, H) with zero layout transposes; pad keys beyond
        # ``valid_len`` are masked in-kernel. LoRA deltas add onto the
        # fused projection's column groups.
        from ..ops.flash_attention import direct_attention

        if is_w8a8(a["q"]["kernel"]):
            # concat the int8 weights + per-channel scales along the out
            # axis so the fused projection runs ONE int8 matmul
            wk = {
                k: jnp.concatenate(
                    [a[n]["kernel"][k] for n in ("q", "k", "v")], axis=-1
                )
                for k in a["q"]["kernel"]
            }
        else:
            wk = jnp.concatenate(
                [a["q"]["kernel"], a["k"]["kernel"], a["v"]["kernel"]], axis=1
            )
        wb = jnp.concatenate([a["q"]["bias"], a["k"]["bias"], a["v"]["bias"]])
        if x is None:
            qkv = int8_linear_pre(x_codes, x_rs, wk, h.dtype) + wb
        else:
            qkv = qmatmul(x, wk) + wb
        if lora_layer is not None:
            deltas = [_lora_delta(x, lora_layer, n) for n in ("q", "k", "v")]
            if any(not isinstance(d, float) for d in deltas):
                qkv = qkv + jnp.concatenate(
                    [jnp.broadcast_to(d, x.shape) if isinstance(d, float) else d
                     for d in deltas],
                    axis=-1,
                )
        attn = direct_attention(
            qkv, None, None, jnp.zeros((N,), jnp.int32),
            n_heads=nh, head_dim=hd, causal=False, sliding_window=None,
            scale=hd ** -0.5, valid_len=valid_len,
        )
    else:
        q = qmatmul(x, a["q"]["kernel"]) + a["q"]["bias"] + _lora_delta(x, lora_layer, "q")
        k = qmatmul(x, a["k"]["kernel"]) + a["k"]["bias"] + _lora_delta(x, lora_layer, "k")
        v = qmatmul(x, a["v"]["kernel"]) + a["v"]["bias"] + _lora_delta(x, lora_layer, "v")
        q = q.reshape(N, S, nh, hd)
        k = k.reshape(N, S, nh, hd)
        v = v.reshape(N, S, nh, hd)
        attn = mha(q, k, v, causal=False, impl=attn_impl).reshape(N, S, H)
    attn_out = qmatmul(attn, a["out"]["kernel"]) + a["out"]["bias"] + _lora_delta(
        attn, lora_layer, "out"
    )
    h = residual + attn_out

    residual = h
    if use_ln_quant and is_w8a8(lp["mlp"]["fc1"]["kernel"]):
        from ..ops.quant_epilogue import ln_quant

        x_codes, x_rs = ln_quant(
            h, lp["ln2"]["weight"], lp["ln2"]["bias"], cfg.layer_norm_eps
        )
        x1 = act(
            int8_linear_pre(x_codes, x_rs, lp["mlp"]["fc1"]["kernel"], h.dtype)
            + lp["mlp"]["fc1"]["bias"]
        )
    else:
        x = layer_norm(h, lp["ln2"]["weight"], lp["ln2"]["bias"], cfg.layer_norm_eps)
        x1 = act(
            qmatmul(x, lp["mlp"]["fc1"]["kernel"]) + lp["mlp"]["fc1"]["bias"]
            + _lora_delta(x, lora_layer, "fc1")
        )
    x2 = (
        qmatmul(x1, lp["mlp"]["fc2"]["kernel"]) + lp["mlp"]["fc2"]["bias"]
        + _lora_delta(x1, lora_layer, "fc2")
    )
    return residual + x2


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def extract_patch_features(
    params: dict,
    cfg: VisionConfig,
    pixel_values: jnp.ndarray,  # (N, H_img, W_img, C)
    *,
    attn_impl: str = "auto",
    remat: bool = False,
    lora: Optional[dict] = None,  # stacked vision LoRA (train_vision mode;
    # targets q/k/v/out/fc1/fc2 like patch_clip_for_lora, utils.py:264-282)
) -> jnp.ndarray:
    """Penultimate-layer patch features, CLS dropped: (N, num_patches, H).

    Matches Phi3ImageEmbedding.get_img_features (modeling_phi3_v.py:208-219).
    """
    h = embed_patches(params, cfg, pixel_values)
    h = layer_norm(
        h,
        params["pre_layernorm"]["weight"],
        params["pre_layernorm"]["bias"],
        cfg.layer_norm_eps,
    )
    n_active = cfg.num_active_layers
    layers = jax.tree_util.tree_map(lambda x: x[:n_active], params["layers"])
    if lora is not None:
        lora = jax.tree_util.tree_map(lambda x: x[:n_active], lora)

    # TPU: pad the token axis to a 64 multiple and run the fused
    # qkv+direct-kernel layer (no q/k/v layout transposes; pad keys masked
    # in-kernel, pad rows never mix back since attention is the only
    # cross-token op). ~10% extra matmul rows buys the fast attention path.
    # Inference-only: direct_attention is a raw pallas_call with no
    # custom_vjp, so when vision LoRA is trainable (lora is not None)
    # stay on the differentiable mha path (r2 advisor, high).
    S = h.shape[1]
    valid_len = None
    if attn_impl in ("auto", "pallas") and _on_tpu() and S % 64 != 0 and lora is None:
        from ..ops.flash_attention import _direct_group

        if _direct_group(cfg.num_heads, cfg.head_dim) is not None:
            S_pad = (S + 63) // 64 * 64
            h = jnp.pad(h, [(0, 0), (0, S_pad - S), (0, 0)])
            valid_len = S
            attn_impl = "fused"

    body = _encoder_layer
    if remat:
        body = jax.checkpoint(body, static_argnums=(2, 3, 5))

    def scan_fn(carry, xs):
        lp, lora_layer = xs
        return body(carry, lp, cfg, attn_impl, lora_layer, valid_len), None

    h, _ = jax.lax.scan(scan_fn, h, (layers, lora))
    return h[:, 1:S, :]  # drop CLS (and the pad tail)
