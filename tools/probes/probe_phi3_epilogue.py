"""Phi3 decoder chained timing at production shape (B=8, S=2560): W8A8
dynamic-quantize vs rms_quant epilogue (bf16 reference). K chained decoder
stacks in one jit, single fetch."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/jaxcache")

from llava_reward_tpu.core.config import phi35_vision_config
from llava_reward_tpu.models import phi3
from llava_reward_tpu.ops.rope import rope_cos_sin_for_config
from llava_reward_tpu.utils.quantize import quantize_stacked_layers

cfg = phi35_vision_config().decoder
B, S = 8, 2560
if os.environ.get("PROBE_TINY") == "1":
    jax.config.update("jax_platforms", "cpu")
    import dataclasses
    cfg = dataclasses.replace(cfg, num_layers=2, hidden_size=128,
                              intermediate_size=256, num_heads=4,
                              num_kv_heads=4, rope_scaling=None)
    B, S = 2, 64
K = int(os.environ.get("PROBE_K", "4"))

rng = np.random.default_rng(0)
params = phi3.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
layers_bf16 = params["layers"]
layers_int8 = jax.tree_util.tree_map(
    jnp.asarray,
    quantize_stacked_layers(
        jax.device_get(layers_bf16), scheme="w8a8", min_size=0,
        only=("qkv_proj", "gate_up_proj", "down_proj", "o_proj"),
    ),
)

h0 = jnp.asarray(
    rng.standard_normal((B, S, cfg.hidden_size)).astype(np.float32) * 0.1
).astype(jnp.bfloat16)
pos = jnp.asarray(np.tile(np.arange(S, dtype=np.int32)[None], (B, 1)))
mask = jnp.asarray(np.ones((B, S), np.int32))


@jax.jit
def chained(h, layers):
    def stack(h):
        cos, sin = rope_cos_sin_for_config(pos, cfg, dtype=h.dtype)

        def scan_fn(carry, lp):
            return phi3.decoder_layer(
                carry, lp, cfg, cos, sin, mask, "auto", None
            ), None

        h, _ = jax.lax.scan(scan_fn, h, layers)
        return h

    def body(carry, _):
        return stack(carry) * jnp.bfloat16(0.999), None

    out, _ = jax.lax.scan(body, h, None, length=K)
    return jnp.sum(out.astype(jnp.float32))  # scalar fetch: a full fetch is ~6s through the tunnel


def run(name, layers):
    np.asarray(chained(h0, layers))
    t0 = time.perf_counter()
    np.asarray(chained(h0 * jnp.bfloat16(1.001), layers))
    dt = time.perf_counter() - t0
    print(f"{name}: {dt / K * 1000:.1f} ms/stack ({K} chained)")
    return dt / K


v = os.environ.get("PROBE_VARIANT", "epi")
if v == "bf16":
    run("bf16         ", layers_bf16)
elif v == "dyn":
    os.environ["LRT_LN_QUANT"] = "0"
    run("int8 dynamic ", layers_int8)
else:
    os.environ["LRT_LN_QUANT"] = "1"
    run("int8 epilogue", layers_int8)
