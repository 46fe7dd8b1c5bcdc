"""CLIP tower chained timing at production shape (N=136, S=640):
bf16 vs int8 qkv+fc1 dynamic-quantize vs int8 qkv+fc1 with the ln_quant
epilogue. Chained per CLAUDE.md: K tower applications inside ONE jit via
lax.scan, output fed back, single host fetch."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/jaxcache")

from llava_reward_tpu.core.config import VisionConfig
from llava_reward_tpu.models import clip_vit
from llava_reward_tpu.utils.quantize import quantize_stacked_layers

cfg = VisionConfig()  # production CLIP-L/14-336 geometry
N, S = 136, 640  # 8 seqs x 17 crops, 64-padded token axis
if os.environ.get("PROBE_TINY") == "1":
    jax.config.update("jax_platforms", "cpu")
    import dataclasses
    cfg = dataclasses.replace(cfg, num_layers=2, hidden_size=128,
                              intermediate_size=256, num_heads=4)
    N, S = 2, 64
K = int(os.environ.get("PROBE_K", "6"))

rng = np.random.default_rng(0)
params = clip_vit.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
n_active = cfg.num_active_layers
layers_bf16 = jax.tree_util.tree_map(lambda x: x[:n_active], params["layers"])

layers_int8 = quantize_stacked_layers(
    jax.device_get(layers_bf16), scheme="w8a8", min_size=0,
    only=("attn/q", "attn/k", "attn/v", "fc1"),
)
layers_int8 = jax.tree_util.tree_map(jnp.asarray, layers_int8)

h0 = jnp.asarray(rng.standard_normal((N, S, cfg.hidden_size)).astype(np.float32) * 0.1).astype(jnp.bfloat16)


@jax.jit
def chained(h, layers):
    # layers as a jit ARG, not a closure constant: closed-over stacks embed
    # the weights in the HLO and blow the axon remote_compile body limit
    def tower(h):
        def scan_fn(carry, lp):
            return clip_vit._encoder_layer(carry, lp, cfg, os.environ.get("PROBE_IMPL", "fused"), None, S - 3), None

        h, _ = jax.lax.scan(scan_fn, h, layers)
        return h

    def body(carry, _):
        return tower(carry) * jnp.bfloat16(0.999), None  # no CSE

    out, _ = jax.lax.scan(body, h, None, length=K)
    return jnp.sum(out.astype(jnp.float32))  # scalar fetch: a full fetch is ~6s through the tunnel


def run(name, layers):
    np.asarray(chained(h0, layers))  # warm compile + settle
    t0 = time.perf_counter()
    np.asarray(chained(h0 * jnp.bfloat16(1.001), layers))
    dt = time.perf_counter() - t0
    print(f"{name}: {dt / K * 1000:.1f} ms/tower ({K} chained)")
    return dt / K


# one variant per process (PROBE_VARIANT=bf16|dyn|epi): the axon service
# degrades under stacked fresh compiles — keep each process to ONE compile
v = os.environ.get("PROBE_VARIANT", "epi")
if v == "bf16":
    run("bf16              ", layers_bf16)
elif v == "dyn":
    os.environ["LRT_LN_QUANT"] = "0"
    run("int8 qkv+fc1 dyn  ", layers_int8)
else:
    os.environ["LRT_LN_QUANT"] = "1"
    run("int8 qkv+fc1 epi  ", layers_int8)
