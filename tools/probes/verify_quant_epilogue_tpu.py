"""Real-TPU check: ln_quant/rms_quant Mosaic lowering + parity at
production shapes (CLIP M=87040 H=1024; phi3 decoder M=20480 H=3072)."""
import sys
sys.path.insert(0, "/root/repo")
import jax, numpy as np, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/jaxcache")
from llava_reward_tpu.ops.quant_epilogue import ln_quant, rms_quant
from llava_reward_tpu.ops.norms import layer_norm, rms_norm

def check(name, M, H, ln=True, dtype=jnp.bfloat16, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((M, H)).astype(np.float32)).astype(dtype)
    w = jnp.asarray(rng.standard_normal(H).astype(np.float32)).astype(dtype)
    b = jnp.asarray(rng.standard_normal(H).astype(np.float32)).astype(dtype)
    if ln:
        f = jax.jit(lambda x: ln_quant(x, w, b, 1e-5))
        ref = layer_norm(x, w, b, 1e-5)
    else:
        f = jax.jit(lambda x: rms_quant(x, w, 1e-5))
        ref = rms_norm(x, w, 1e-5)
    codes, scale = f(x)
    codes, scale = np.asarray(codes, np.int32), np.asarray(scale, np.float32)
    reff = np.asarray(ref, np.float32)
    amax = np.abs(reff).max(-1, keepdims=True); amax = np.where(amax>0, amax, 1.0)
    want = np.round(reff * (127.0/amax))
    d = np.abs(codes - want)
    bad = int((d > 0).sum())
    print(f"{name}: code diffs {bad}/{codes.size} (max {int(d.max())}) "
          f"scale relerr {np.abs(scale[:,0]-amax[:,0]).max()/amax.max():.2e}")
    # the kernel quantizes from the f32 norm output; the host reference
    # round-trips through bf16 (norms.py returns astype(dtype)) -> +-1 code
    # differences are the expected rounding skew, never more
    assert int(d.max()) <= 1, int(d.max())
    assert bad <= codes.size * 0.08, bad

check("clip ln M=87040 H=1024", 87040, 1024, ln=True)
check("phi3 rms M=20480 H=3072", 20480, 3072, ln=False)
check("odd rows M=1000 H=1024", 1000, 1024, ln=True, seed=1)
print("OK")
