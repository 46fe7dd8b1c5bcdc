"""Chained kernel timing through the axon tunnel — THE methodology for
per-layer numbers on this backend (see PERF.md "Kernel timing methodology").

Single-dispatch timings are floored by the ~30 ms tunnel RTT, so a "40 ms"
measurement may be a 5 ms kernel. This harness times N applications chained
inside ONE jit (feeding outputs back so nothing CSEs away) and fetches a
tiny slice once per step.

Usage as a library:

    from tools.chained_timing import chain, timeit
    per_layer = (timeit(chain(my_attention, L=16), q, k, v) - base) / 16

or run the built-in example:

    JAX_COMPILATION_CACHE_DIR=/root/jaxcache python tools/chained_timing.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp


def chain(fn, L: int = 16):
    """jit L applications of ``fn(carry, *rest) -> carry-like`` with the
    output mixed back into the carry (prevents CSE/memoisation)."""

    @jax.jit
    def run(x, *rest):
        def body(c, _):
            o = fn(c, *rest)
            return (o * 0.3 + x * 0.7).astype(x.dtype), ()

        out, _ = jax.lax.scan(body, x, None, length=L)
        return out

    return run


def timeit(f, *args, steps: int = 4) -> float:
    """Median wall ms for f(*args): inputs varied per step ON DEVICE (the
    tunnel memoises identical dispatches and host transfers are ~30 MB/s),
    fetch limited to 4 scalars (the only real barrier)."""

    @jax.jit
    def perturb(x, i):
        return x + i.astype(x.dtype) * 1e-3

    variants = [(perturb(args[0], jnp.int32(i)), *args[1:]) for i in range(steps)]
    for v in variants:
        v[0].block_until_ready()

    def fetch(r):
        x = jax.tree_util.tree_leaves(r)[0]
        return np.asarray(x[(0,) * (x.ndim - 1)][:4])

    fetch(f(*args))  # compile + settle
    ts = []
    for v in variants:
        t0 = time.perf_counter()
        fetch(f(*v))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1000


def _example():
    import sys

    sys.path.insert(0, "/root/repo")
    from llava_reward_tpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(0)
    B, S, H, D = 8, 2560, 32, 96
    q = jnp.asarray(rng.standard_normal((B, S, H, D)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)) * 0.3, jnp.bfloat16)
    L = 8
    base = timeit(chain(lambda a, b, c: c, L), q, k, v)
    t = timeit(chain(lambda a, b, c: flash_attention(a, b, c, causal=True), L), q, k, v)
    print(f"empty chain {base:.1f} ms; flash x{L}: {t:.1f} ms "
          f"-> {(t - base) / L:.2f} ms/layer")


if __name__ == "__main__":
    _example()
