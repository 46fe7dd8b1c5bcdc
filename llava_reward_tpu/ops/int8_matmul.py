"""Fused W8A8 matmul Pallas kernel — OPT-IN (LRT_PALLAS_INT8=1), measured
slower than the XLA formulation at every production shape.

Theory: the XLA formulation of dynamic-activation int8 (utils/quantize.py
`_int8_matmul_2d`) pays two extra HBM passes per matmul (amax reduce +
int8 materialise); this kernel keeps the whole (bm, K) activation block
resident in VMEM — reads x from HBM exactly once, quantizes into an int8
VMEM scratch reused across the N-tile sweep, runs the s8xs8 dot on the
MXU's double-rate path (v5e: 394 TOPS) and folds both scales in the f32
epilogue.

Practice (chained-timing ms/matmul on v5e, M=87040 CLIP / 20480 decoder
rows — PERF.md int8 ledger):

    shape                      bf16   xla-int8   this kernel
    clip fc1   1024->4096      3.63     3.09        4.16
    clip fc2   4096->1024      3.45     4.27        4.78
    clip qkv   1024->3072      4.00     2.51        4.77
    dec qkv    3072->9216      3.86     1.35        2.34
    dec gateup 3072->16384    11.31     6.21        7.60
    dec down   8192->3072      5.64     4.22        6.72

XLA's int8 matmul emitter beats this naive VMEM-resident schedule by more
than the two saved passes are worth, so the XLA path is the default; the
kernel stays as the measured-and-documented alternative (and the starting
point for a future hand-scheduled attempt).

Semantics match `_int8_matmul_2d` exactly: symmetric per-row dynamic
activation quantization (absmax -> round), per-out-channel weight scales.

Reference context: the --load_in_8bit inference mode, the TPU answer to
bitsandbytes quantized inference (rw_model_general_preference.py:166-185).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _quant_chunk(K: int, bm: int) -> int:
    """Row-chunk for the in-kernel quantize loop: the f32 temporaries
    (upcast + scaled-round) materialise (chunk, K) each on the Mosaic
    stack; bound them to ~2 MB while keeping sublane-aligned chunks."""
    ch = max(8, (2 * 1024 * 1024 // (K * 8)) // 8 * 8)
    while bm % ch:
        ch //= 2
    return max(8, ch)


def _make_kernel(bm: int, K: int):
    ch = _quant_chunk(K, bm)

    def _kernel(x_ref, w_ref, ws_ref, o_ref, xq_ref, sc_ref):
        """Grid (Mb, Nb), j innermost. x block (bm, K) bf16 resident;
        quantize once per row-block (j == 0) into the int8 scratch in
        ``ch``-row chunks, reuse for every N tile."""
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _quantize():
            def body(c, carry):
                r0 = c * ch
                xf = x_ref[pl.ds(r0, ch), :].astype(jnp.float32)
                amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)  # (ch, 1)
                amax = jnp.where(amax > 0, amax, 1.0)
                xq_ref[pl.ds(r0, ch), :] = jnp.round(
                    xf * (127.0 / amax)
                ).astype(jnp.int8)
                sc_ref[pl.ds(r0, ch), :] = amax * (1.0 / 127.0)
                return carry

            jax.lax.fori_loop(0, bm // ch, body, 0)

        acc = jax.lax.dot_general(
            xq_ref[:], w_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        o_ref[:] = (
            acc.astype(jnp.float32) * sc_ref[:] * ws_ref[:].astype(jnp.float32)
        ).astype(o_ref.dtype)

    return _kernel


def _vmem_bytes(bm: int, bn: int, K: int) -> int:
    """Worst-case scoped-VMEM estimate: Mosaic double-buffers every in/out
    block across grid steps; the quantize loop's f32 temporaries and the
    s32 accumulator live on the kernel stack."""
    ch = _quant_chunk(K, bm)
    return (
        2 * bm * K * 2      # x block, bf16, double-buffered
        + bm * K            # xq scratch (int8)
        + 4 * bm            # sc scratch (f32)
        + 2 * ch * K * 4    # quantize-loop f32 temporaries
        + 2 * K * bn        # w block, int8, double-buffered
        + 2 * bn * 4        # wscale block
        + 2 * bm * bn * 4   # out block, double-buffered
        + 2 * bm * bn * 4   # s32 accumulator + f32 epilogue temp
    )


_VMEM_BUDGET = 13 * 1024 * 1024  # of the 16M scoped limit; headroom for Mosaic


def _pick_blocks(M: int, K: int, N: int):
    """Largest (bm, bn) that divide (M, N) and fit VMEM; bm first (the x
    block is read once per row-block, so tall blocks minimise both the
    quantize work and the total weight re-reads)."""
    for bm in (512, 256, 128, 64, 32):
        if M % bm:
            continue
        for bn in (512, 256, 128):
            if N % bn == 0 and _vmem_bytes(bm, bn, K) <= _VMEM_BUDGET:
                return bm, bn
    return 0, 0


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def w8a8_matmul(x, wq, wscale, out_dtype=None, interpret=False):
    """x (M, K) float @ wq (K, N) int8 -> (M, N) ``out_dtype`` (default
    x.dtype), with per-row dynamic activation quantization fused in-kernel.
    ``wscale``: (1, N) or (N,) f32 per-out-channel weight scales.
    ``interpret=True`` runs the Pallas interpreter (CPU numerics tests)."""
    M, K = x.shape
    N = wq.shape[1]
    out_dtype = out_dtype or x.dtype
    wscale = wscale.reshape(1, N)

    bm, bn = _pick_blocks(M, K, N)
    if bm == 0:  # pad the row axis to the smallest viable block
        bm = 128 if _vmem_bytes(128, 128, K) <= _VMEM_BUDGET else 32
        M_pad = (M + bm - 1) // bm * bm
        x = jnp.pad(x, [(0, M_pad - M), (0, 0)])
        return w8a8_matmul(x, wq, wscale, out_dtype=out_dtype,
                           interpret=interpret)[:M]

    return pl.pallas_call(
        _make_kernel(bm, K),
        grid=(M // bm, N // bn),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i, j: (i, 0)),
            pl.BlockSpec((K, bn), lambda i, j: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, K), jnp.int8),
            pltpu.VMEM((bm, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(x, wq, wscale)


def supported(x, wq) -> bool:
    """The kernel needs lane-aligned contraction/output dims and a TPU."""
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    return (
        on_tpu
        and x.ndim == 2
        and x.shape[1] % 128 == 0
        and wq.shape[1] % 128 == 0
        and x.shape[0] >= 32
    )
