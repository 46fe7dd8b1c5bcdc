"""Fused W8A8 Pallas kernel (ops/int8_matmul.py) numerics.

Interpret-mode runs on CPU must match the XLA formulation in
utils/quantize._int8_matmul_2d bit-for-bit up to f32 accumulation order:
both paths quantize activations per-row (absmax -> round), run s8 x s8 ->
s32, and fold both scales in the f32 epilogue. This backs the
--load_in_8bit inference mode (reference: bitsandbytes int8,
rw_model_general_preference.py:166-185)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llava_reward_tpu.ops import int8_matmul
from llava_reward_tpu.utils import quantize


def _xla_ref(x2, wq, scale):
    """The quantize.py XLA formulation, inlined so the kernel dispatch in
    _int8_matmul_2d can't shadow what we compare against."""
    xf = x2.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    amax = jnp.where(amax > 0, amax, 1.0)
    xq = jnp.round(xf * (127.0 / amax)).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return (y.astype(jnp.float32) * (amax / 127.0) * scale.reshape(1, -1)).astype(
        x2.dtype
    )


@pytest.mark.parametrize(
    "M,K,N",
    [
        (64, 256, 256),   # M divides a block exactly
        (50, 256, 384),   # M forces the pad-and-slice path
        (128, 512, 128),  # larger K, minimal N tile
    ],
)
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_kernel_matches_xla_formulation(M, K, N, dtype):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, K)), dtype)
    qd = quantize.quantize_array_w8a8(rng.normal(size=(K, N)) * 0.05)
    wq, scale = jnp.asarray(qd["qvalues_w8a8"]), jnp.asarray(qd["scale"])

    got = int8_matmul.w8a8_matmul(x, wq, scale, interpret=True)
    want = _xla_ref(x, wq, scale)
    assert got.dtype == want.dtype == dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0, atol=(2e-5 if dtype == jnp.float32 else 1e-1),
    )


def test_zero_rows_quantize_safely():
    """An all-zero activation row must not divide by zero (amax clamp)."""
    rng = np.random.default_rng(1)
    x = jnp.zeros((32, 256), jnp.float32).at[1:].set(
        jnp.asarray(rng.normal(size=(31, 256)), jnp.float32)
    )
    qd = quantize.quantize_array_w8a8(rng.normal(size=(256, 128)))
    got = int8_matmul.w8a8_matmul(
        x, jnp.asarray(qd["qvalues_w8a8"]), jnp.asarray(qd["scale"]),
        interpret=True,
    )
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_array_equal(np.asarray(got)[0], 0.0)


def test_supported_gates_off_tpu():
    """On CPU the dispatcher must keep the XLA path (the kernel only
    compiles on TPU); shape gates reject lane-misaligned operands."""
    x = jnp.zeros((64, 256))
    wq = jnp.zeros((256, 128), jnp.int8)
    assert not int8_matmul.supported(x, wq)  # CPU test runner
    assert not int8_matmul.supported(jnp.zeros((64, 250)), wq)
    assert not int8_matmul.supported(x, jnp.zeros((256, 130), jnp.int8))
    assert not int8_matmul.supported(jnp.zeros((8, 256)), wq)


def test_kernel_is_opt_in(monkeypatch):
    """The kernel dispatch requires LRT_PALLAS_INT8=1 (it measured slower
    than the XLA formulation — module docstring); default stays XLA."""
    calls = []
    monkeypatch.setattr(int8_matmul, "supported", lambda *a: True)
    monkeypatch.setattr(
        int8_matmul, "w8a8_matmul", lambda *a, **k: calls.append(1) or a[0]
    )
    rng = np.random.default_rng(2)
    x2 = jnp.asarray(rng.normal(size=(32, 64)), jnp.float32)
    qd = quantize.quantize_array_w8a8(rng.normal(size=(64, 32)))
    monkeypatch.delenv("LRT_PALLAS_INT8", raising=False)
    quantize._int8_matmul_2d(x2, jnp.asarray(qd["qvalues_w8a8"]),
                             jnp.asarray(qd["scale"]))
    assert not calls
    monkeypatch.setenv("LRT_PALLAS_INT8", "1")
    quantize._int8_matmul_2d(x2, jnp.asarray(qd["qvalues_w8a8"]),
                             jnp.asarray(qd["scale"]))
    assert calls == [1]
