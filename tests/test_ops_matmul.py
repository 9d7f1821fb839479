"""Pallas fused dequant-matmul kernels vs the pure-jnp oracle.

Runs in interpret mode on CPU (the TPU-idiomatic replacement for the
reference's CUDA-twin skipif pattern, SURVEY.md §4); the same checks run
compiled on a real chip when one is present.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quanta_tpu import core
from quanta_tpu.ops import matmul as mm

FORMATS = ["nf4", "nf4a", "int4", "fp4", "int8", "nf8", "fp8"]


def _setup(fmt, m=48, k=256, n=192, block=64, seed=0):
    x = jax.random.normal(jax.random.PRNGKey(seed), (m, k), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(seed + 1), (k, n), jnp.float32)
    qt = core.quantize_matmul_weight(w, fmt=fmt, block_size=block)
    ref = x @ core.dequantize_matmul_weight(qt)
    return x, qt, ref


@pytest.mark.parametrize("fmt", FORMATS)
def test_kernel_matches_oracle(fmt):
    x, qt, ref = _setup(fmt)
    out = mm.matmul_quantized(x, qt, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-4)


def test_multiple_k_steps():
    # K large enough to force several grid steps along K (tk=512 < K)
    x, qt, ref = _setup("nf4", m=16, k=2048, n=128)
    out = mm.matmul_quantized(x, qt, interpret=True, tk=512)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-3)


def test_unaligned_m_n():
    # M, N not multiples of the tile: wrapper pads and slices back
    x, qt, ref = _setup("nf4", m=7, k=256, n=100)
    out = mm.matmul_quantized(x, qt, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-4)


def test_batched_input():
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 5, 256), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(4), (256, 128), jnp.float32)
    qt = core.quantize_matmul_weight(w, fmt="nf4", block_size=64)
    ref = x @ core.dequantize_matmul_weight(qt)
    out = mm.matmul_quantized(x, qt, interpret=True)
    assert out.shape == (2, 5, 128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-4)


def test_bf16_activations():
    x, qt, _ = _setup("nf4")
    xb = x.astype(jnp.bfloat16)
    ref = xb.astype(jnp.float32) @ core.dequantize_matmul_weight(qt)
    out = mm.matmul_quantized(xb, qt, interpret=True, out_dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-1
    )


def test_jit_grad_through_dequant():
    """dequant path is differentiable wrt x (weights are frozen codes)."""
    x, qt, _ = _setup("nf4", m=16)

    def loss(xx):
        return jnp.sum(mm.matmul_quantized(xx, qt, interpret=True) ** 2)

    g = jax.grad(loss)(x)
    wd = core.dequantize_matmul_weight(qt)
    g_ref = 2.0 * (x @ wd) @ wd.T
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-4, atol=1e-2)
