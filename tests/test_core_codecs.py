"""Round-trip property tests for the quantization core.

Mirrors the reference's unit-test strategy (dtype / value-range / allclose
tolerance per bit-width, zero & constant edge cases —
/root/reference/Quanta/tests/test_quantization.py) on the new single-scale
convention core, plus blockwise and packing coverage the reference lacks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quanta_tpu import core


def _rand(shape, seed=0, scale=3.0):
    return scale * jax.random.normal(jax.random.PRNGKey(seed), shape)


# ----------------------------------------------------------- 8-bit schemes


@pytest.mark.parametrize("scheme", ["symmetric", "affine"])
@pytest.mark.parametrize("block", [0, 64, 256])
def test_int8_roundtrip(scheme, block):
    x = _rand((128, 96), seed=1)
    qt = core.quantize(x, bits=8, scheme=scheme, block_size=block)
    assert qt.codes.dtype == (jnp.int8 if scheme == "symmetric" else jnp.uint8)
    y = core.dequantize(qt)
    assert y.shape == x.shape and y.dtype == x.dtype
    err = jnp.abs(y - x).max()
    # max error <= scale/2 per block; with blockwise, bound by largest scale
    bound = (qt.scale.max() if scheme == "affine" else qt.scale.max()) * 0.51
    assert err <= bound + 1e-6
    assert jnp.abs(y - x).mean() < 0.05 * jnp.abs(x).std()


@pytest.mark.parametrize("cb", ["nf4", "fp4", "int4"])
@pytest.mark.parametrize("block", [0, 64])
def test_4bit_codebook_roundtrip(cb, block):
    x = _rand((64, 64), seed=2, scale=1.5)
    bits = 4
    qt = core.quantize(x, bits=bits, scheme="codebook", codebook=cb, block_size=block)
    assert qt.codes.dtype == jnp.uint8
    assert int(qt.codes.max()) <= 15
    y = core.dequantize(qt)
    assert y.shape == x.shape
    # principled bound: nearest-level error <= half the largest codebook gap
    # times the block absmax (+ fp slack)
    lv = np.asarray(core.get_codebook(cb))
    half_gap = np.diff(lv).max() / 2
    assert jnp.abs(y - x).max() <= half_gap * qt.scale.max() + 1e-5
    # uniform-grid worst case: mean error ~= half_gap/2 per element
    assert jnp.abs(y - x).mean() < 0.55 * half_gap * qt.scale.max()


@pytest.mark.parametrize("cb", ["nf8", "fp8"])
def test_8bit_codebook_roundtrip(cb):
    x = _rand((64, 64), seed=3, scale=2.0)
    qt = core.quantize(x, bits=8, scheme="codebook", codebook=cb, block_size=64)
    y = core.dequantize(qt)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=0.05, atol=0.05)


def test_nf4_levels_exact():
    """The NF4 codebook reproduces QLoRA's exact constants and a tensor of
    exactly those values round-trips bit-exactly."""
    lv = np.asarray(core.get_codebook("nf4"))
    assert lv[0] == -1.0 and lv[-1] == 1.0 and lv[7] == 0.0
    x = jnp.asarray(lv) * 0.37
    qt = core.quantize(x, bits=4, scheme="codebook", codebook="nf4")
    y = core.dequantize(qt)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-6)


# ------------------------------------------------------------- edge cases


@pytest.mark.parametrize("scheme", ["symmetric", "affine", "codebook"])
def test_zero_tensor(scheme):
    x = jnp.zeros((32, 32))
    kw = dict(codebook="nf4", bits=4) if scheme == "codebook" else dict(bits=8)
    qt = core.quantize(x, scheme=scheme, block_size=64, **kw)
    y = core.dequantize(qt)
    np.testing.assert_array_equal(np.asarray(y), 0.0)


def test_constant_tensor():
    x = jnp.full((16, 16), 2.5)
    qt = core.quantize(x, bits=8, scheme="affine", block_size=64)
    y = core.dequantize(qt)
    np.testing.assert_allclose(np.asarray(y), 2.5, rtol=1e-2)


def test_odd_sizes_pad():
    x = _rand((7, 13), seed=4)  # 91 elements, not divisible by block
    qt = core.quantize(x, bits=8, scheme="symmetric", block_size=64)
    y = core.dequantize(qt)
    assert y.shape == (7, 13)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=0.05, atol=0.05)


# ---------------------------------------------------------------- packing


def test_pack_nibbles_roundtrip():
    codes = jnp.arange(17, dtype=jnp.uint8) % 16  # odd length
    packed = core.pack_nibbles(codes)
    assert packed.shape[0] == 9
    out = core.unpack_nibbles(packed, 17)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(codes))


def test_pack_split_k_roundtrip():
    codes = (jnp.arange(8 * 6, dtype=jnp.uint8) % 16).reshape(8, 6)
    packed = core.pack_split_k(codes)
    assert packed.shape == (4, 6)
    out = core.unpack_split_k(packed)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(codes))


def test_quantize_packed_nibbles():
    x = _rand((32, 32), seed=5)
    qt = core.quantize(x, bits=4, scheme="codebook", codebook="nf4", block_size=64, pack=True)
    assert qt.codes.shape[0] == 32 * 32 // 2
    y = core.dequantize(qt)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=0.2, atol=0.35)


# --------------------------------------------------- matmul-layout weights


@pytest.mark.parametrize("fmt", ["nf4", "nf4a", "int4", "fp4", "int8", "nf8", "fp8"])
def test_matmul_weight_roundtrip(fmt):
    w = _rand((1024, 128), seed=6)  # already tile-aligned: no padding
    qt = core.quantize_matmul_weight(w, fmt=fmt, block_size=64)
    assert qt.scale.shape == (16, 128)
    if qt.packed == "split_k":
        assert qt.codes.shape == (512, 128)
    wd = core.dequantize_matmul_weight(qt)
    assert wd.shape == w.shape
    if qt.scheme == "symmetric":  # int8 grid: half-step = scale/2
        bound = 0.51 * qt.scale.max()
    else:
        lv = np.asarray(core.get_codebook(fmt))
        bound = np.diff(lv).max() / 2 * qt.scale.max() + 1e-5
    assert jnp.abs(wd - w).max() <= bound


def test_matmul_weight_compression():
    w = _rand((1024, 128), seed=7)
    qt = core.quantize_matmul_weight(w, fmt="nf4", block_size=64)
    assert qt.compression_ratio > 6.0  # ~7.1x vs f32 incl. scales


def test_matmul_weight_padding_roundtrip():
    # K=256 pads to 1024, N=96 pads to 128; logical shape survives and the
    # padded rows/cols are sliced away on dequant.
    w = _rand((256, 96), seed=9)
    qt = core.quantize_matmul_weight(w, fmt="nf4a", block_size=64)
    assert qt.shape == (256, 96)
    assert qt.codes.shape == (512, 128) and qt.scale.shape == (16, 128)
    wd = core.dequantize_matmul_weight(qt)
    assert wd.shape == w.shape
    assert jnp.abs(wd - w).max() < 0.2 * float(jnp.abs(w).max())


def test_qtensor_is_pytree():
    x = _rand((64, 64), seed=8)
    qt = core.quantize_matmul_weight(x, fmt="nf4")

    @jax.jit
    def deq(q):
        return core.dequantize_matmul_weight(q)

    y = deq(qt)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(core.dequantize_matmul_weight(qt)), rtol=1e-6
    )


# ------------------------------------------------- quantized elementwise ops
# (reference parity: /root/reference/Quanta/functional/tensor_ops.py:64-105)


def test_quantized_add_mul_matmul():
    from quanta_tpu.core import (quantize, dequantize, quantized_add,
                                 quantized_matmul, quantized_mul)

    a = jax.random.normal(jax.random.PRNGKey(0), (32, 64), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(1), (32, 64), jnp.float32)
    qa = quantize(a, bits=8, scheme="symmetric", block_size=32)
    qb = quantize(b, bits=8, scheme="symmetric", block_size=32)

    for op, ref in ((quantized_add, a + b), (quantized_mul, a * b)):
        out = op(qa, qb)
        assert out.bits == 8 and out.scheme == "symmetric"
        tol = float(jnp.abs(ref).max()) / 60  # two int8 round trips
        np.testing.assert_allclose(np.asarray(dequantize(out)),
                                   np.asarray(ref), atol=tol)

    # mixed operand: plain array + QuantizedTensor takes the QT's params
    out = quantized_add(a, qb)
    assert out.bits == 8
    # matmul requantizes the product
    qm = quantized_matmul(qa, quantize(b.T, bits=8, block_size=32))
    ref = a @ b.T
    assert qm.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(dequantize(qm)), np.asarray(ref),
        atol=float(jnp.abs(ref).max()) / 40,
    )
    with pytest.raises(TypeError):
        quantized_add(a, b)


def test_quantized_relu_exact_paths():
    from quanta_tpu.core import dequantize, quantize, quantized_relu

    x = jax.random.normal(jax.random.PRNGKey(2), (64, 32), jnp.float32)
    # symmetric: code-level clamp, EXACT (no requantization error)
    qs = quantize(x, bits=8, scheme="symmetric", block_size=32)
    r = quantized_relu(qs)
    np.testing.assert_array_equal(
        np.asarray(dequantize(r)),
        np.asarray(jnp.maximum(dequantize(qs), 0.0)),
    )
    # codebook with an exact 0 level (nf4): negative levels -> code of 0
    qc = quantize(x, bits=4, scheme="codebook", codebook="nf4", block_size=32)
    rc = quantized_relu(qc)
    np.testing.assert_array_equal(
        np.asarray(dequantize(rc)),
        np.asarray(jnp.maximum(dequantize(qc), 0.0)),
    )
    # affine falls back to requantization: still close to fp relu
    qaf = quantize(x, bits=8, scheme="affine", block_size=32)
    raf = quantized_relu(qaf)
    np.testing.assert_allclose(
        np.asarray(dequantize(raf)),
        np.asarray(jnp.maximum(x, 0.0)),
        atol=float(jnp.abs(x).max()) / 50,
    )
