"""Quantized elementwise / matmul ops over QuantizedTensor.

Parity with the reference's ``functional/tensor_ops.py:64-105``
(`quantize_add`, `quantized_mul`, `quantized_relu`, `quantized_matmul`),
which implements every op as dequantize -> fp op -> requantize. The same
semantics here, expressed over :class:`QuantizedTensor` so the result
carries its quantization parameters instead of loose (q, scale, zp)
triples — and `quantized_relu` exploits structure instead of requantizing
when it can (symmetric grids and codebooks are sign-symmetric, so ReLU is
a code-level clamp).

These are the reference-path semantics for small/odd tensors; the serving
hot path never uses them (matmuls go through the fused Pallas kernels,
ops.matmul). They matter for API parity and for composing quantized
pipelines outside the model graph.
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp

from quanta_tpu.core import codebooks
from quanta_tpu.core.codecs import dequantize, quantize
from quanta_tpu.core.qtensor import QuantizedTensor

ArrayOrQT = Union[jax.Array, QuantizedTensor]


def _to_array(x: ArrayOrQT) -> jax.Array:
    return dequantize(x) if isinstance(x, QuantizedTensor) else jnp.asarray(x)


def _requant_like(x: jax.Array, like: QuantizedTensor) -> QuantizedTensor:
    """Quantize ``x`` under ``like``'s settings (bits/scheme/codebook/
    block size/packing) — the reference's convention that the left
    operand's parameters win (tensor_ops.py:64-70)."""
    return quantize(
        x,
        bits=like.bits,
        scheme=like.scheme,
        codebook=like.codebook,
        block_size=like.block_size,
        pack=like.packed != "none",
    )


def _pick_like(a: ArrayOrQT, b: Optional[ArrayOrQT] = None) -> QuantizedTensor:
    for x in (a, b):
        if isinstance(x, QuantizedTensor):
            return x
    raise TypeError("at least one operand must be a QuantizedTensor")


def quantized_add(a: ArrayOrQT, b: ArrayOrQT) -> QuantizedTensor:
    """Elementwise add; result requantized under the first quantized
    operand's parameters (ref `quantize_add`, tensor_ops.py:64-70)."""
    like = _pick_like(a, b)
    return _requant_like(_to_array(a) + _to_array(b), like)


def quantized_mul(a: ArrayOrQT, b: ArrayOrQT) -> QuantizedTensor:
    """Elementwise multiply (ref `quantized_mul`, tensor_ops.py:84-94)."""
    like = _pick_like(a, b)
    return _requant_like(_to_array(a) * _to_array(b), like)


def quantized_matmul(a: ArrayOrQT, b: ArrayOrQT) -> QuantizedTensor:
    """Matmul with requantized output (ref `quantized_matmul`,
    tensor_ops.py:72-82). Reference-path semantics: for performance use
    ops.matmul.matmul_quantized, which never materializes the product in
    float across HBM."""
    like = _pick_like(a, b)
    out = jnp.matmul(_to_array(a), _to_array(b))
    return _requant_like(out, like)


def quantized_relu(qt: QuantizedTensor) -> QuantizedTensor:
    """ReLU (ref `quantized_relu`, tensor_ops.py:96-105).

    Exact-by-construction fast paths (no requantization error):
      * symmetric grids: codes are signed; relu = max(codes, 0) reuses
        the same scales (zeros stay exactly representable).
      * codebooks: map each negative level's code to the code of 0.0 if
        the codebook has one (NF4's index 7 is exactly 0), else fall
        back to the dequant round trip.
    Affine tensors requantize (their grid need not contain 0).
    """
    if qt.scheme == "symmetric" and qt.packed == "none":
        return QuantizedTensor(
            codes=jnp.maximum(qt.codes, 0),
            scale=qt.scale,
            zero_point=qt.zero_point,
            bits=qt.bits,
            scheme=qt.scheme,
            codebook=qt.codebook,
            shape=qt.shape,
            dtype=qt.dtype,
            block_size=qt.block_size,
            packed=qt.packed,
        )
    if qt.scheme == "codebook" and qt.packed == "none":
        levels = codebooks._REGISTRY[qt.codebook]
        zero_codes = (levels == 0.0).nonzero()[0]
        if len(zero_codes):
            zc = int(zero_codes[0])
            neg = levels < 0.0
            remap = jnp.asarray(
                [zc if neg[i] else i for i in range(len(levels))],
                qt.codes.dtype,
            )
            return QuantizedTensor(
                codes=jnp.take(remap, qt.codes.astype(jnp.int32)).astype(
                    qt.codes.dtype),
                scale=qt.scale,
                zero_point=qt.zero_point,
                bits=qt.bits,
                scheme=qt.scheme,
                codebook=qt.codebook,
                shape=qt.shape,
                dtype=qt.dtype,
                block_size=qt.block_size,
                packed=qt.packed,
            )
    return _requant_like(jnp.maximum(_to_array(qt), 0.0), qt)
