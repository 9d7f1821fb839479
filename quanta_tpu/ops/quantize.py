"""Blockwise quantize Pallas kernel.

Quantize-side companion of the fused matmul kernels: computes per-block
absmax and codes in one VMEM pass (the reference's NF4 quantizer
materializes a numel x 16 distance tensor,
/root/reference/Quanta/functional/quantization.py:114-116 — defect #7 in
SURVEY.md §2.7; here nearest-level search is a 15-compare chain against
trace-time-constant midpoints, O(1) extra memory).

Production caller: the int8 KV-cache write path
(serve/kvcache.quantize_kv routes prefill-scale tensors here with
block == head_dim — measured 2.5x faster than the XLA quantize at a
2048-token write; tiny decode-window writes keep XLA, which fuses
into the surrounding program). The 8-bit optimizer requant has its own
fused update kernel (ops/adam8bit.py); weight quantization at load time
uses the XLA path in quanta_tpu.core.codecs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from quanta_tpu.core import codebooks

_EPS = 1e-12


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _code_search(normalized: jax.Array, mids: np.ndarray) -> jax.Array:
    """Nearest sorted-codebook index: idx = #(midpoints < value)."""
    idx = jnp.zeros(normalized.shape, jnp.int32)
    for m in mids:
        idx += (normalized > float(m)).astype(jnp.int32)
    return idx


def _quant_kernel(x_ref, codes_ref, scale_ref, *, mids, qmax):
    x = x_ref[:]
    absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)

    if mids is None:  # symmetric integer grid
        scale = jnp.where(absmax <= _EPS, 1.0, absmax / qmax)
        q = jnp.clip(jnp.round(x / scale), -qmax, qmax)
        # Mosaic has no direct f32 -> {u,i}8 cast; widen through int32.
        codes_ref[:] = q.astype(jnp.int32).astype(codes_ref.dtype)
        scale_ref[:] = scale
    else:  # codebook
        scale = jnp.where(absmax <= _EPS, 1.0, absmax)
        idx = _code_search(x / scale, mids)
        codes_ref[:] = idx.astype(jnp.int32).astype(codes_ref.dtype)
        scale_ref[:] = scale


@functools.partial(
    jax.jit, static_argnames=("block", "fmt", "tb", "interpret")
)
def quantize_blockwise(
    x: jax.Array,
    *,
    fmt: str = "nf4",
    block: int = 64,
    tb: int = 256,
    interpret: bool = False,
):
    """Quantize a flat array blockwise on-chip.

    Returns (codes, scale): codes (n_blocks, block) uint8 (codebook) or
    int8 ("int8_sym"), scale (n_blocks, 1) f32. Input is flattened and
    zero-padded to a whole number of blocks.
    """
    flat = x.reshape(-1).astype(jnp.float32)
    n = flat.shape[0]
    nb = -(-n // block)
    pad = nb * block - n
    if pad:
        flat = jnp.pad(flat, (0, pad))
    blocks = flat.reshape(nb, block)

    if fmt == "int8_sym":
        mids, qmax, ctype = None, 127, jnp.int8
    else:
        mids = np.asarray(codebooks._REGISTRY[fmt])
        mids = (mids[1:] + mids[:-1]) / 2.0
        qmax, ctype = None, jnp.uint8

    tb = min(tb, _round_up(nb, 8))
    nb_pad = _round_up(nb, tb)
    if nb_pad != nb:
        blocks = jnp.pad(blocks, ((0, nb_pad - nb), (0, 0)))

    kernel = functools.partial(_quant_kernel, mids=mids, qmax=qmax)
    codes, scale = pl.pallas_call(
        kernel,
        grid=(nb_pad // tb,),
        in_specs=[pl.BlockSpec((tb, block), lambda i: (i, 0))],
        out_specs=(
            pl.BlockSpec((tb, block), lambda i: (i, 0)),
            pl.BlockSpec((tb, 1), lambda i: (i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb_pad, block), ctype),
            jax.ShapeDtypeStruct((nb_pad, 1), jnp.float32),
        ),
        interpret=interpret,
    )(blocks)
    return codes[:nb], scale[:nb]


def dequantize_blockwise(
    codes: jax.Array, scale: jax.Array, *, fmt: str = "nf4"
) -> jax.Array:
    """XLA-path inverse of :func:`quantize_blockwise` (flat, unshaped)."""
    if fmt == "int8_sym":
        return codes.astype(jnp.float32) * scale
    lv = codebooks.get_codebook(fmt)
    return lv[codes.astype(jnp.int32)] * scale
