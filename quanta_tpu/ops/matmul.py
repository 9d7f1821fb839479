"""Fused dequant-matmul Pallas kernels (the TPU-native kernel backend).

Role-equivalent of the reference's (absent) CUDA kernel backend
(/root/reference/Quanta/backends/__init__.py:17-26 imports a package that
does not exist) and the seam identified at
/root/reference/Quanta/functional/tensor_ops.py:72-82, where quantized
matmul is dequant->fp32 GEMM->requant. Here packed weights stay packed in
HBM; nibbles are unpacked and dequantized in VMEM tiles that feed the MXU
directly, so bf16 weights never materialize in HBM.

Layouts (see quanta_tpu.core.packing / codecs.quantize_matmul_weight):
  - 4-bit: codes (K/2, N) uint8 split_k-packed, scales (K/B, N) f32.
    The kernel computes  x[:, :K/2] @ deq(lo) + x[:, K/2:] @ deq(hi)
    with contiguous activation slices — no lane shuffles.
  - 8-bit: codes (K, N) int8 (symmetric) or uint8 (codebook),
    scales (K/B, N) f32.

Codebook dequant uses a 15-select chain over trace-time-constant levels
(VPU work fully hidden behind the MXU pipeline at these tile sizes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quanta_tpu.core import codebooks
from quanta_tpu.core.qtensor import QuantizedTensor


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


def _lookup(codes: jax.Array, levels: np.ndarray) -> jax.Array:
    """Codebook gather as a select chain (levels are trace-time constants)."""
    out = jnp.full(codes.shape, float(levels[0]), jnp.float32)
    for i in range(1, len(levels)):
        out = jnp.where(codes == i, float(levels[i]), out)
    return out


def _expand_scales(scale_tile: jax.Array, block: int) -> jax.Array:
    """(TK/B, TN) f32 -> (TK, TN): broadcast each scale row over its block."""
    nb, tn = scale_tile.shape
    return jnp.broadcast_to(scale_tile[:, None, :], (nb, block, tn)).reshape(
        nb * block, tn
    )


def _select_expand_scales(s_ref, start, tk: int, block: int) -> jax.Array:
    """Expand scale rows [start, start + tk/block) of the full (S, TN) strip
    to a (TK, TN) tile via a one-hot selection matmul.

    Mosaic cannot prove alignment of a dynamic sublane slice when tk/block
    is not a multiple of 8, so instead of slicing we build P (TK, S) with
    P[r, start + r//block] = 1 and compute P @ strip on the MXU — always
    aligned, negligible FLOPs (S = K/block is tiny).
    """
    s_rows = s_ref.shape[0]
    row_blk = jax.lax.broadcasted_iota(jnp.int32, (tk, s_rows), 0) // block
    col = jax.lax.broadcasted_iota(jnp.int32, (tk, s_rows), 1)
    p = (col == start + row_blk).astype(jnp.float32)
    return jnp.dot(p, s_ref[:], preferred_element_type=jnp.float32)


# ------------------------------------------------------------- 4-bit kernel


def _mm4_kernel(
    x_lo_ref, x_hi_ref, wp_ref, s_ref, out_ref, acc_ref,
    *, levels: np.ndarray, block: int, sb: int, s_half: int, out_dtype,
):
    # s_ref holds the full (K/block, TN) scale strip for this column tile;
    # per-K-step lo/hi slices are cut dynamically (the strip is tiny, and
    # small blocked tiles would violate the (8, 128) min-tile rule).
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    packed = wp_ref[:].astype(jnp.int32)  # widen before shift: Mosaic has no u8 shrui
    lo = packed & 0x0F
    hi = (packed >> 4) & 0x0F

    tkp = lo.shape[0]
    w_lo = _lookup(lo, levels) * _select_expand_scales(s_ref, k * sb, tkp, block)
    w_hi = _lookup(hi, levels) * _select_expand_scales(
        s_ref, k * sb + s_half, tkp, block
    )

    acc_ref[:] += jnp.dot(
        x_lo_ref[:], w_lo.astype(x_lo_ref.dtype), preferred_element_type=jnp.float32
    )
    acc_ref[:] += jnp.dot(
        x_hi_ref[:], w_hi.astype(x_hi_ref.dtype), preferred_element_type=jnp.float32
    )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("codebook", "block", "tm", "tn", "tk", "interpret", "out_dtype"),
)
def matmul_4bit(
    x: jax.Array,
    codes_packed: jax.Array,
    scales: jax.Array,
    *,
    codebook: str = "nf4",
    block: int = 64,
    tm: int = 256,
    tn: int = 256,
    tk: int = 512,
    interpret: bool = False,
    out_dtype=None,
) -> jax.Array:
    """``x (M, K) @ W (K, N)`` where W is split_k-packed 4-bit codebook codes.

    codes_packed: (K/2, N) uint8; scales: (K/block, N) f32.
    tk is the *logical* K consumed per grid step (must be even, and
    tk/2 % block == 0 or block % ... — we require (tk//2) % block == 0).
    """
    m, k_dim = x.shape
    k2, n = codes_packed.shape
    assert k_dim == 2 * k2, (x.shape, codes_packed.shape)
    out_dtype = out_dtype or x.dtype
    levels = np.asarray(codebooks._REGISTRY[codebook])

    # Tile sizing: clamp to problem dims, respect hardware tiling.
    tm = min(tm, _round_up(m, 16))
    tn = min(tn, _round_up(n, 128))
    tkp = min(tk // 2, k2)  # packed rows per step
    while k2 % tkp or tkp % block:
        tkp //= 2
        if tkp < block:
            tkp = block
            break
    assert k2 % tkp == 0 and tkp % block == 0, (k2, tkp, block)

    m_pad = _round_up(m, tm)
    n_pad = _round_up(n, tn)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    if n_pad != n:
        codes_packed = jnp.pad(codes_packed, ((0, 0), (0, n_pad - n)))
        scales = jnp.pad(scales, ((0, 0), (0, n_pad - n)))

    grid = (m_pad // tm, n_pad // tn, k2 // tkp)
    nk_half = k2 // tkp  # block offset of the hi activation half
    sb = tkp // block  # scale rows per step
    s_rows = scales.shape[0]  # = K / block (both halves)

    kernel = functools.partial(
        _mm4_kernel,
        levels=levels, block=block, sb=sb, s_half=s_rows // 2, out_dtype=out_dtype,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tkp), lambda i, j, k: (i, k)),  # x lo half
            pl.BlockSpec((tm, tkp), lambda i, j, k: (i, k + nk_half)),  # x hi
            pl.BlockSpec((tkp, tn), lambda i, j, k: (k, j)),  # packed codes
            pl.BlockSpec((s_rows, tn), lambda i, j, k: (0, j)),  # scale strip
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_pad * k_dim,
            bytes_accessed=m_pad * k_dim * 2 + k2 * n_pad + m_pad * n_pad * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, x, codes_packed, scales)
    return out[:m, :n]


# ------------------------------------------------------------- 8-bit kernel


def _mm8_kernel(
    x_ref, w_ref, s_ref, out_ref, acc_ref, *, levels, block: int, sb: int, out_dtype
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    if levels is None:  # symmetric int8: codes are the values
        w = w_ref[:].astype(jnp.float32)
    else:  # 8-bit codebook (nf8/fp8)
        w = _lookup(w_ref[:].astype(jnp.int32), levels)
    w = w * _select_expand_scales(s_ref, k * sb, w.shape[0], block)

    acc_ref[:] += jnp.dot(
        x_ref[:], w.astype(x_ref.dtype), preferred_element_type=jnp.float32
    )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("codebook", "block", "tm", "tn", "tk", "interpret", "out_dtype"),
)
def matmul_8bit(
    x: jax.Array,
    codes: jax.Array,
    scales: jax.Array,
    *,
    codebook: str | None = None,
    block: int = 64,
    tm: int = 256,
    tn: int = 256,
    tk: int = 512,
    interpret: bool = False,
    out_dtype=None,
) -> jax.Array:
    """``x (M, K) @ W (K, N)`` with 8-bit weight codes and blockwise scales.

    codes: (K, N) int8 (symmetric, codebook=None) or uint8 (nf8/fp8 codebook);
    scales: (K/block, N) f32.
    """
    m, k_dim = x.shape
    kw, n = codes.shape
    assert kw == k_dim
    out_dtype = out_dtype or x.dtype
    levels = None if codebook is None else np.asarray(codebooks._REGISTRY[codebook])

    tm = min(tm, _round_up(m, 16))
    tn = min(tn, _round_up(n, 128))
    tkk = min(tk, k_dim)
    while k_dim % tkk or tkk % block:
        tkk //= 2
        if tkk < block:
            tkk = block
            break
    assert k_dim % tkk == 0 and tkk % block == 0

    m_pad, n_pad = _round_up(m, tm), _round_up(n, tn)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    if n_pad != n:
        codes = jnp.pad(codes, ((0, 0), (0, n_pad - n)))
        scales = jnp.pad(scales, ((0, 0), (0, n_pad - n)))

    grid = (m_pad // tm, n_pad // tn, k_dim // tkk)
    sb = tkk // block
    s_rows = scales.shape[0]

    kernel = functools.partial(
        _mm8_kernel, levels=levels, block=block, sb=sb, out_dtype=out_dtype
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tkk), lambda i, j, k: (i, k)),
            pl.BlockSpec((tkk, tn), lambda i, j, k: (k, j)),
            pl.BlockSpec((s_rows, tn), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_pad * k_dim,
            bytes_accessed=m_pad * k_dim * 2 + k_dim * n_pad + m_pad * n_pad * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, codes, scales)
    return out[:m, :n]


# ----------------------------------------------------------- QT entry point


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _mmq(x: jax.Array, qt: QuantizedTensor, opts: tuple) -> jax.Array:
    kw = dict(opts)
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if qt.packed == "split_k":
        out = matmul_4bit(
            x2, qt.codes, qt.scale, codebook=qt.codebook, block=qt.block_size, **kw
        )
    elif qt.bits == 8:
        out = matmul_8bit(
            x2, qt.codes, qt.scale, codebook=qt.codebook, block=qt.block_size, **kw
        )
    else:
        raise ValueError(f"unsupported matmul layout: {qt.packed}/{qt.bits}bit")
    return out.reshape(*lead, out.shape[-1])


def _mmq_fwd(x, qt, opts):
    return _mmq(x, qt, opts), (x, qt)


def _mmq_bwd(opts, res, g):
    # Quantized weights are frozen codes (QLoRA semantics): only dx flows.
    # Backward dequantizes once per step via the XLA path; fine because the
    # bwd GEMM dominates. dx = g @ W^T.
    from quanta_tpu.core import codecs

    x, qt = res
    w = codecs.dequantize_matmul_weight(qt).astype(g.dtype)
    dx = (g @ w.T).astype(x.dtype)
    return (dx, jax.tree_util.tree_map(jnp.zeros_like, qt))


_mmq.defvjp(_mmq_fwd, _mmq_bwd)


def matmul_quantized(
    x: jax.Array, qt: QuantizedTensor, *, interpret: bool = False, **kw
) -> jax.Array:
    """Dispatch ``x @ dequant(qt)`` to the right fused kernel.

    ``qt`` must be in matmul layout (from core.quantize_matmul_weight).
    Accepts x of any leading batch shape; contracts over the last axis.
    Differentiable in ``x`` (custom VJP; weight codes are frozen).
    """
    opts = tuple(sorted({**kw, "interpret": interpret}.items()))
    return _mmq(x, qt, opts)
