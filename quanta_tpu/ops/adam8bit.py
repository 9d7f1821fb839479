"""Fused 8-bit blockwise Adam update — Pallas TPU kernel.

The native tier of the optimizer (SURVEY.md §2.4: 8-bit optimizer-state
update kernels; the reference stubs the whole optimizer,
/root/reference/Quanta/optim/adam.py:95). The XLA path in
quanta_tpu.optim.adam8bit is numerically identical but materializes the
dequantized fp32 m/v in HBM between the update and the requantize (the
blockwise max forces a pass break). This kernel does the whole
dequant -> moment update -> bias-corrected step -> blockwise requant
in one VMEM pass per tile: HBM traffic per param is
read g(4) + codes(2) + write codes(2) + upd(4) ~= 12 B instead of ~28 B.

State layout matches quanta_tpu.optim.adam8bit: m int8 symmetric absmax
per 256-block; v uint8 4th-root companded per 256-block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 256  # quantization block == lane-dim tile width


def _adam_tile(
    s_ref, g_ref, mc_ref, ms_ref, vc_ref, vs_ref,
    upd_ref, mco_ref, mso_ref, vco_ref, vso_ref,
    *, b1: float, b2: float, eps: float,
):
    """One (TR, BLOCK) tile: rows are quant blocks, lanes are elements."""
    lr = s_ref[0, 0]
    bc1 = s_ref[0, 1]
    bc2 = s_ref[0, 2]

    g = g_ref[:].astype(jnp.float32)
    # Mosaic has no direct {u,i}8 <-> f32 cast; widen through int32.
    m = mc_ref[:].astype(jnp.int32).astype(jnp.float32) * ms_ref[:]
    vcomp = vc_ref[:].astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)
    v = (vcomp * vcomp) * (vcomp * vcomp) * vs_ref[:]

    m = b1 * m + (1.0 - b1) * g
    v = b2 * v + (1.0 - b2) * g * g

    upd_ref[:] = (-(lr / bc1) * m / (jnp.sqrt(v / bc2) + eps)).astype(
        upd_ref.dtype
    )

    ms = jnp.maximum(jnp.max(jnp.abs(m), axis=1, keepdims=True) / 127.0, 1e-12)
    mco_ref[:] = (
        jnp.clip(jnp.round(m / ms), -127, 127)
        .astype(jnp.int32)
        .astype(jnp.int8)
    )
    mso_ref[:] = ms
    vs = jnp.maximum(jnp.max(v, axis=1, keepdims=True), 1e-12)
    comp = jnp.sqrt(jnp.sqrt(jnp.clip(v / vs, 0.0, 1.0)))
    vco_ref[:] = (
        jnp.clip(jnp.round(comp * 255.0), 0, 255)
        .astype(jnp.int32)
        .astype(jnp.uint8)
    )
    vso_ref[:] = vs


@functools.partial(
    jax.jit, static_argnames=("b1", "b2", "eps", "tr", "interpret")
)
def adam8bit_update(
    g_blocks: jax.Array,   # (nb, BLOCK) f32 (or castable)
    m_codes: jax.Array,    # (nb, BLOCK) int8
    m_scale: jax.Array,    # (nb, 1) f32
    v_codes: jax.Array,    # (nb, BLOCK) uint8
    v_scale: jax.Array,    # (nb, 1) f32
    lr,
    bc1,
    bc2,
    *,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    tr: int = 256,
    interpret: bool = False,
):
    """Fused blockwise-8-bit Adam step over pre-blockified state.

    Returns (upd_blocks f32, m_codes', m_scale', v_codes', v_scale').
    lr/bc1/bc2 are traced scalars (they change every step — passed as an
    SMEM operand so the kernel compiles once).
    """
    nb = g_blocks.shape[0]
    tr = min(tr, nb)
    pad = (-nb) % tr
    if pad:
        zb = lambda a, fill=0: jnp.pad(a, ((0, pad), (0, 0)),
                                       constant_values=fill)
        g_blocks, m_codes, v_codes = map(zb, (g_blocks, m_codes, v_codes))
        m_scale = zb(m_scale, 1.0)
        v_scale = zb(v_scale, 1.0)
    nbp = nb + pad

    scalars = jnp.stack(
        [jnp.asarray(lr, jnp.float32), jnp.asarray(bc1, jnp.float32),
         jnp.asarray(bc2, jnp.float32)]
    ).reshape(1, 3)

    grid = (nbp // tr,)
    row = pl.BlockSpec((tr, BLOCK), lambda i: (i, 0))
    srow = pl.BlockSpec((tr, 1), lambda i: (i, 0))
    kernel = functools.partial(_adam_tile, b1=b1, b2=b2, eps=eps)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
            row, row, srow, row, srow,
        ],
        out_specs=[row, row, srow, row, srow],
        out_shape=[
            jax.ShapeDtypeStruct((nbp, BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((nbp, BLOCK), jnp.int8),
            jax.ShapeDtypeStruct((nbp, 1), jnp.float32),
            jax.ShapeDtypeStruct((nbp, BLOCK), jnp.uint8),
            jax.ShapeDtypeStruct((nbp, 1), jnp.float32),
        ],
        interpret=interpret,
    )(scalars, g_blocks.astype(jnp.float32), m_codes, m_scale, v_codes,
      v_scale)
    if pad:
        out = [a[:nb] for a in out]
    return tuple(out)
