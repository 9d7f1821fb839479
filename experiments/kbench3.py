"""Localize fused-kernel time at decode shapes: which stage is the bound?

Variants of the 4-bit kernel body, same tiling/grid, M=8:
  full      unpack + poly dequant + scale expand (production nf4a)
  nopoly    unpack + cast + scale expand         (poly cost)
  noscale   unpack + poly, no scale expand       (scale cost)
  castonly  unpack + cast only                   (floor: unpack+convert)
plus dense bf16 and the production int8 kernel for reference.

Run on TPU: python experiments/kbench3.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from quanta_tpu.core import codecs  # noqa: E402
from quanta_tpu.ops import matmul as mm  # noqa: E402


def slope_time(op, x, L0=16, L1=272, reps=4):
    t = {}
    for L in (L0, L1):

        @jax.jit
        def loop(seed, L=L):
            def body(acc, _):
                xi = x + (acc * 1e-30).astype(x.dtype)
                out = op(xi)
                return out.astype(jnp.float32).sum() * 1e-30, None

            acc, _ = jax.lax.scan(body, seed, None, length=L)
            return acc

        np.asarray(loop(jnp.float32(0)))
        best = 1e9
        for r in range(reps):
            t0 = time.perf_counter()
            np.asarray(loop(jnp.float32(r + 1)))
            best = min(best, time.perf_counter() - t0)
        t[L] = best
    return max((t[L1] - t[L0]) / (L1 - L0), 1e-9)


def make_variant_kernel(variant, block, out_dtype):
    def kern(x_lo_ref, x_hi_ref, wp_ref, s_lo_ref, s_hi_ref, out_ref, acc_ref):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        packed = wp_ref[:].astype(jnp.int32)
        lo = packed & 0x0F
        hi = packed >> 4

        def poly(c):
            cf = c.astype(jnp.float32)
            out = jnp.full(cf.shape, 0.1, jnp.float32)
            for a in (0.2, 0.3, 0.4):
                out = out * cf + a
            return out

        def expand(s):
            nb, tn = s.shape
            return jnp.broadcast_to(s[:, None, :], (nb, block, tn)).reshape(
                nb * block, tn
            )

        if variant == "full":
            w_lo = poly(lo) * expand(s_lo_ref[:])
            w_hi = poly(hi) * expand(s_hi_ref[:])
        elif variant == "nopoly":
            w_lo = lo.astype(jnp.float32) * expand(s_lo_ref[:])
            w_hi = hi.astype(jnp.float32) * expand(s_hi_ref[:])
        elif variant == "noscale":
            w_lo = poly(lo)
            w_hi = poly(hi)
        elif variant == "castonly":
            w_lo = lo.astype(jnp.float32)
            w_hi = hi.astype(jnp.float32)
        acc_ref[:] += jnp.dot(
            x_lo_ref[:], w_lo.astype(x_lo_ref.dtype),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] += jnp.dot(
            x_hi_ref[:], w_hi.astype(x_hi_ref.dtype),
            preferred_element_type=jnp.float32,
        )

        @pl.when(k == pl.num_programs(2) - 1)
        def _():
            out_ref[:] = acc_ref[:].astype(out_dtype)

    return kern


def run_variant(x, codes, scales, variant, block=64, tn=None, tkp=None):
    m, k_dim = x.shape
    k2, n = codes.shape
    if k_dim < 2 * k2:
        x = jnp.pad(x, ((0, 0), (0, 2 * k2 - k_dim)))
    tm = 16
    tn = tn or mm._pick_tile_n(n)
    cap = max(8 * block, (1 << 20) // (2 * tn) * 2)
    tkp = tkp or mm._pick_tile_k(k2, 8 * block, cap)
    sb = tkp // block
    m_pad = 16
    x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    grid = (1, n // tn, k2 // tkp)
    nk_half = k2 // tkp
    kern = make_variant_kernel(variant, block, jnp.bfloat16)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tkp), lambda i, j, k: (i, k)),
            pl.BlockSpec((tm, tkp), lambda i, j, k: (i, k + nk_half)),
            pl.BlockSpec((tkp, tn), lambda i, j, k: (k, j)),
            pl.BlockSpec((sb, tn), lambda i, j, k: (k, j)),
            pl.BlockSpec((sb, tn), lambda i, j, k: (k + nk_half, j)),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(x, x, codes, scales, scales)
    return out[:m]


def main():
    print("device:", jax.devices()[0], flush=True)
    M, block = 8, 64
    for label, K, N in [("qkv 2048x2048", 2048, 2048),
                        ("gate 2048x5632", 2048, 5632),
                        ("down 5632x2048", 5632, 2048)]:
        kx, kw = jax.random.split(jax.random.PRNGKey(K + N))
        x = jax.random.normal(kx, (M, K), jnp.bfloat16)
        w = jax.random.normal(kw, (K, N), jnp.float32) * 0.02
        wb = w.astype(jnp.bfloat16)
        qt = codecs.quantize_matmul_weight(w, fmt="nf4a", block_size=block)
        qt8 = codecs.quantize_matmul_weight(w, fmt="int8", block_size=block)
        t_dense = slope_time(lambda a: a @ wb, x)
        t_int8 = slope_time(lambda a: mm.matmul_quantized(a, qt8), x)
        t_prod = slope_time(lambda a: mm.matmul_quantized(a, qt), x)
        row = [f"dense {t_dense*1e6:7.1f}", f"int8 {t_int8*1e6:7.1f}",
               f"prod4 {t_prod*1e6:7.1f}"]
        for variant in ("full", "nopoly", "noscale", "castonly"):
            t = slope_time(
                lambda a, v=variant: run_variant(a, qt.codes, qt.scale, v,
                                                 block=block), x)
            row.append(f"{variant} {t*1e6:7.1f}")
        print(f"{label}: " + " | ".join(row), flush=True)

    # tile sweep on gate shape for the production kernel
    K, N = 2048, 5632
    kx, kw = jax.random.split(jax.random.PRNGKey(7))
    x = jax.random.normal(kx, (M, K), jnp.bfloat16)
    w = jax.random.normal(kw, (K, N), jnp.float32) * 0.02
    qt = codecs.quantize_matmul_weight(w, fmt="nf4a", block_size=block)
    print("\ntile sweep gate 2048x5632 nf4a (tn x tk):", flush=True)
    for tn in (128, 256, 512):
        for tk in (1024, 2048):
            if (qt.codes.shape[0] * 2) % tk or N % tn:
                continue
            try:
                t = slope_time(
                    lambda a, tn=tn, tk=tk: mm.matmul_quantized(
                        a, qt, tn=tn, tk=tk), x)
                print(f"  tn={tn} tk={tk}: {t*1e6:7.1f} us", flush=True)
            except Exception as e:
                print(f"  tn={tn} tk={tk}: FAIL {e}", flush=True)


if __name__ == "__main__":
    main()
