"""Round-2 perf: restructure 4-bit kernel body to cut VPU ops/element.

Current production body (per element): unpack(~1) + i32->f32 convert(1)
+ Horner FMA(3) + scale mul(1) + f32->bf16 cast(1) ~= 7 VPU ops. At decode
shapes the kernel is VPU-bound, so each op removed is ~14% off the time.

Variants (same tiling/grid):
  prod        production kernel body (scale expand, bf16 cast)
  blockdot    per-scale-block sub-dots, post-scale FMA on (tm,tn) acc,
              weights stay f32 for the dot -> removes scale mul + cast
  batchdot    same math as blockdot via one dot_general with batch dim sb
  bf16h       Horner in bf16 (i32->bf16 convert), big dot, scale expand
              in bf16 -> tests whether VPU runs bf16 at 2x
  blockbf16   blockdot but Horner in bf16, dots in bf16

Run on TPU: python experiments/kbench4.py
"""

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

COEFFS = None  # set in main from the nf4a codebook


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


def horner(cf, dtype=jnp.float32):
    out = jnp.full(cf.shape, jnp.asarray(COEFFS[0], dtype), dtype)
    for a in COEFFS[1:]:
        out = out * cf + jnp.asarray(a, dtype)
    return out


def make_kernel(variant, block, out_dtype):
    def kern(x_lo_ref, x_hi_ref, wp_ref, s_lo_ref, s_hi_ref, out_ref, acc_ref):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        packed = wp_ref[:].astype(jnp.int32)
        lo = packed & 0x0F
        hi = packed >> 4
        sb = s_lo_ref.shape[0]
        tm = x_lo_ref.shape[0]

        def expand(s, dt=jnp.float32):
            nb, tn = s.shape
            return (
                jnp.broadcast_to(s[:, None, :], (nb, block, tn))
                .reshape(nb * block, tn)
                .astype(dt)
            )

        if variant == "prod":
            w_lo = horner(lo.astype(jnp.float32)) * expand(s_lo_ref[:])
            w_hi = horner(hi.astype(jnp.float32)) * expand(s_hi_ref[:])
            acc_ref[:] += jnp.dot(
                x_lo_ref[:], w_lo.astype(x_lo_ref.dtype),
                preferred_element_type=jnp.float32)
            acc_ref[:] += jnp.dot(
                x_hi_ref[:], w_hi.astype(x_hi_ref.dtype),
                preferred_element_type=jnp.float32)
        elif variant == "bf16h":
            w_lo = horner(lo.astype(jnp.bfloat16), jnp.bfloat16) * expand(
                s_lo_ref[:], jnp.bfloat16)
            w_hi = horner(hi.astype(jnp.bfloat16), jnp.bfloat16) * expand(
                s_hi_ref[:], jnp.bfloat16)
            acc_ref[:] += jnp.dot(
                x_lo_ref[:], w_lo, preferred_element_type=jnp.float32)
            acc_ref[:] += jnp.dot(
                x_hi_ref[:], w_hi, preferred_element_type=jnp.float32)
        elif variant in ("blockdot", "blockbf16"):
            dt = jnp.bfloat16 if variant == "blockbf16" else jnp.float32
            w_lo = horner(lo.astype(dt), dt)
            w_hi = horner(hi.astype(dt), dt)
            for half, (xr, w, sr) in enumerate(
                [(x_lo_ref, w_lo, s_lo_ref), (x_hi_ref, w_hi, s_hi_ref)]
            ):
                for b in range(sb):
                    part = jnp.dot(
                        xr[:, b * block:(b + 1) * block],
                        w[b * block:(b + 1) * block, :],
                        preferred_element_type=jnp.float32,
                    )
                    acc_ref[:] += part * sr[b:b + 1, :]
        elif variant == "batchdot":
            tn = s_lo_ref.shape[1]
            for xr, codes, sr in (
                (x_lo_ref, lo, s_lo_ref), (x_hi_ref, hi, s_hi_ref)
            ):
                w = horner(codes.astype(jnp.float32)).reshape(sb, block, tn)
                xb = xr[:].reshape(tm, sb, block).transpose(1, 0, 2)
                # (sb, tm, block) @ (sb, block, tn) -> (sb, tm, tn)
                part = jax.lax.dot_general(
                    xb.astype(jnp.float32), w,
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                acc_ref[:] += jnp.sum(part * sr[:][:, None, :], axis=0)

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
    kern = make_kernel(variant, block, jnp.bfloat16)
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


VARIANTS = ("prod", "blockdot", "bf16h", "blockbf16")


def main():
    global COEFFS
    from quanta_tpu.core import codebooks

    COEFFS = [float(a) for a in codebooks.get_poly_coeffs("nf4a")]
    print("device:", jax.devices()[0], flush=True)
    M, block = 8, 64
    for label, K, N in [("qkv 2048x2048", 2048, 2048),
                        ("gate 2048x5632", 2048, 5632),
                        ("down 5632x2048", 5632, 2048),
                        ("lm_head 2048x32000", 2048, 32000)]:
        kx, kw = jax.random.split(jax.random.PRNGKey(K + N))
        x = jax.random.normal(kx, (M, K), jnp.bfloat16)
        w = jax.random.normal(kw, (K, N), jnp.float32) * 0.02
        wb = w.astype(jnp.bfloat16)
        qt = codecs.quantize_matmul_weight(w, fmt="nf4a", block_size=block)
        t_dense = slope_time(lambda a: a @ wb, x)
        row = [f"dense {t_dense*1e6:7.1f}"]
        ref = np.asarray(
            run_variant(x, qt.codes, qt.scale, "prod", block=block),
            np.float32)
        for variant in VARIANTS:
            try:
                t = slope_time(
                    lambda a, v=variant: run_variant(a, qt.codes, qt.scale, v,
                                                     block=block), x)
                got = np.asarray(
                    run_variant(x, qt.codes, qt.scale, variant, block=block),
                    np.float32)
                err = float(
                    np.max(np.abs(got - ref)) / (np.abs(ref).max() + 1e-9))
                row.append(f"{variant} {t*1e6:7.1f}({err:.0e})")
            except Exception as e:
                row.append(f"{variant} FAIL({type(e).__name__})")
            print(f"{label}: " + " | ".join(row), flush=True)

    # tkp sweep for the best variant on gate shape
    K, N = 2048, 5632
    kx, kw = jax.random.split(jax.random.PRNGKey(7))
    x = jax.random.normal(kx, (M, K), jnp.bfloat16)
    w = jax.random.normal(kw, (K, N), jnp.float32) * 0.02
    qt = codecs.quantize_matmul_weight(w, fmt="nf4a", block_size=block)
    print("\ntkp sweep gate 2048x5632 (blockdot):", flush=True)
    for tkp in (512, 1024):
        if qt.codes.shape[0] % tkp:
            continue
        t = slope_time(
            lambda a, tkp=tkp: run_variant(a, qt.codes, qt.scale, "blockdot",
                                           block=block, tkp=tkp), x)
        print(f"  tkp={tkp}: {t*1e6:7.1f} us", flush=True)


if __name__ == "__main__":
    main()
