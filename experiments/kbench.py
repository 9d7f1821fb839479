"""Kernel microbenchmark: fused NF4 dequant-matmul variants at decode shapes.

Timing loops run INSIDE jit (lax.scan with a data dependence between
iterations) because per-dispatch latency through the axon tunnel is ~700us
and would swamp single-op timings.

Findings feed quanta_tpu/ops/matmul.py (VERDICT.md next-round #1).
"""

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from quanta_tpu.core import codebooks, codecs  # noqa: E402
from quanta_tpu.ops import matmul as mm0  # noqa: E402


def cdiv(a, b):
    return -(-a // b)


def round_up(x, m):
    return cdiv(x, m) * m


def bench_in_jit(fn, x, *rest, iters=64):
    """Mean seconds per fn(x, *rest) call, measured inside one jit."""

    @jax.jit
    def loop(x, *rest):
        def body(acc, _):
            xi = x + (acc * 1e-30).astype(x.dtype)
            out = fn(xi, *rest)
            return out.astype(jnp.float32).sum() * 1e-30, None

        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return acc

    loop(x, *rest).block_until_ready()  # compile
    n_rep = 3
    best = 1e9
    for _ in range(n_rep):
        t0 = time.perf_counter()
        loop(x, *rest).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


# ----------------------------------------------------------------- lookups


def lut_chain(c, levels):
    out = jnp.full(c.shape, float(levels[0]), jnp.float32)
    for i in range(1, len(levels)):
        out = jnp.where(c == i, float(levels[i]), out)
    return out


def lut_tree(c, levels):
    """4-level binary select tree: 4 masks + 15 selects (vs 15 cmp + 15 sel)."""
    b0 = (c & 1) != 0
    b1 = (c & 2) != 0
    b2 = (c & 4) != 0
    b3 = (c & 8) != 0
    lv = [float(v) for v in levels]
    t = [jnp.where(b0, lv[2 * j + 1], lv[2 * j]) for j in range(8)]
    u = [jnp.where(b1, t[2 * j + 1], t[2 * j]) for j in range(4)]
    v = [jnp.where(b2, u[2 * j + 1], u[2 * j]) for j in range(2)]
    return jnp.where(b3, v[1], v[0])


def lut_tree_bf16(c, levels):
    b0 = (c & 1) != 0
    b1 = (c & 2) != 0
    b2 = (c & 4) != 0
    b3 = (c & 8) != 0
    lv = [jnp.bfloat16(v) for v in np.asarray(levels, np.float32)]
    t = [jnp.where(b0, lv[2 * j + 1], lv[2 * j]) for j in range(8)]
    u = [jnp.where(b1, t[2 * j + 1], t[2 * j]) for j in range(4)]
    v = [jnp.where(b2, u[2 * j + 1], u[2 * j]) for j in range(2)]
    return jnp.where(b3, v[1], v[0])


def expand_scales(scale_tile, block):
    nb, tn = scale_tile.shape
    return jnp.broadcast_to(scale_tile[:, None, :], (nb, block, tn)).reshape(
        nb * block, tn
    )


# --------------------------------------------------------- kernel factory


def build_mm4(lut="tree", scale_mode="expand", block=64, tk=4096, tm=16, tn=512,
              deq_dtype="f32"):
    """Fused 4-bit dequant matmul with configurable lookup + scale handling.

    lut: "chain" | "tree" | "tree_bf16" | "int4_arith" (arithmetic, for the
         uniform int4 grid: v = max(c-8, -7); scale pre-divided by 7)
    scale_mode: "expand" (broadcast-reshape to (tkp, tn), mul into w)
                | "blockdot" (per-block dots, scale folded at accumulation)
    """
    levels = codebooks._REGISTRY["nf4"]

    def kern(x_lo, x_hi, wp, s_lo, s_hi, out, acc):
        k = pl.program_id(2)
        nk = pl.num_programs(2)

        @pl.when(k == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        p32 = wp[:].astype(jnp.int32)
        lo = p32 & 0x0F
        hi = p32 >> 4
        if lut == "chain":
            w_lo, w_hi = lut_chain(lo, levels), lut_chain(hi, levels)
        elif lut == "tree":
            w_lo, w_hi = lut_tree(lo, levels), lut_tree(hi, levels)
        elif lut == "tree_bf16":
            w_lo, w_hi = lut_tree_bf16(lo, levels), lut_tree_bf16(hi, levels)
        elif lut == "int4_arith":
            w_lo = jnp.maximum(lo - 8, -7).astype(jnp.float32)
            w_hi = jnp.maximum(hi - 8, -7).astype(jnp.float32)
        else:
            raise ValueError(lut)

        if scale_mode == "expand":
            e_lo = expand_scales(s_lo[:], block)
            e_hi = expand_scales(s_hi[:], block)
            if w_lo.dtype == jnp.bfloat16:
                e_lo = e_lo.astype(jnp.bfloat16)
                e_hi = e_hi.astype(jnp.bfloat16)
            w_lo = (w_lo * e_lo).astype(x_lo.dtype)
            w_hi = (w_hi * e_hi).astype(x_hi.dtype)
            acc[:] += jnp.dot(x_lo[:], w_lo, preferred_element_type=jnp.float32)
            acc[:] += jnp.dot(x_hi[:], w_hi, preferred_element_type=jnp.float32)
        else:  # blockdot
            w_lo = w_lo.astype(x_lo.dtype)
            w_hi = w_hi.astype(x_hi.dtype)
            sb = s_lo.shape[0]
            a = jnp.zeros_like(acc)
            for b in range(sb):
                sl = slice(b * block, (b + 1) * block)
                a += jnp.dot(
                    x_lo[:, sl], w_lo[sl], preferred_element_type=jnp.float32
                ) * s_lo[b : b + 1, :]
                a += jnp.dot(
                    x_hi[:, sl], w_hi[sl], preferred_element_type=jnp.float32
                ) * s_hi[b : b + 1, :]
            acc[:] += a

        @pl.when(k == nk - 1)
        def _():
            out[:] = acc[:].astype(out.dtype)

    @jax.jit
    def f(x, codes, scales):
        m, k_dim = x.shape
        k2, n = codes.shape
        tm_ = min(tm, round_up(m, 16))
        tkp = min(tk // 2, k2)
        while k2 % tkp or tkp % block:
            tkp //= 2
        sb = tkp // block
        tn_ = min(tn, round_up(n, 128))
        m_pad, n_pad = round_up(m, tm_), round_up(n, tn_)
        x_ = jnp.pad(x, ((0, m_pad - m), (0, 0))) if m_pad != m else x
        codes_, scales_ = codes, scales
        if n_pad != n:
            codes_ = jnp.pad(codes, ((0, 0), (0, n_pad - n)))
            scales_ = jnp.pad(scales, ((0, 0), (0, n_pad - n)))
        if lut == "int4_arith":
            scales_ = scales_ / 7.0
        grid = (m_pad // tm_, n_pad // tn_, k2 // tkp)
        nk_half = k2 // tkp

        out = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tm_, tkp), lambda i, j, k: (i, k)),
                pl.BlockSpec((tm_, tkp), lambda i, j, k: (i, k + nk_half)),
                pl.BlockSpec((tkp, tn_), lambda i, j, k: (k, j)),
                pl.BlockSpec((sb, tn_), lambda i, j, k: (k, j)),
                pl.BlockSpec((sb, tn_), lambda i, j, k: (k + nk_half, j)),
            ],
            out_specs=pl.BlockSpec((tm_, tn_), lambda i, j, k: (i, j)),
            out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), x.dtype),
            scratch_shapes=[pltpu.VMEM((tm_, tn_), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
        )(x_, x_, codes_, scales_, scales_)
        return out[:m, :n]

    return f


# ------------------------------------------------------------------ driver


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--m", type=int, default=8)
    args = ap.parse_args()

    print("devices:", jax.devices(), flush=True)
    shapes = [(2048, 2048), (2048, 5632), (5632, 2048), (2048, 32000)]
    if args.quick:
        shapes = [(2048, 2048), (5632, 2048)]

    M = args.m
    rng = jax.random.PRNGKey(0)
    block = 64

    for K, N in shapes:
        kx, kw = jax.random.split(jax.random.fold_in(rng, K * N))
        x = jax.random.normal(kx, (M, K), jnp.bfloat16)
        w = jax.random.normal(kw, (K, N), jnp.float32) * 0.02
        qt = codecs.quantize_matmul_weight(w, fmt="nf4", block_size=block)
        wb = w.astype(jnp.bfloat16)
        ref = np.asarray(
            x.astype(jnp.float32)
            @ codecs.dequantize_matmul_weight(qt).astype(jnp.float32)
        )
        refmax = np.abs(ref).max() + 1e-9

        results = {}
        t_dense = bench_in_jit(lambda a: a @ wb, x)
        results["dense_bf16"] = t_dense

        try:
            t0 = bench_in_jit(
                lambda a: mm0.matmul_4bit(
                    a, qt.codes, qt.scale, codebook="nf4", block=block
                ),
                x,
            )
            results["v0_current"] = t0
        except Exception as e:
            print(f"  v0 FAILED: {type(e).__name__}: {str(e)[:120]}", flush=True)

        variants = [
            ("chain", "expand", 4096, 512),
            ("tree", "expand", 4096, 512),
            ("tree", "expand", 8192, 512),
            ("tree", "expand", 4096, 1024),
            ("tree_bf16", "expand", 4096, 512),
            ("tree", "blockdot", 4096, 512),
            ("int4_arith", "expand", 4096, 512),
            ("int4_arith", "expand", 8192, 1024),
            ("int4_arith", "blockdot", 4096, 512),
        ]
        for lut, smode, tk, tn in variants:
            name = f"{lut}|{smode}|tk{tk}|tn{tn}"
            try:
                fn = build_mm4(lut=lut, scale_mode=smode, block=block, tk=tk,
                               tm=16, tn=tn)
                out = np.asarray(fn(x, qt.codes, qt.scale), np.float32)
                rel = np.abs(out - ref).max() / refmax
                if lut != "int4_arith" and rel > 2e-2:
                    print(f"  !! {name} rel err {rel:.4f}", flush=True)
                t = bench_in_jit(lambda a: fn(a, qt.codes, qt.scale), x)
                results[name] = t
            except Exception as e:
                print(f"  {name} FAILED: {type(e).__name__}: {str(e)[:120]}",
                      flush=True)

        w_bytes = K * N // 2 + (K // block) * N * 4
        dense_bytes = K * N * 2
        print(f"\n== M={M} K={K} N={N}  (packed {w_bytes/1e6:.1f}MB, "
              f"bf16 {dense_bytes/1e6:.1f}MB)", flush=True)
        for name, t in sorted(results.items(), key=lambda kv: kv[1]):
            gbs = (w_bytes if name != "dense_bf16" else dense_bytes) / t / 1e9
            print(f"  {name:32s} {t*1e6:9.1f} us  {gbs:7.1f} GB/s  "
                  f"vs_dense {t_dense/t:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
