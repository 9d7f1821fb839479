"""Kernel microbenchmark v2 — trustworthy timing on the axon tunnel.

Protocol: block_until_ready does NOT wait on axon (probe_device3), so each
measurement jit-loops the op L times (serialized via a carry) and reads the
scalar result back to host; true per-iter time = slope between two L values.

Variants: lut in {chain, tree, int4_arith} x scale in {expand, blockdot},
against dense bf16 and the round-1 kernel (v0).
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


def slope_time(op, make_x, L0=16, L1=272, reps=4):
    """op: x -> array. Returns seconds per op call via scan-length slope."""
    t = {}
    for L in (L0, L1):
        @jax.jit
        def loop(seed, L=L):
            x = make_x(seed)
            def body(acc, _):
                xi = x + (acc * 1e-30).astype(x.dtype)
                out = op(xi)
                return out.astype(jnp.float32).sum() * 1e-30, None
            acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=L)
            return acc
        np.asarray(loop(jnp.float32(0)))  # compile+warm
        best = 1e9
        for r in range(reps):
            t0 = time.perf_counter()
            np.asarray(loop(jnp.float32(r + 1 + L)))
            best = min(best, time.perf_counter() - t0)
        t[L] = best
    return (t[L1] - t[L0]) / (L1 - L0)


# ----------------------------------------------------------------- lookups


def lut_chain(c, levels):
    out = jnp.full(c.shape, float(levels[0]), jnp.float32)
    for i in range(1, len(levels)):
        out = jnp.where(c == i, float(levels[i]), out)
    return out


def lut_tree(c, levels):
    b0 = (c & 1) != 0
    b1 = (c & 2) != 0
    b2 = (c & 4) != 0
    b3 = (c & 8) != 0
    lv = [float(v) for v in levels]
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


def build_mm4(lut="tree", scale_mode="expand", block=64, tk=4096, tm=16,
              tn=512):
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
        if lut == "poly3":
            # nf4a cubic codebook: v = ((a*c + b)*c + d)*c + e
            A, B, C, D = (0.0006303362129204599, -0.014194327019966578,
                          0.19776771619397554, -0.9496551767520744)
            def poly(cc):
                cf = cc.astype(jnp.float32)
                return ((A * cf + B) * cf + C) * cf + D
            w_lo, w_hi = poly(lo), poly(hi)
        elif lut == "chain":
            w_lo, w_hi = lut_chain(lo, levels), lut_chain(hi, levels)
        elif lut == "tree":
            w_lo, w_hi = lut_tree(lo, levels), lut_tree(hi, levels)
        elif lut == "int4_arith":
            w_lo = jnp.maximum(lo - 8, -7).astype(jnp.float32)
            w_hi = jnp.maximum(hi - 8, -7).astype(jnp.float32)
        else:
            raise ValueError(lut)

        if scale_mode == "expand":
            w_lo = (w_lo * expand_scales(s_lo[:], block)).astype(x_lo.dtype)
            w_hi = (w_hi * expand_scales(s_hi[:], block)).astype(x_hi.dtype)
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

    def f(x, codes, scales):
        """x: (M, K_pad); codes: (K_pad/2, N_pad); scales: (K_pad/B, N_pad)."""
        m, k_dim = x.shape
        k2, n = codes.shape
        assert k_dim == 2 * k2
        tm_ = min(tm, round_up(m, 16))
        tkp = min(tk // 2, k2)
        while k2 % tkp or tkp % (8 * block):
            tkp -= 8 * block if tkp > 8 * block else 0
            if tkp <= 8 * block:
                tkp = 8 * block
                break
        # fall back to whole-K if divisibility failed
        if k2 % tkp:
            tkp = k2
        sb = tkp // block
        tn_ = min(tn, round_up(n, 128))
        m_pad = round_up(m, tm_)
        x_ = jnp.pad(x, ((0, m_pad - m), (0, 0))) if m_pad != m else x
        assert n % tn_ == 0, (n, tn_)
        grid = (m_pad // tm_, n // tn_, k2 // tkp)
        nk_half = k2 // tkp

        scales_ = scales / 7.0 if lut == "int4_arith" else scales

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
            out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
            scratch_shapes=[pltpu.VMEM((tm_, tn_), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
        )(x_, x_, codes, scales_, scales_)
        return out[:m]

    return f


# ------------------------------------------------------------------ driver


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--shapes", type=str, default="2048x2048,5632x2048")
    ap.add_argument("--variants", type=str, default=(
        "tree:expand:4096:512,chain:expand:4096:512,int4_arith:expand:4096:512,"
        "tree:blockdot:4096:512,tree:expand:8192:512,tree:expand:4096:1024"))
    args = ap.parse_args()

    print("devices:", jax.devices(), flush=True)
    M = args.m
    block = 64
    kpad_unit = 8 * block  # 512

    for spec in args.shapes.split(","):
        K, N = map(int, spec.split("x"))
        K_pad = round_up(K, kpad_unit)
        N_pad = round_up(N, 512)
        kx, kw = jax.random.split(jax.random.PRNGKey(K * 7 + N))
        x = jax.random.normal(kx, (M, K), jnp.bfloat16)
        w = jax.random.normal(kw, (K, N), jnp.float32) * 0.02
        w_pad = jnp.pad(w, ((0, K_pad - K), (0, N_pad - N)))
        qt = codecs.quantize_matmul_weight(w_pad, fmt="nf4", block_size=block)
        wb = w.astype(jnp.bfloat16)
        x_pad = jnp.pad(x, ((0, 0), (0, K_pad - K)))
        ref = np.asarray(
            x_pad.astype(jnp.float32)
            @ codecs.dequantize_matmul_weight(qt).astype(jnp.float32)
        )[:, :N]
        refmax = np.abs(ref).max() + 1e-9

        def make_x(seed):
            return x_pad + 0 * seed

        results = {}
        t_dense = slope_time(lambda a: a[:, :K] @ wb, make_x)
        results["dense_bf16"] = t_dense

        t0 = slope_time(
            lambda a: mm0.matmul_4bit(
                a, qt.codes, qt.scale, codebook="nf4", block=block
            ),
            make_x,
        )
        results["v0_current"] = t0

        for vs in args.variants.split(","):
            lut, smode, tk, tn = vs.split(":")
            name = f"{lut}|{smode}|tk{tk}|tn{tn}"
            try:
                fn = build_mm4(lut=lut, scale_mode=smode, block=block,
                               tk=int(tk), tm=16, tn=int(tn))
                out = np.asarray(fn(x_pad, qt.codes, qt.scale), np.float32)[:, :N]
                rel = np.abs(out - ref).max() / refmax
                if lut != "int4_arith" and rel > 2e-2:
                    print(f"  !! {name} rel err {rel:.4f}", flush=True)
                results[name] = slope_time(
                    lambda a: fn(a, qt.codes, qt.scale), make_x
                )
            except Exception as e:
                print(f"  {name} FAILED: {type(e).__name__}: {str(e)[:140]}",
                      flush=True)

        w_bytes = K_pad * N_pad // 2 + (K_pad // block) * N_pad * 4
        dense_bytes = K * N * 2
        print(f"\n== M={M} K={K} N={N}  (packed {w_bytes/1e6:.1f}MB, "
              f"bf16 {dense_bytes/1e6:.1f}MB)", flush=True)
        for name, t in sorted(results.items(), key=lambda kv: kv[1]):
            gbs = (w_bytes if name != "dense_bf16" else dense_bytes) / t / 1e9
            print(f"  {name:32s} {t*1e6:9.1f} us  {gbs:7.1f} GB/s  "
                  f"vs_dense {t_dense/t:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
