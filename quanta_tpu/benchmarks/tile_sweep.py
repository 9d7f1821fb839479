"""Tile-shape sweep for the fused kernels at decode shapes (M=8).

VERDICT r3 task 3: push the quantized kernels toward their rooflines by
sweeping tn/tk at the serving shapes. Uses kernel_bench's
streaming-weights harness so the numbers are comparable with
docs/KERNEL_BENCH.md cells; the winning tiles become the defaults baked
into ops/matmul.py (via explicit overrides) and the floors feed
docs/KERNEL_DESIGN.md's prediction table.

Usage: python -m quanta_tpu.benchmarks.tile_sweep [--fmt nf4a int8] [--m 8]
"""

import argparse
import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np

from quanta_tpu.benchmarks.kernel_bench import _replicas, slope_time
from quanta_tpu.core import codecs
from quanta_tpu.ops import int8mm
from quanta_tpu.ops import matmul as mm
from quanta_tpu.profiling import matmul_roofline


def log(*a):
    print(*a, file=sys.stderr, flush=True)


SHAPES = [
    ("qkv/o", 2048, 2048),
    ("gate/up", 2048, 5632),
    ("down", 5632, 2048),
    ("lm_head", 2048, 32000),
]


def sweep_qt(fmt, M, K, N, tns, tks):
    kx, kw = jax.random.split(jax.random.PRNGKey(K + N))
    x = jax.random.normal(kx, (M, K), jnp.bfloat16)
    w = jax.random.normal(kw, (K, N), jnp.float32) * 0.02
    qt = codecs.quantize_matmul_weight(w, fmt=fmt, block_size=64)
    bits = 4 if qt.bits == 4 else 8
    rl = matmul_roofline(M, K, N, weight_bits=bits, block_size=64)
    Rq = _replicas(qt.codes.size + qt.scale.size * 4)
    ws = {"c": jnp.stack([qt.codes] * Rq), "s": jnp.stack([qt.scale] * Rq)}
    jax.block_until_ready(ws)
    best = (1e9, None)
    for tn in tns:
        if qt.codes.shape[1] % tn:
            continue
        for tk in tks:
            def op(a, wi, qt=qt, tn=tn, tk=tk):
                q = dataclasses.replace(qt, codes=wi["c"], scale=wi["s"])
                return mm.matmul_quantized(a, q, tn=tn, tk=tk)

            try:
                t, sus = slope_time(op, x, ws, Rq, rl.t_roofline_s)
            except Exception as e:
                log(f"  {fmt} {K}x{N} tn={tn} tk={tk}: {type(e).__name__}")
                continue
            mark = "~" if sus else ""
            log(f"  {fmt} {K}x{N} tn={tn} tk={tk}: {mark}{t*1e6:.1f} us "
                f"({rl.pct(t):.0f}%RL)")
            if t < best[0]:
                best = (t, (tn, tk))
    return best


def sweep_i8(M, K, N, tns, tks):
    kx, kw = jax.random.split(jax.random.PRNGKey(K + N))
    x = jax.random.normal(kx, (M, K), jnp.bfloat16)
    w = jax.random.normal(kw, (K, N), jnp.float32) * 0.02
    qw = int8mm.quantize_int8_weight(w)
    rl = matmul_roofline(M, K, N, weight_bits=8)
    Rq = _replicas(qw.codes.size)
    ws = jnp.stack([qw.codes] * Rq)
    jax.block_until_ready(ws)
    best = (1e9, None)
    for tn in tns:
        if qw.codes.shape[1] % tn:
            continue
        for tk in tks:
            if qw.codes.shape[0] % tk:
                continue

            def op(a, wi, qw=qw, tn=tn, tk=tk):
                import jax.numpy as jnp

                x2 = a.astype(jnp.float32)
                mask = jnp.zeros((a.shape[1],), jnp.float32).at[
                    qw.outlier_idx].set(1.0)
                x_in = x2 * (1.0 - mask)[None, :]
                rs = jnp.maximum(
                    jnp.max(jnp.abs(x_in), axis=1) / 127.0, 1e-12)
                xq = jnp.clip(jnp.round(x2 / rs[:, None]), -127, 127).astype(
                    jnp.int8)
                y = int8mm.matmul_int8_kernel(xq, wi, rs, qw.scale,
                                              tn=tn, tk=tk)
                y_out = jnp.take(x2, qw.outlier_idx, axis=1) @ (
                    qw.w_outlier.astype(jnp.float32))
                return y + y_out

            try:
                t, sus = slope_time(op, x, ws, Rq, rl.t_roofline_s)
            except Exception as e:
                log(f"  llm_int8 {K}x{N} tn={tn} tk={tk}: {type(e).__name__}")
                continue
            mark = "~" if sus else ""
            log(f"  llm_int8 {K}x{N} tn={tn} tk={tk}: {mark}{t*1e6:.1f} us "
                f"({rl.pct(t):.0f}%RL)")
            if t < best[0]:
                best = (t, (tn, tk))
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fmt", nargs="+", default=["nf4a", "int8", "llm_int8"])
    ap.add_argument("--m", type=int, default=8)
    args = ap.parse_args()
    log("device:", jax.devices()[0])
    for label, K, N in SHAPES:
        for fmt in args.fmt:
            if fmt == "llm_int8":
                t, tile = sweep_i8(args.m, K, N, (128, 256, 512),
                                   (512, 1024, 2048))
            else:
                t, tile = sweep_qt(fmt, args.m, K, N, (128, 256, 512),
                                   (0, 1024, 2048, 4096))
            log(f"BEST {fmt:8s} {label:8s} {K}x{N}: {t*1e6:.1f} us @ {tile}")


if __name__ == "__main__":
    main()
