"""Tile-size sweep for the production matmul_4bit/8bit kernels.

Finds (tn, tk) heuristics per shape class; results get baked into
quanta_tpu/ops/matmul.py tile pickers.
"""

import itertools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from quanta_tpu.core import codecs  # noqa: E402
from quanta_tpu.ops import matmul as mm  # noqa: E402


def slope_time(op, x, L0=16, L1=272, reps=5):
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
        ts = []
        for r in range(reps):
            t0 = time.perf_counter()
            np.asarray(loop(jnp.float32(r + 1)))
            ts.append(time.perf_counter() - t0)
        t[L] = min(ts)
    return max((t[L1] - t[L0]) / (L1 - L0), 1e-9)


def main():
    shapes = [(2048, 2048), (2048, 5632), (5632, 2048), (2048, 32000)]
    Ms = [int(m) for m in (sys.argv[1:] or ["8"])]
    for M in Ms:
        for K, N in shapes:
            kx, kw = jax.random.split(jax.random.PRNGKey(K + N))
            x = jax.random.normal(kx, (M, K), jnp.bfloat16)
            w = jax.random.normal(kw, (K, N), jnp.float32) * 0.02
            wb = w.astype(jnp.bfloat16)
            qt = codecs.quantize_matmul_weight(w, fmt="nf4a", block_size=64)
            qt8 = codecs.quantize_matmul_weight(w, fmt="int8", block_size=64)
            t_dense = slope_time(lambda a: a @ wb, x)
            print(f"\nM={M} K={K} N={N}: dense {t_dense*1e6:.1f} us", flush=True)
            n_pad = qt.codes.shape[1]
            for tn, tk in itertools.product((256, 512, 1024, 2048), (1024, 2048, 4096)):
                if n_pad % tn:
                    continue
                try:
                    t = slope_time(
                        lambda a: mm.matmul_4bit(
                            a, qt.codes, qt.scale, codebook="nf4a", block=64,
                            tn=tn, tk=tk),
                        x)
                    print(f"  nf4a tn={tn:5d} tk={tk:5d}: {t*1e6:7.1f} us "
                          f"({t_dense/t:5.2f}x)", flush=True)
                except Exception as e:
                    print(f"  nf4a tn={tn} tk={tk}: FAIL {str(e)[:80]}", flush=True)
            for tn, tk in itertools.product((256, 512, 1024), (1024, 2048, 4096)):
                if n_pad % tn:
                    continue
                try:
                    t = slope_time(
                        lambda a: mm.matmul_8bit(
                            a, qt8.codes, qt8.scale, block=64, tn=tn, tk=tk),
                        x)
                    print(f"  int8 tn={tn:5d} tk={tk:5d}: {t*1e6:7.1f} us "
                          f"({t_dense/t:5.2f}x)", flush=True)
                except Exception as e:
                    print(f"  int8 tn={tn} tk={tk}: FAIL {str(e)[:80]}", flush=True)


if __name__ == "__main__":
    main()
