"""Probe real device speed: per-scan-iteration overhead, HBM bandwidth,
matmul throughput — to understand the 400us/iteration floor seen in kbench."""

import time

import jax
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices(), flush=True)


def bench(fn, *args, iters=100, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} {best*1e6:10.1f} us", flush=True)
    return best


# 1. dispatch floor: single trivial op
x_small = jnp.ones((8, 128), jnp.float32)
bench(jax.jit(lambda x: x + 1), x_small, name="single trivial op (dispatch floor)")

# 2. scan of trivial ops, serialized via carry
for n in (64, 256, 1024):
    @jax.jit
    def loop_triv(x, n=n):
        def body(c, _):
            return c * 1.0000001 + 1.0, None
        c, _ = jax.lax.scan(body, x, None, length=n)
        return c
    t = bench(loop_triv, x_small, name=f"scan x{n} trivial carry op")
    print(f"    -> {t/n*1e6:8.2f} us/iter", flush=True)

# 3. serialized matmul scan: per-iter = overhead + matmul time
for K, N in ((2048, 2048), (4096, 4096), (8192, 8192)):
    w = jnp.ones((K, N), jnp.bfloat16) * 0.001
    xx = jnp.ones((8, K), jnp.bfloat16)

    for L in (64,):
        @jax.jit
        def loop_mm(x, w, L=L):
            def body(acc, _):
                xi = x + (acc * 1e-30).astype(x.dtype)
                out = xi @ w
                return out.astype(jnp.float32).sum() * 1e-30, None
            acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=L)
            return acc
        t = bench(loop_mm, xx, w, name=f"scan x{L} serialized mm8x{K}x{N}")
        mb = K * N * 2 / 1e6
        print(f"    -> {t/L*1e6:8.2f} us/iter  ({mb:.0f}MB -> {mb/1e3/(t/L):7.1f} GB/s)", flush=True)

# 4. UNserialized matmul scan (no carry dependence, but side-effect via xs)
for K, N in ((2048, 2048), (8192, 8192)):
    w = jnp.ones((K, N), jnp.bfloat16) * 0.001
    L = 64
    xs = jnp.ones((L, 8, K), jnp.bfloat16)

    @jax.jit
    def loop_mm2(xs, w):
        def body(acc, xi):
            out = xi @ w
            return acc + out.astype(jnp.float32).sum(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), xs, None)
        return acc
    t = bench(loop_mm2, xs, w, name=f"scan x{L} indep mm8x{K}x{N}")
    mb = K * N * 2 / 1e6
    print(f"    -> {t/L*1e6:8.2f} us/iter  ({mb:.0f}MB -> {mb/1e3/(t/L):7.1f} GB/s)", flush=True)

# 5. big-M matmul for MXU flops
for M, K, N in ((4096, 4096, 4096),):
    a = jnp.ones((M, K), jnp.bfloat16)
    b = jnp.ones((K, N), jnp.bfloat16)
    L = 16

    @jax.jit
    def loop_big(a, b):
        def body(acc, _):
            ai = a + (acc * 1e-30).astype(a.dtype)
            out = ai @ b
            return out.astype(jnp.float32)[0, 0] * 1e-30, None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=L)
        return acc
    t = bench(loop_big, a, b, name=f"scan x{L} mm {M}x{K}x{N}")
    fl = 2 * M * K * N
    print(f"    -> {t/L*1e6:8.2f} us/iter  ({fl/1e12/(t/L):7.1f} TFLOP/s)", flush=True)

# 6. HBM copy bandwidth
for MB in (64, 512):
    n = MB * 1024 * 1024 // 4
    v = jnp.ones((n,), jnp.float32)
    L = 8

    @jax.jit
    def loop_copy(v):
        def body(c, _):
            return c * 1.0000001, None
        c, _ = jax.lax.scan(body, v, None, length=L)
        return c
    t = bench(loop_copy, v, name=f"scan x{L} rw {MB}MB vector")
    print(f"    -> {t/L*1e6:8.2f} us/iter  ({2*MB/1e3/(t/L):7.1f} GB/s)", flush=True)
