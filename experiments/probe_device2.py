"""Probe 2 (minimal): true per-iteration matmul time via scan-length slope,
with forced device->host readback and fresh seed inputs."""

import time

import jax
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices(), flush=True)


def run(fn, seed):
    t0 = time.perf_counter()
    out = fn(jnp.float32(seed))
    _ = np.asarray(out)
    return time.perf_counter() - t0


for K, N in ((2048, 2048), (4096, 4096)):
    times = {}
    for L in (4, 68):
        @jax.jit
        def loop_mm(seed, K=K, N=N, L=L):
            kk = jax.random.PRNGKey(seed.astype(jnp.int32))
            w = jax.random.normal(kk, (K, N), jnp.bfloat16) * 0.01
            x = jnp.ones((8, K), jnp.bfloat16)

            def body(acc, _):
                xi = x + (acc * 1e-30).astype(x.dtype)
                out = xi @ w
                return out.astype(jnp.float32).sum() * 1e-30, None

            acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=L)
            return acc

        run(loop_mm, 0)  # compile
        times[L] = min(run(loop_mm, r) for r in (1, 2, 3))
        print(f"mm8x{K}x{N} L={L}: {times[L]*1e6:.1f} us", flush=True)
    per_iter = (times[68] - times[4]) / 64
    mb = K * N * 2 / 1e6
    print(f"  -> {per_iter*1e6:.2f} us/iter ({mb/1e3/per_iter:.0f} GB/s bf16 read)",
          flush=True)
