"""Probe 3: (a) does block_until_ready actually wait on axon? (b) are
identical calls cached? (c) true per-iter matmul cost via large-L slope."""

import time

import jax
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices(), flush=True)

K = N = 4096  # 34MB bf16 weights


def make_loop(L):
    @jax.jit
    def loop_mm(seed, L=L):
        kk = jax.random.PRNGKey(seed.astype(jnp.int32))
        w = jax.random.normal(kk, (K, N), jnp.bfloat16) * 0.01
        x = jnp.ones((8, K), jnp.bfloat16)

        def body(acc, _):
            xi = x + (acc * 1e-30).astype(x.dtype)
            out = xi @ w
            return out.astype(jnp.float32).sum() * 1e-30, None

        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=L)
        return acc

    return loop_mm


loop512 = make_loop(512)
# expected real device time >= 512 * 34MB / 819GB/s ~ 21ms

# compile + warm
loop512(jnp.float32(0)).block_until_ready()

# (a) block_until_ready, fresh seed
for r in (1, 2, 3):
    t0 = time.perf_counter()
    loop512(jnp.float32(r)).block_until_ready()
    print(f"block_until_ready fresh seed: {(time.perf_counter()-t0)*1e3:.2f} ms",
          flush=True)

# (b) identical seed repeated
for r in (9, 9, 9):
    t0 = time.perf_counter()
    loop512(jnp.float32(r)).block_until_ready()
    print(f"block_until_ready same seed : {(time.perf_counter()-t0)*1e3:.2f} ms",
          flush=True)

# (c) readback, fresh seeds
for r in (20, 21):
    t0 = time.perf_counter()
    np.asarray(loop512(jnp.float32(r)))
    print(f"readback fresh seed        : {(time.perf_counter()-t0)*1e3:.2f} ms",
          flush=True)

# (d) slope: L=32 vs L=544 with readback, fresh seeds
t = {}
for L in (32, 544):
    f = make_loop(L)
    np.asarray(f(jnp.float32(0)))
    best = 1e9
    for r in (31, 32, 33):
        t0 = time.perf_counter()
        np.asarray(f(jnp.float32(r + L)))
        best = min(best, time.perf_counter() - t0)
    t[L] = best
    print(f"L={L}: {best*1e3:.2f} ms", flush=True)
per = (t[544] - t[32]) / 512
print(f"slope: {per*1e6:.2f} us/iter -> {34e6/per/1e9:.0f} GB/s effective",
      flush=True)
