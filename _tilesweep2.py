"""Tile sweep v2 with adaptive-length slope timing (noise-proof)."""
import jax, jax.numpy as jnp, numpy as np, time
from quanta_tpu.core import codecs
from quanta_tpu.ops import matmul as mm

def make_loop(op, x, L):
    @jax.jit
    def loop(seed, L=L):
        def body(acc, _):
            xi = x + (acc * 1e-30).astype(x.dtype)
            out = op(xi)
            return out.astype(jnp.float32).sum() * 1e-30, None
        acc, _ = jax.lax.scan(body, seed, None, length=L)
        return acc
    return loop

def timed(loop, reps=3):
    np.asarray(loop(jnp.float32(0)))
    best = 1e9
    for r in range(reps):
        t0 = time.perf_counter()
        np.asarray(loop(jnp.float32(r + 1)))
        best = min(best, time.perf_counter() - t0)
    return best

def slope_time(op, x):
    # phase 1: rough estimate with a short loop
    t32 = timed(make_loop(op, x, 32), reps=2)
    est = max(t32 / 32, 1e-7)
    # phase 2: scale so the long loop runs >= 25 ms of accumulated work
    L1 = int(min(max(272, 0.025 / est), 12288))
    L0 = max(16, L1 // 8)
    t0 = timed(make_loop(op, x, L0))
    t1 = timed(make_loop(op, x, L1))
    return max((t1 - t0) / (L1 - L0), 1e-9)

shapes = [("qkv", 2048, 2048), ("gateup", 2048, 5632),
          ("down", 5632, 2048), ("lm_head", 2048, 32000)]
for M in (8, 128):
    for label, K, N in shapes:
        kx, kw = jax.random.split(jax.random.PRNGKey(K + N))
        x = jax.random.normal(kx, (M, K), jnp.bfloat16)
        w = jax.random.normal(kw, (K, N), jnp.float32) * 0.02
        wb = w.astype(jnp.bfloat16)
        td = slope_time(lambda a: a @ wb, x)
        print(f"M{M} {label:8s} dense {td*1e6:7.1f}us", flush=True)
        for fmt in ("nf4a", "nf4", "int4", "int8"):
            qt = codecs.quantize_matmul_weight(w, fmt=fmt, block_size=64)
            for tn in (128, 256, 512):
                if N % tn: continue
                t = slope_time(lambda a: mm.matmul_quantized(a, qt, tn=tn), x)
                print(f"M{M} {label:8s} {fmt:5s} tn{tn:3d} {t*1e6:7.1f}us ({td/t:4.2f}x)", flush=True)
