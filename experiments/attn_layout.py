"""Isolate decode attention cost vs KV-cache layout.

Hypothesis: with cache layout (B, T, G, D), the grouped-attention einsums
force a transpose of the whole cache to (B, G, T, D) every step; storing
it head-major removes the copy. Timing: 22-layer loop, batch=8, T=512,
GQA 32q/4kv heads, hd=64 (TinyLlama decode shape).

Run: python experiments/attn_layout.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B, T, G, R, D, L = 8, 512, 4, 8, 64, 22


def slope_time(fn, args, L0=16, L1=272, reps=4):
    t = {}
    for n in (L0, L1):

        @jax.jit
        def loop(seed, n=n):
            def body(acc, _):
                a0 = args[0] + (acc * 1e-30).astype(args[0].dtype)
                out = fn(a0, *args[1:], acc)
                return out.astype(jnp.float32).sum() * 1e-30, None

            acc, _ = jax.lax.scan(body, seed, None, length=n)
            return acc

        np.asarray(loop(jnp.float32(0)))
        best = 1e9
        for r in range(reps):
            t0 = time.perf_counter()
            np.asarray(loop(jnp.float32(r + 1)))
            best = min(best, time.perf_counter() - t0)
        t[n] = best
    return max((t[L1] - t[L0]) / (L1 - L0), 1e-9)


def attn_btgd(q, ks, vs, acc):
    """Current layout: k/v (L, B, T, G, D); q (B, 1, G*R, D)."""
    out = q
    for i in range(L):
        k, v = ks[i], vs[i]
        qg = out.reshape(B, 1, G, R, D)
        scores = jnp.einsum("bsgrd,btgd->bgrst", qg, k).astype(jnp.float32)
        probs = jax.nn.softmax(scores / 8.0, axis=-1).astype(q.dtype)
        o = jnp.einsum("bgrst,btgd->bsgrd", probs, v)
        out = out + o.reshape(B, 1, G * R, D) * 1e-3
    return out


def attn_bgtd(q, ks, vs, acc):
    """Head-major layout: k/v (L, B, G, T, D)."""
    out = q
    for i in range(L):
        k, v = ks[i], vs[i]
        qg = out.reshape(B, 1, G, R, D).transpose(0, 2, 3, 1, 4).reshape(
            B, G, R, D)
        scores = jnp.einsum("bgrd,bgtd->bgrt", qg, k).astype(jnp.float32)
        probs = jax.nn.softmax(scores / 8.0, axis=-1).astype(q.dtype)
        o = jnp.einsum("bgrt,bgtd->bgrd", probs, v)
        out = out + o.reshape(B, G * R, D)[:, None] * 1e-3
    return out


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (B, 1, G * R, D), jnp.bfloat16)
    k1 = jax.random.normal(rng, (L, B, T, G, D), jnp.bfloat16)
    v1 = jax.random.normal(rng, (L, B, T, G, D), jnp.bfloat16)
    k2 = jnp.moveaxis(k1, 2, 3)  # (L, B, G, T, D)
    v2 = jnp.moveaxis(v1, 2, 3)
    kv_mb = 2 * k1.nbytes / 1e6
    hbm_us = 2 * k1.nbytes / 820e3  # us at 820 GB/s

    t1 = slope_time(attn_btgd, (q, k1, v1))
    t2 = slope_time(attn_bgtd, (q, k2, v2))
    print(f"KV bytes/step: {kv_mb:.0f} MB -> roofline {hbm_us:.0f} us")
    print(f"(B,T,G,D) layout: {t1*1e6:7.0f} us/step")
    print(f"(B,G,T,D) layout: {t2*1e6:7.0f} us/step")


if __name__ == "__main__":
    main()
