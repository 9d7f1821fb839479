"""Decode-step time breakdown for TinyLlama-geometry nf4a vs bf16.

The full-model decode step (bench.py) runs ~3.4ms for nf4a while the sum
of its fused-kernel matmul times is ~1.9ms — ~1.5ms/step is NOT matmuls.
This experiment ablates components of llama.forward to localize it:

  full        production forward
  no_attn     attention replaced by q-passthrough (keeps cache update)
  no_cache    no KV cache write; attends over the fresh k/v only
  no_mlp      gate/up/down skipped
  no_lmhead   logits = h @ nothing (sum instead)

Times per decode step via the scan-slope protocol at batch=8, ctx=512.
Run: python experiments/decode_breakdown.py
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from quanta_tpu import nn as qnn  # noqa: E402
from quanta_tpu.models import llama  # noqa: E402
from quanta_tpu.nn.linear import linear  # noqa: E402


def ablated_forward(params, tokens, cfg, cache, *, ablate=()):
    b, s = tokens.shape
    lin = partial(linear, use_kernel=None)
    h = jnp.take(params["tok_emb"], tokens, axis=0).astype(cfg.dtype)

    start = cache["pos"]
    q_positions = start[:, None] + jax.lax.broadcasted_iota(jnp.int32, (b, s), 1)
    t = cache["k"].shape[2]
    kv_positions = jax.lax.broadcasted_iota(jnp.int32, (b, t), 1)
    kv_len_mask = kv_positions < (start[:, None] + s)
    k_cache, v_cache = cache["k"], cache["v"]

    for i, lp in enumerate(params["layers"]):
        x = llama.rms_norm(h, lp["attn_norm"], cfg.norm_eps)
        q = lin(x, lp["wq"]).reshape(b, s, cfg.n_heads, cfg.head_dim)
        k = lin(x, lp["wk"]).reshape(b, s, cfg.n_kv_heads, cfg.head_dim)
        v = lin(x, lp["wv"]).reshape(b, s, cfg.n_kv_heads, cfg.head_dim)
        q = llama._rope(q, q_positions, cfg.rope_theta)
        k = llama._rope(k, q_positions, cfg.rope_theta)

        if "no_cache" in ablate:
            k_all, v_all = k, v
            mask = jnp.ones((b, s), bool)
            if "no_attn" in ablate:
                attn = q
            else:
                attn = llama._attention(q, k_all, v_all, q_positions, mask, cfg)
        else:
            def upd(buf, new):
                def one(row_buf, row_new, p):
                    return jax.lax.dynamic_update_slice_in_dim(
                        row_buf, row_new, p, axis=0)
                return jax.vmap(one)(buf, new, cache["pos"])

            k_all = upd(k_cache[i], k)
            v_all = upd(v_cache[i], v)
            k_cache = k_cache.at[i].set(k_all)
            v_cache = v_cache.at[i].set(v_all)
            if "no_attn" in ablate:
                attn = q
            else:
                attn = llama._attention(
                    q, k_all, v_all, q_positions, kv_len_mask, cfg)

        h = h + lin(attn.reshape(b, s, -1), lp["wo"])
        if "no_mlp" not in ablate:
            x = llama.rms_norm(h, lp["ffn_norm"], cfg.norm_eps)
            gate = lin(x, lp["w_gate"])
            up = lin(x, lp["w_up"])
            h = h + lin(
                jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up,
                lp["w_down"])

    h = llama.rms_norm(h, params["norm_f"], cfg.norm_eps)
    if "no_lmhead" in ablate:
        logits = h[..., :1] * 1.0
    else:
        logits = lin(h, params["lm_head"]).astype(jnp.float32)
    new_cache = {"k": k_cache, "v": v_cache, "pos": cache["pos"] + s}
    return logits, new_cache


def step_time(params, cfg, ablate, batch=8, cache_len=512, L0=8, L1=72,
              reps=3):
    def make_loop(L):
        @jax.jit
        def loop(params, seed):
            cache = llama.init_cache(cfg, batch, max_len=cache_len)
            cache = {**cache, "pos": cache["pos"] + 128}
            tok = jnp.zeros((batch, 1), jnp.int32) + (seed & 1)

            def body(carry, _):
                cache, tok = carry
                lg, cache = ablated_forward(params, tok, cfg, cache,
                                            ablate=ablate)
                nxt = jnp.argmax(lg[:, -1:], axis=-1).astype(jnp.int32)
                return (cache, nxt), None

            (cache, tok), _ = jax.lax.scan(body, (cache, tok), None, length=L)
            return tok.sum()

        return loop

    def timed(fn):
        np.asarray(fn(params, jnp.int32(0)))
        best = 1e9
        for r in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(params, jnp.int32(r + 1)))
            best = min(best, time.perf_counter() - t0)
        return best

    t0 = timed(make_loop(L0))
    t1 = timed(make_loop(L1))
    return max((t1 - t0) / (L1 - L0), 1e-9)


def main():
    print("device:", jax.devices()[0], flush=True)
    cfg = llama.LlamaConfig.tinyllama_1b()
    dense = llama.init_params(jax.random.PRNGKey(0), cfg)
    jax.block_until_ready(dense)
    nf4a = qnn.quantize_params(dense, mode="nf4a", block_size=64)
    jax.block_until_ready(nf4a)

    ablations = [
        ("full", ()),
        ("no_attn", ("no_attn",)),
        ("no_cache", ("no_cache",)),
        ("no_attn+no_cache", ("no_attn", "no_cache")),
        ("no_mlp", ("no_mlp",)),
        ("no_lmhead", ("no_lmhead",)),
    ]
    for pname, params in (("nf4a", nf4a), ("bf16", dense)):
        for aname, ab in ablations:
            t = step_time(params, cfg, ab)
            print(f"{pname} {aname:18s} {t*1e3:7.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
