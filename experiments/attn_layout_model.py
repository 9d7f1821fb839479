"""Model-level A/B of KV-cache layout: (L,B,T,G,D) vs (L,B,G,T,D).

The synthetic probe (attn_layout.py) is invalid — scan-constant k/v let
XLA cache/hoist. Here the cache is the scan carry exactly as in bench.py,
so the measured step time is the real serving decode step. TinyLlama
geometry, batch=8, T=512, bf16 weights (attention cost is weight-path
independent).

Run: python experiments/attn_layout_model.py
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from quanta_tpu.models import llama  # noqa: E402
from quanta_tpu.nn.linear import linear  # noqa: E402


def forward_bgtd(params, tokens, cfg, cache):
    """llama.forward with head-major (L, B, G, T, D) cache layout."""
    b, s = tokens.shape
    lin = partial(linear, use_kernel=None)
    h = jnp.take(params["tok_emb"], tokens, axis=0).astype(cfg.dtype)

    start = cache["pos"]
    q_positions = start[:, None] + jax.lax.broadcasted_iota(jnp.int32, (b, s), 1)
    t = cache["k"].shape[3]
    kv_positions = jax.lax.broadcasted_iota(jnp.int32, (b, t), 1)
    kv_len_mask = kv_positions < (start[:, None] + s)
    k_cache, v_cache = cache["k"], cache["v"]
    nh, nkv, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    rep = nh // nkv

    for i, lp in enumerate(params["layers"]):
        x = llama.rms_norm(h, lp["attn_norm"], cfg.norm_eps)
        q = lin(x, lp["wq"]).reshape(b, s, nh, hd)
        k = lin(x, lp["wk"]).reshape(b, s, nkv, hd)
        v = lin(x, lp["wv"]).reshape(b, s, nkv, hd)
        q = llama._rope(q, q_positions, cfg.rope_theta)
        k = llama._rope(k, q_positions, cfg.rope_theta)
        # to head-major: (B, G, S, D)
        k_hm = k.transpose(0, 2, 1, 3)
        v_hm = v.transpose(0, 2, 1, 3)

        def upd(buf, new):
            def one(row_buf, row_new, p):
                # row_buf (G, T, D); row_new (G, S, D); write at T=p
                return jax.lax.dynamic_update_slice_in_dim(
                    row_buf, row_new, p, axis=1)
            return jax.vmap(one)(buf, new, cache["pos"])

        k_all = upd(k_cache[i], k_hm)  # (B, G, T, D)
        v_all = upd(v_cache[i], v_hm)
        k_cache = k_cache.at[i].set(k_all)
        v_cache = v_cache.at[i].set(v_all)

        qg = q.reshape(b, s, nkv, rep, hd).transpose(0, 2, 3, 1, 4)  # bgrsd
        scores = jnp.einsum("bgrsd,bgtd->bgrst", qg, k_all).astype(jnp.float32)
        scores = scores / jnp.sqrt(hd).astype(jnp.float32)
        causal = q_positions[:, :, None] >= kv_positions[:, None, :]
        valid = causal & kv_len_mask[:, None, :]
        scores = jnp.where(valid[:, None, None, :, :], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        attn = jnp.einsum("bgrst,bgtd->bgrsd", probs, v_all)
        attn = attn.transpose(0, 3, 1, 2, 4).reshape(b, s, nh * hd)

        h = h + lin(attn, lp["wo"])
        x = llama.rms_norm(h, lp["ffn_norm"], cfg.norm_eps)
        gate = lin(x, lp["w_gate"])
        up = lin(x, lp["w_up"])
        h = h + lin(
            jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up,
            lp["w_down"])

    h = llama.rms_norm(h, params["norm_f"], cfg.norm_eps)
    logits = lin(h, params["lm_head"]).astype(jnp.float32)
    new_cache = {"k": k_cache, "v": v_cache, "pos": cache["pos"] + s}
    return logits, new_cache


def init_cache_bgtd(cfg, batch, max_len):
    shape = (cfg.n_layers, batch, cfg.n_kv_heads, max_len, cfg.head_dim)
    return {"k": jnp.zeros(shape, cfg.dtype), "v": jnp.zeros(shape, cfg.dtype),
            "pos": jnp.zeros((batch,), jnp.int32)}


def step_time(params, cfg, fwd, mk_cache, batch=8, cache_len=512,
              L0=8, L1=72, reps=3):
    def make_loop(L):
        @jax.jit
        def loop(params, seed):
            cache = mk_cache(cfg, batch, cache_len)
            cache = {**cache, "pos": cache["pos"] + 128}
            tok = jnp.zeros((batch, 1), jnp.int32) + (seed & 1)

            def body(carry, _):
                cache, tok = carry
                lg, cache = fwd(params, tok, cfg, cache)
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
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    jax.block_until_ready(params)

    def fwd_prod(p, t, c, cache):
        return llama.forward(p, t, c, cache=cache)

    def mk_prod(cfg, b, ln):
        return llama.init_cache(cfg, b, max_len=ln)

    # parity check on CPU-sized shapes first (same device, tiny)
    tcfg = llama.LlamaConfig.tiny()
    tp = llama.init_params(jax.random.PRNGKey(1), tcfg)
    toks = jnp.arange(8, dtype=jnp.int32).reshape(2, 4)
    c1 = llama.init_cache(tcfg, 2, max_len=16)
    c2 = init_cache_bgtd(tcfg, 2, 16)
    l1, c1 = llama.forward(tp, toks, tcfg, cache=c1)
    l2, c2 = forward_bgtd(tp, toks, tcfg, c2)
    err = float(np.max(np.abs(np.asarray(l1) - np.asarray(l2))))
    print(f"prefill logits parity: max abs err {err:.2e}", flush=True)
    l1, c1 = llama.forward(tp, toks[:, :1], tcfg, cache=c1)
    l2, c2 = forward_bgtd(tp, toks[:, :1], tcfg, c2)
    err = float(np.max(np.abs(np.asarray(l1) - np.asarray(l2))))
    print(f"decode logits parity:  max abs err {err:.2e}", flush=True)

    t_prod = step_time(params, cfg, fwd_prod, mk_prod)
    print(f"(B,T,G,D) production: {t_prod*1e3:7.3f} ms/step", flush=True)
    t_bgtd = step_time(params, cfg, forward_bgtd, init_cache_bgtd)
    print(f"(B,G,T,D) head-major: {t_bgtd*1e3:7.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
