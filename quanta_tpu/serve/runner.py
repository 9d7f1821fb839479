"""Jitted model execution for the serving engine: prefill / paged decode.

Two compiled programs (SURVEY.md §7 layer 6 "prefill/decode jit split"):

  * ``prefill``: one request at a time, prompt padded to a static length
    bucket. Runs the stock contiguous-cache forward (quanta_tpu.models.
    llama.forward) and returns first-token logits plus the per-layer KV
    stream, which the engine scatters into the paged pool. A handful of
    buckets -> a handful of compilations, cached for the process lifetime.

  * ``decode_step``: one token for ALL slots at once, attention reading
    K/V through the page table (kvcache.gather_layer) and writing the new
    token's K/V through it (kvcache.write_token). Static shapes:
    (n_slots,) tokens, (n_slots, max_pages) table. Inactive slots are
    masked via position<0 -> they attend to nothing and their writes land
    in the reserved null page 0.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from quanta_tpu.models import llama
from quanta_tpu.nn.linear import linear
from quanta_tpu.serve import kvcache


def pick_bucket(n: int, buckets: Tuple[int, ...]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"prompt of {n} tokens exceeds largest bucket {buckets[-1]}")


@partial(jax.jit, static_argnames=("cfg", "use_kernel"))
def prefill(params, tokens: jax.Array, length: jax.Array, cfg, use_kernel=None):
    """Prefill one request.

    tokens: (1, S_bucket) int32, zero-padded past ``length``.
    Returns (last_logits (V,), k_seq, v_seq) with k/v (L, S_bucket, nkv, hd);
    positions >= length hold garbage KV — the engine masks them by seq_len.
    """
    cache = llama.init_cache(cfg, 1, max_len=tokens.shape[1])
    logits, cache = llama.forward(
        params, tokens, cfg, cache=cache, use_kernel=use_kernel
    )
    last = jnp.take_along_axis(
        logits[0], (length - 1)[None, None], axis=0
    )[0]  # (V,) logits at the true last prompt token
    return last, cache["k"][:, 0], cache["v"][:, 0]


@partial(jax.jit, static_argnames=("cfg", "page_size", "use_kernel"),
         donate_argnums=(1,))
def decode_step(
    params,
    pool: dict,
    page_table: jax.Array,
    positions: jax.Array,
    tokens: jax.Array,
    cfg,
    page_size: int,
    use_kernel=None,
):
    """One decode step for all slots.

    page_table: (n_slots, max_pages) int32 (0 = null page).
    positions: (n_slots,) int32 — absolute position of ``tokens``
      (== current seq_len); negative marks an inactive slot.
    tokens: (n_slots,) int32 last sampled token per slot.

    Returns (logits (n_slots, V), updated pool). The pool argument is
    donated: the update is in-place in HBM.
    """
    b = tokens.shape[0]
    active = positions >= 0
    pos_safe = jnp.maximum(positions, 0)
    # inactive slots write into null page 0: point their table at page 0
    table_safe = jnp.where(active[:, None], page_table, 0)

    lin = partial(linear, use_kernel=use_kernel)
    h = jnp.take(params["tok_emb"], tokens[:, None], axis=0).astype(cfg.dtype)

    q_positions = pos_safe[:, None]  # (B, 1)
    t = page_table.shape[1] * page_size
    kv_iota = jax.lax.broadcasted_iota(jnp.int32, (b, t), 1)
    kv_len_mask = (kv_iota <= pos_safe[:, None]) & active[:, None]

    quantized = kvcache.is_quantized(pool)
    new_pool = {key: [] for key in pool}
    for i, lp in enumerate(params["layers"]):
        x = llama.rms_norm(h, lp["attn_norm"], cfg.norm_eps)
        q = lin(x, lp["wq"]).reshape(b, 1, cfg.n_heads, cfg.head_dim)
        k = lin(x, lp["wk"]).reshape(b, 1, cfg.n_kv_heads, cfg.head_dim)
        v = lin(x, lp["wv"]).reshape(b, 1, cfg.n_kv_heads, cfg.head_dim)
        q = llama._rope(q, q_positions, cfg.rope_theta)
        k = llama._rope(k, q_positions, cfg.rope_theta)

        k_tok, v_tok = k[:, 0], v[:, 0]
        if quantized:
            k_tok, k_sc = kvcache.quantize_kv(k_tok)
            v_tok, v_sc = kvcache.quantize_kv(v_tok)
            for key, val in (("k_scale", k_sc), ("v_scale", v_sc)):
                new_pool[key].append(kvcache.write_token(
                    pool[key][i], table_safe, pos_safe, val, page_size
                ))
        pk = kvcache.write_token(
            pool["k"][i], table_safe, pos_safe, k_tok, page_size
        )
        pv = kvcache.write_token(
            pool["v"][i], table_safe, pos_safe, v_tok, page_size
        )
        new_pool["k"].append(pk)
        new_pool["v"].append(pv)

        k_all = kvcache.gather_layer(pk, table_safe)
        v_all = kvcache.gather_layer(pv, table_safe)
        if quantized:
            k_all = kvcache.dequantize_kv(
                k_all, kvcache.gather_layer(new_pool["k_scale"][i], table_safe),
                cfg.dtype,
            )
            v_all = kvcache.dequantize_kv(
                v_all, kvcache.gather_layer(new_pool["v_scale"][i], table_safe),
                cfg.dtype,
            )
        attn = llama._attention(q, k_all, v_all, q_positions, kv_len_mask, cfg)

        h = h + lin(attn.reshape(b, 1, -1), lp["wo"])
        x = llama.rms_norm(h, lp["ffn_norm"], cfg.norm_eps)
        gate = lin(x, lp["w_gate"])
        up = lin(x, lp["w_up"])
        h = h + lin(
            jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up,
            lp["w_down"],
        )

    h = llama.rms_norm(h, params["norm_f"], cfg.norm_eps)
    if cfg.tie_embeddings:
        logits = lin(h, params["tok_emb"].T)
    else:
        logits = lin(h, params["lm_head"])
    pool = {key: jnp.stack(vals) for key, vals in new_pool.items()}
    return logits[:, 0].astype(jnp.float32), pool


@partial(
    jax.jit,
    static_argnames=("cfg", "page_size", "use_kernel", "top_k", "max_top_k"),
    donate_argnums=(1,),
)
def decode_step_sampled(
    params,
    pool: dict,
    page_table: jax.Array,
    positions: jax.Array,
    tokens: jax.Array,
    key: jax.Array,
    temps: jax.Array,
    top_ks: jax.Array,
    cfg,
    page_size: int,
    use_kernel=None,
    top_k: int = 0,
    max_top_k: int = 0,
):
    """decode_step + sampling fused into ONE device program.

    The scheduler state threads through on DEVICE: the returned
    next_tokens / next_positions / next_key feed the next step directly,
    so a steady-state step (no admission, retirement, or page growth)
    costs the engine ZERO host->device uploads — one dispatch, and a
    deferred readback of the previous step's tokens. The RNG key is
    split in-program; the host never sees it.

    Returns (next_tokens (n_slots,) i32, next_positions (n_slots,) i32
    — advanced by one for active slots — next_key, updated pool).
    """
    from quanta_tpu.serve.sampling import _sample_batch

    logits, pool = decode_step(
        params, pool, page_table, positions, tokens, cfg, page_size,
        use_kernel=use_kernel,
    )
    key, sub = jax.random.split(key)
    if max_top_k > 0:
        nxt = _sample_batch(logits, sub, temps, top_ks=top_ks,
                            max_top_k=max_top_k)
    else:
        nxt = _sample_batch(logits, sub, temps, top_k=top_k)
    next_positions = jnp.where(positions >= 0, positions + 1, positions)
    return nxt, next_positions, key, pool


@partial(
    jax.jit,
    static_argnames=("cfg", "page_size", "n_steps", "use_kernel", "top_k",
                     "max_top_k"),
    donate_argnums=(1,),
)
def decode_multi_step(
    params,
    pool: dict,
    page_table: jax.Array,
    positions: jax.Array,
    tokens: jax.Array,
    key: jax.Array,
    temps: jax.Array,
    top_ks: jax.Array,
    cfg,
    page_size: int,
    n_steps: int,
    use_kernel=None,
    top_k: int = 0,
    max_top_k: int = 0,
):
    """``n_steps`` fused decode+sample steps in ONE device program.

    Amortizes per-dispatch host latency n_steps-fold: the engine pays one
    dispatch + one token readback per WINDOW instead of per token (the
    multi-step scheduling of TPU serving stacks; on a high-latency
    control link this is the difference between RTT-bound and
    compute-bound serving). The caller pre-allocates pages covering
    positions ``seq_len .. seq_len+n_steps-1`` and guarantees every
    dispatched slot has >= n_steps of output budget; EOS inside the
    window wastes the tail steps for that slot (the tokens are dropped on
    the host — the optimistic-dispatch safety argument in engine.py
    covers the stale KV writes).

    Returns (tokens_seq (n_steps, n_slots) i32, next_positions, next_key,
    updated pool).
    """
    from quanta_tpu.serve.sampling import _sample_batch

    def body(carry, _):
        pool, positions, tokens, key = carry
        logits, pool = decode_step(
            params, pool, page_table, positions, tokens, cfg, page_size,
            use_kernel=use_kernel,
        )
        key, sub = jax.random.split(key)
        if max_top_k > 0:
            nxt = _sample_batch(logits, sub, temps, top_ks=top_ks,
                                max_top_k=max_top_k)
        else:
            nxt = _sample_batch(logits, sub, temps, top_k=top_k)
        positions = jnp.where(positions >= 0, positions + 1, positions)
        return (pool, positions, nxt, key), nxt

    (pool, positions, _, key), toks = jax.lax.scan(
        body, (pool, positions, tokens, key), None, length=n_steps
    )
    return toks, positions, key, pool
